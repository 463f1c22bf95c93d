"""High-level recon/analysis over captures: fingerprints, device profiles,
scan summaries, capture diffs, and payload-entropy analysis.

Same surface and compact-report philosophy as btle_cli.recon (recon.py of
host/python/btle_cli): every public function returns a small flat pydantic
model suitable for LLM/MCP consumption. Capture input is a pcap file or a
list of schema-v1 events (e.g. from the in-process sniffer).
"""

from __future__ import annotations

import statistics
from pathlib import Path
from typing import Iterable, Optional

from pydantic import BaseModel, ConfigDict, Field

from .aggregate import DeviceRecord, ParsedAd, ScanAggregator, parse_ad_structures
from .events import Event, PktEvent
from .pcap_loader import CaptureFile, load as load_pcap

# ---------------- protocol fingerprints ----------------

_SERVICE_TAGS = {
    "00001523-1212-efde-1523-785feabcd123": "nordic_lbs",
    "6e400001-b5a3-f393-e0a9-e50e24dcca9e": "nordic_uart",
    "8d53dc1d-1db7-4cd3-868b-8a527460aa84": "mcumgr_smp",
    "0000feaa-0000-1000-8000-00805f9b34fb": "eddystone",
    "0000fd5a-0000-1000-8000-00805f9b34fb": "apple_findmy",
    "0000fe9f-0000-1000-8000-00805f9b34fb": "google_fast_pair",
    "0000fef3-0000-1000-8000-00805f9b34fb": "tile",
}


def fingerprint(parsed: ParsedAd) -> Optional[str]:
    """Short protocol tag for a device, or None."""
    if (parsed.manufacturer_id == 0x004C and parsed.manufacturer_data_hex
            and parsed.manufacturer_data_hex.startswith("4c000215")):
        return "ibeacon"
    mfg_tags = {
        0x004C: "apple_continuity",
        0x0006: "microsoft_swift_pair",
        0x0059: "nordic_proprietary",
        0x1337: "dev_or_hobby_0x1337",
    }
    if parsed.manufacturer_id in mfg_tags:
        return mfg_tags[parsed.manufacturer_id]
    for u128 in parsed.service_uuids_128:
        tag = _SERVICE_TAGS.get(u128.lower())
        if tag:
            return tag
    for u16 in parsed.service_uuids_16:
        tag = _SERVICE_TAGS.get(f"0000{u16.lower()}-0000-1000-8000-00805f9b34fb")
        if tag:
            return tag
    return None


# ---------------- report models ----------------


class TargetProfile(BaseModel):
    model_config = ConfigDict(extra="forbid")

    adv_a: str
    name: Optional[str] = None
    vendor_hint: Optional[str] = None
    mfg_id: Optional[int] = None
    protocol_fingerprint: Optional[str] = None
    primary_service_uuids: list[str] = Field(default_factory=list)
    pdu_types_seen: list[str] = Field(default_factory=list)
    is_connectable: bool = False
    is_scan_responsive: bool = False
    flags: Optional[int] = None
    tx_power_dbm: Optional[int] = None
    avg_interval_ms: Optional[float] = None
    rssi_dbm: Optional[int] = None
    n_packets: int = 0
    crc_ok_ratio: float = 0.0
    duration_s: float = 0.0
    mfg_data_sample: Optional[str] = None
    notes: list[str] = Field(default_factory=list)


class DeviceBrief(BaseModel):
    model_config = ConfigDict(extra="forbid")
    adv_a: str
    name: Optional[str] = None
    vendor_hint: Optional[str] = None
    fingerprint: Optional[str] = None
    rssi_dbm: Optional[int] = None
    n_pkts: int = 0


class ScanSummary(BaseModel):
    model_config = ConfigDict(extra="forbid")
    duration_s: float
    n_devices: int
    n_packets: int
    crc_ok_ratio: float
    channels_scanned: list[int]
    devices_top: list[DeviceBrief]
    fingerprints_seen: dict[str, int]


class DiffReport(BaseModel):
    model_config = ConfigDict(extra="forbid")
    only_in_a: list[str]
    only_in_b: list[str]
    common: int
    rssi_shifts: dict[str, int]
    payload_changed: dict[str, str]
    notes: list[str] = Field(default_factory=list)


class PayloadEntropyReport(BaseModel):
    model_config = ConfigDict(extra="forbid")
    adv_a: str
    n_samples: int
    payload_length: int
    static_prefix_bytes: int
    static_suffix_bytes: int
    changing_positions: list[int]
    likely_counter_positions: list[int]
    likely_random_positions: list[int]
    sample_hex_first: Optional[str] = None
    sample_hex_last: Optional[str] = None


# ---------------- capture ingestion ----------------


def _short_hex(b, max_bytes: int = 16) -> str:
    h = b.hex() if isinstance(b, (bytes, bytearray)) else b
    return h if len(h) <= max_bytes * 2 else h[: max_bytes * 2] + "…"


def aggregator_from_pcap(cap: CaptureFile) -> ScanAggregator:
    agg = ScanAggregator()
    for p in cap.packets:
        t, tx_add, rx_add, plen, ok = p.pdu_header()
        if not ok or not p.is_adv:
            continue
        agg.update(PktEvent(
            v=1, t="pkt", ts=p.ts, pkt=0, ch=p.channel,
            aa=f"{p.access_addr:08x}", crc_ok=True, kind="adv",
            pdu_type=t, pdu_name=p.pdu_type_name, tx_add=tx_add,
            rx_add=rx_add, plen=plen, adv_a=p.adv_a,
            payload_hex=p.payload_hex,
            rssi_est=p.rssi_dbm if p.rssi_dbm > -127 else None,
        ))
    return agg


def aggregator_from_events(events: Iterable[Event]) -> ScanAggregator:
    agg = ScanAggregator()
    agg.feed(events)
    return agg


def _load(capture) -> ScanAggregator:
    if isinstance(capture, ScanAggregator):
        return capture
    if isinstance(capture, (str, Path)):
        return aggregator_from_pcap(load_pcap(capture))
    return aggregator_from_events(capture)


# ---------------- public operations ----------------


def _device_to_brief(rec: DeviceRecord) -> DeviceBrief:
    return DeviceBrief(
        adv_a=rec.adv_a, name=rec.name or None,
        vendor_hint=rec.vendor or None,
        fingerprint=fingerprint(rec.parsed_ad),
        rssi_dbm=rec.last_rssi, n_pkts=rec.pkt_count,
    )


def _device_to_profile(rec: DeviceRecord, duration_s: float) -> TargetProfile:
    from ..ll.pdu import AdvPduType

    pa = rec.parsed_ad
    notes = []
    avg_int = None
    if rec.advert_intervals_ms:
        avg_int = round(statistics.mean(rec.advert_intervals_ms), 1)
    if 0 in rec.pdu_types_seen and 5 in rec.pdu_types_seen:
        notes.append("CONNECT_REQ observed — device was connected to during capture")
    mfg_sample = _short_hex(pa.manufacturer_data_hex) if pa.manufacturer_data_hex else None
    return TargetProfile(
        adv_a=rec.adv_a, name=rec.name or None,
        vendor_hint=rec.vendor or None,
        mfg_id=pa.manufacturer_id,
        protocol_fingerprint=fingerprint(pa),
        primary_service_uuids=(pa.service_uuids_16 + pa.service_uuids_128)[:8],
        pdu_types_seen=sorted(AdvPduType(t).display_name for t in rec.pdu_types_seen),
        is_connectable=0 in rec.pdu_types_seen,        # ADV_IND
        is_scan_responsive=4 in rec.pdu_types_seen,    # SCAN_RSP
        flags=pa.flags, tx_power_dbm=pa.tx_power,
        avg_interval_ms=avg_int, rssi_dbm=rec.last_rssi,
        n_packets=rec.pkt_count, crc_ok_ratio=round(rec.crc_ok_ratio(), 3),
        duration_s=round(duration_s, 2), mfg_data_sample=mfg_sample,
        notes=notes,
    )


def quickscan(capture, top: int = 15) -> ScanSummary:
    """Compact scan summary of a capture (pcap path / events / aggregator)."""
    agg = _load(capture)
    recs = agg.snapshot(sort="pkts")
    fps: dict[str, int] = {}
    for r in recs:
        tag = fingerprint(r.parsed_ad)
        if tag:
            fps[tag] = fps.get(tag, 0) + 1
    ts = [r.last_seen for r in recs if r.last_seen] + [r.first_seen for r in recs if r.first_seen]
    duration = (max(ts) - min(ts)) if len(ts) >= 2 else 0.0
    return ScanSummary(
        duration_s=round(duration, 2),
        n_devices=len(recs),
        n_packets=agg.total_pkts,
        crc_ok_ratio=round(agg.crc_ok_pkts / agg.total_pkts, 3) if agg.total_pkts else 0.0,
        channels_scanned=sorted({r.last_channel for r in recs}),
        devices_top=[_device_to_brief(r) for r in recs[:top]],
        fingerprints_seen=fps,
    )


def profile(capture, adv_a: str) -> TargetProfile:
    """One-device deep profile from a capture."""
    agg = _load(capture)
    rec = agg.devices.get(adv_a.lower())
    if rec is None:
        return TargetProfile(adv_a=adv_a.lower(), notes=["device not seen in capture"])
    ts = [r.first_seen for r in agg.devices.values()] + [r.last_seen for r in agg.devices.values()]
    duration = (max(ts) - min(ts)) if len(ts) >= 2 else 0.0
    return _device_to_profile(rec, duration)


def diff(capture_a, capture_b) -> DiffReport:
    """What changed between two captures."""
    a = _load(capture_a)
    b = _load(capture_b)
    keys_a, keys_b = set(a.devices), set(b.devices)
    common = keys_a & keys_b
    rssi_shifts: dict[str, int] = {}
    payload_changed: dict[str, str] = {}
    for k in sorted(common):
        ra, rb = a.devices[k], b.devices[k]
        if ra.last_rssi is not None and rb.last_rssi is not None:
            d = rb.last_rssi - ra.last_rssi
            if abs(d) >= 5:
                rssi_shifts[k] = d
        pa, pb = ra.last_payload_hex, rb.last_payload_hex
        if pa and pb and pa != pb:
            ba, bb = bytes.fromhex(pa), bytes.fromhex(pb)
            if len(ba) != len(bb):
                payload_changed[k] = f"length {len(ba)}→{len(bb)} bytes"
            else:
                diffs = [i for i in range(len(ba)) if ba[i] != bb[i]]
                if diffs:
                    payload_changed[k] = _ranges(diffs)
    notes = []
    only_a = sorted(keys_a - keys_b)
    only_b = sorted(keys_b - keys_a)
    if only_a:
        notes.append(f"{len(only_a)} device(s) disappeared")
    if only_b:
        notes.append(f"{len(only_b)} new device(s) appeared")
    if rssi_shifts:
        notes.append(f"{len(rssi_shifts)} device(s) shifted RSSI >=5 dB")
    return DiffReport(
        only_in_a=only_a[:20], only_in_b=only_b[:20], common=len(common),
        rssi_shifts=dict(list(rssi_shifts.items())[:15]),
        payload_changed=dict(list(payload_changed.items())[:15]),
        notes=notes,
    )


def _ranges(positions: list[int]) -> str:
    if not positions:
        return ""
    out: list[str] = []
    start = prev = positions[0]
    for p in positions[1:] + [None]:
        if p is not None and p == prev + 1:
            prev = p
            continue
        out.append(f"{start}" if start == prev else f"{start}..{prev}")
        if p is not None:
            start = prev = p
    if len(out) > 5:
        return "byte " + ", ".join(out[:5]) + f", … (+{len(out)-5} more)"
    return "byte " + ", ".join(out)


def payload_entropy(capture, adv_a: str) -> PayloadEntropyReport:
    """Per-byte variability analysis of a device's manufacturer data."""
    agg = _load(capture)
    rec = agg.devices.get(adv_a.lower())
    blobs: list[bytes] = []
    if rec is not None:
        for evt in rec.history:
            parsed = parse_ad_structures(evt.payload_hex)
            if parsed.manufacturer_data_hex:
                blobs.append(bytes.fromhex(parsed.manufacturer_data_hex))
    if not blobs:
        return PayloadEntropyReport(
            adv_a=adv_a, n_samples=0, payload_length=0,
            static_prefix_bytes=0, static_suffix_bytes=0,
            changing_positions=[], likely_counter_positions=[],
            likely_random_positions=[],
        )
    L = min(len(b) for b in blobs)
    blobs = [b[:L] for b in blobs]
    cols = [[b[i] for b in blobs] for i in range(L)]
    static = [len(set(c)) == 1 for c in cols]
    static_prefix = next((i for i, s in enumerate(static) if not s), L)
    static_suffix = next((i for i, s in enumerate(reversed(static)) if not s), L)
    changing = [i for i, s in enumerate(static) if not s]
    counter_pos, random_pos = [], []
    for i in changing:
        col = cols[i]
        is_mono = all(col[j] >= col[j - 1] for j in range(1, len(col)))
        unique_ratio = len(set(col)) / len(col)
        if is_mono and unique_ratio > 0.5:
            counter_pos.append(i)
        elif unique_ratio > 0.7:
            random_pos.append(i)
    return PayloadEntropyReport(
        adv_a=adv_a, n_samples=len(blobs), payload_length=L,
        static_prefix_bytes=static_prefix, static_suffix_bytes=static_suffix,
        changing_positions=changing[:24],
        likely_counter_positions=counter_pos[:8],
        likely_random_positions=random_pos[:8],
        sample_hex_first=_short_hex(blobs[0]),
        sample_hex_last=_short_hex(blobs[-1]) if len(blobs) > 1 else None,
    )
