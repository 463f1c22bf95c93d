"""Streaming scan aggregation: per-AdvA device records + hop state.

Same role/surface as the reference btle_cli.aggregate (aggregate.py of
host/python/btle_cli): consume schema-v1 events, maintain DeviceRecord per
advertiser with AD-structure extraction, CRC statistics, advert-interval
history, and a singleton HopState.
"""

from __future__ import annotations

import collections
import time
from dataclasses import dataclass, field
from typing import Iterable, Optional

from .events import Event, HopEvent, PktEvent, StatusEvent
from .vendors import manufacturer_name, oui_lookup

# AD types we surface (Bluetooth Assigned Numbers)
AD_FLAGS = 0x01
AD_INCOMPLETE_16 = 0x02
AD_COMPLETE_16 = 0x03
AD_INCOMPLETE_128 = 0x06
AD_COMPLETE_128 = 0x07
AD_SHORTENED_NAME = 0x08
AD_COMPLETE_NAME = 0x09
AD_TX_POWER = 0x0A
AD_SERVICE_DATA_16 = 0x16
AD_MANUFACTURER_DATA = 0xFF


@dataclass
class ParsedAd:
    flags: Optional[int] = None
    local_name: Optional[str] = None
    tx_power: Optional[int] = None
    service_uuids_16: list[str] = field(default_factory=list)
    service_uuids_128: list[str] = field(default_factory=list)
    manufacturer_id: Optional[int] = None
    manufacturer_data_hex: Optional[str] = None


def parse_ad_structures(payload_hex: str) -> ParsedAd:
    """Parse the AD-structure stream after the 6-byte AdvA of an ADV
    payload. Tolerates truncation and garbage; never raises."""
    out = ParsedAd()
    try:
        data = bytes.fromhex(payload_hex)
    except ValueError:
        return out
    if len(data) < 6:
        return out
    data = data[6:]
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 0 or i + 1 + length > n:
            break
        ad_type = data[i + 1]
        body = data[i + 2 : i + 1 + length]
        if ad_type == AD_FLAGS and body:
            out.flags = body[0]
        elif ad_type in (AD_SHORTENED_NAME, AD_COMPLETE_NAME):
            out.local_name = body.decode("utf-8", errors="replace")
        elif ad_type == AD_TX_POWER and body:
            v = body[0]
            out.tx_power = v - 256 if v >= 128 else v
        elif ad_type in (AD_COMPLETE_16, AD_INCOMPLETE_16):
            for j in range(0, len(body) - 1, 2):
                out.service_uuids_16.append(f"{body[j] | (body[j+1] << 8):04x}")
        elif ad_type in (AD_COMPLETE_128, AD_INCOMPLETE_128):
            for j in range(0, len(body) - 15, 16):
                raw = body[j : j + 16][::-1].hex()
                out.service_uuids_128.append(
                    f"{raw[0:8]}-{raw[8:12]}-{raw[12:16]}-{raw[16:20]}-{raw[20:32]}"
                )
        elif ad_type == AD_MANUFACTURER_DATA and len(body) >= 2:
            out.manufacturer_id = body[0] | (body[1] << 8)
            out.manufacturer_data_hex = body.hex()
        i += 1 + length
    return out


@dataclass
class DeviceRecord:
    adv_a: str
    pkt_count: int = 0
    crc_ok_count: int = 0
    first_seen: float = 0.0
    last_seen: float = 0.0
    last_rssi: Optional[int] = None
    last_channel: int = 0
    pdu_types_seen: set[int] = field(default_factory=set)
    last_payload_hex: str = ""
    parsed_ad: ParsedAd = field(default_factory=ParsedAd)
    advert_intervals_ms: collections.deque = field(
        default_factory=lambda: collections.deque(maxlen=64))
    history: collections.deque = field(
        default_factory=lambda: collections.deque(maxlen=20))

    @property
    def name(self) -> str:
        return self.parsed_ad.local_name or ""

    @property
    def vendor(self) -> str:
        if self.parsed_ad.manufacturer_id is not None:
            v = manufacturer_name(self.parsed_ad.manufacturer_id)
            if v:
                return v
        return oui_lookup(self.adv_a) or ""

    def crc_ok_ratio(self) -> float:
        return self.crc_ok_count / self.pkt_count if self.pkt_count else 0.0


@dataclass
class HopState:
    following_aa: Optional[str] = None
    current_ch: int = 0
    fsm_state: int = 0
    interval_us: int = 0
    hop_increment: int = 0
    crc_init: str = ""
    chm: str = ""
    last_change_ts: float = 0.0
    history: collections.deque = field(
        default_factory=lambda: collections.deque(maxlen=100))


class ScanAggregator:
    """Single-consumer streaming aggregator over schema-v1 events."""

    def __init__(self) -> None:
        self.devices: dict[str, DeviceRecord] = {}
        self.hop = HopState()
        self.total_pkts = 0
        self.crc_ok_pkts = 0
        self.last_status: Optional[StatusEvent] = None
        self.started_at = time.time()

    def update(self, evt: Event) -> None:
        if isinstance(evt, PktEvent):
            self._on_pkt(evt)
        elif isinstance(evt, HopEvent):
            self._on_hop(evt)
        elif isinstance(evt, StatusEvent):
            self.last_status = evt

    def feed(self, events: Iterable[Event]) -> None:
        for e in events:
            self.update(e)

    def snapshot(self, sort: str = "last_seen") -> list[DeviceRecord]:
        records = list(self.devices.values())
        key = {
            "last_seen": (lambda r: r.last_seen, True),
            "pkts": (lambda r: r.pkt_count, True),
            "name": (lambda r: r.name or "~", False),
            "rssi": (lambda r: r.last_rssi if r.last_rssi is not None else -200, True),
        }.get(sort)
        if key:
            records.sort(key=key[0], reverse=key[1])
        return records

    # ----------------------------------------------------------------
    def _on_pkt(self, evt: PktEvent) -> None:
        self.total_pkts += 1
        if evt.crc_ok:
            self.crc_ok_pkts += 1
        if evt.kind != "adv" or not evt.adv_a:
            return
        rec = self.devices.get(evt.adv_a)
        if rec is None:
            rec = DeviceRecord(adv_a=evt.adv_a, first_seen=evt.ts)
            self.devices[evt.adv_a] = rec
        if rec.last_seen:
            delta_ms = (evt.ts - rec.last_seen) * 1000.0
            if 0 < delta_ms < 60_000:
                rec.advert_intervals_ms.append(delta_ms)
        rec.pkt_count += 1
        if evt.crc_ok:
            rec.crc_ok_count += 1
        rec.last_seen = evt.ts
        rec.last_channel = evt.ch
        if evt.rssi_est is not None:
            rec.last_rssi = evt.rssi_est
        if evt.pdu_type is not None:
            rec.pdu_types_seen.add(evt.pdu_type)
        rec.last_payload_hex = evt.payload_hex
        rec.history.append(evt)

        if evt.pdu_type in (0, 2, 4, 6):
            parsed = parse_ad_structures(evt.payload_hex)
            pa = rec.parsed_ad
            if parsed.local_name:
                pa.local_name = parsed.local_name
            if parsed.tx_power is not None:
                pa.tx_power = parsed.tx_power
            if parsed.flags is not None:
                pa.flags = parsed.flags
            if parsed.service_uuids_16:
                pa.service_uuids_16 = sorted(
                    set(pa.service_uuids_16) | set(parsed.service_uuids_16))
            if parsed.service_uuids_128:
                pa.service_uuids_128 = sorted(
                    set(pa.service_uuids_128) | set(parsed.service_uuids_128))
            if parsed.manufacturer_id is not None:
                pa.manufacturer_id = parsed.manufacturer_id
                pa.manufacturer_data_hex = parsed.manufacturer_data_hex

    def _on_hop(self, evt: HopEvent) -> None:
        h = self.hop
        h.history.append(evt)
        h.last_change_ts = evt.ts
        h.current_ch = evt.ch
        h.fsm_state = evt.state_to
        if evt.event == "track_start":
            h.following_aa = evt.aa
            h.interval_us = evt.interval_us
            h.hop_increment = evt.hop
            h.crc_init = evt.crc_init
            if evt.chm:
                h.chm = evt.chm
        elif evt.event == "track_drop":
            h.following_aa = None
