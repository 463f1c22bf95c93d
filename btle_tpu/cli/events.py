"""NDJSON schema-v1 event models (the app-layer ABI).

Pydantic mirror of the wire schema emitted by btle_tpu.stream.ndjson and
the reference btle_rx --json (btle_json.h:5-40, events.py of btle_cli).
``parse_line`` never raises — malformed input returns None.
"""

from __future__ import annotations

import json
from typing import Literal, Union

from pydantic import BaseModel, ConfigDict, ValidationError


class _Base(BaseModel):
    model_config = ConfigDict(extra="allow")

    v: int
    t: str
    ts: float


class PktEvent(_Base):
    t: Literal["pkt"]
    pkt: int
    ch: int
    aa: str
    crc_ok: bool
    kind: Literal["adv", "data"]
    plen: int
    payload_hex: str
    rssi_est: int | None = None

    # ADV branch
    pdu_type: int | None = None
    pdu_name: str | None = None
    tx_add: int | None = None
    rx_add: int | None = None
    adv_a: str | None = None

    # DATA branch
    ll_pdu_type: int | None = None
    ll_pdu_name: str | None = None
    nesn: int | None = None
    sn: int | None = None
    md: int | None = None


class HopEvent(_Base):
    t: Literal["hop"]
    event: str
    state_from: int
    state_to: int
    ch: int
    freq_mhz: int
    aa: str
    crc_init: str
    interval_us: int
    hop: int
    chm: str | None = None


class StatusEvent(_Base):
    t: Literal["status"]
    event: str
    board: str = ""
    ch: int = 0
    freq_hz: int = 0
    gain: int = 0
    lna: int = 0
    amp: int = 0
    filter_adva: str | None = None
    msg: str | None = None


Event = Union[PktEvent, HopEvent, StatusEvent]

_BY_TYPE = {"pkt": PktEvent, "hop": HopEvent, "status": StatusEvent}


def parse_line(line: str) -> Event | None:
    s = line.strip()
    if not s or s[0] != "{":
        return None
    try:
        obj = json.loads(s)
    except (json.JSONDecodeError, ValueError):
        return None
    model = _BY_TYPE.get(obj.get("t"))
    if model is None:
        return None
    try:
        return model.model_validate(obj)
    except ValidationError:
        return None


def packet_event_to_model(ev, ts: float | None = None) -> PktEvent:
    """Convert an in-process stream.sniffer.PacketEvent to the wire model
    (lets the aggregator consume in-process decodes without JSON)."""
    from ..ll.pdu import extract_adv_a

    base = dict(
        v=1, t="pkt", ts=ts if ts is not None else ev.ts_us / 1e6,
        pkt=ev.pkt_count, ch=ev.channel, aa=f"{ev.access_addr:08x}",
        crc_ok=ev.crc_ok, plen=ev.header.payload_len,
        payload_hex=bytes(ev.payload_bytes).hex(), rssi_est=ev.rssi_dbm,
    )
    if ev.is_adv:
        adv_a = None
        if ev.payload is not None:
            a = extract_adv_a(ev.payload, ev.header.pdu_type)
            if a is not None:
                adv_a = ":".join(f"{b:02x}" for b in a)
        return PktEvent(
            kind="adv", pdu_type=int(ev.header.pdu_type),
            pdu_name=ev.header.pdu_type.display_name,
            tx_add=ev.header.tx_add, rx_add=ev.header.rx_add,
            adv_a=adv_a, **base,
        )
    return PktEvent(
        kind="data", ll_pdu_type=int(ev.header.llid),
        ll_pdu_name=ev.header.llid.display_name,
        nesn=ev.header.nesn, sn=ev.header.sn, md=ev.header.md, **base,
    )
