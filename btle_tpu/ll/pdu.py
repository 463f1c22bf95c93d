"""Link-layer PDU codecs: ADV and data-channel (LL) PDU parsing/building.

Typed Python equivalents of the reference's parser structs and routines:
  * ADV header/payloads — parse_adv_pdu_header_byte (btle_rx.c:1947-1963),
    parse_adv_pdu_payload_byte (btle_rx.c:1564-1712)
  * LL header/payloads — parse_ll_pdu_header_byte (btle_rx.c:1939-1945),
    parse_ll_pdu_payload_byte (btle_rx.c:1741-1937)

Multi-byte fields arrive LSByte-first on air; parsed values and addresses
are presented in display order exactly as the reference presents them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum

import numpy as np


class AdvPduType(IntEnum):
    ADV_IND = 0
    ADV_DIRECT_IND = 1
    ADV_NONCONN_IND = 2
    SCAN_REQ = 3
    SCAN_RSP = 4
    CONNECT_REQ = 5
    ADV_SCAN_IND = 6
    RESERVED0 = 7
    RESERVED1 = 8
    RESERVED2 = 9
    RESERVED3 = 10
    RESERVED4 = 11
    RESERVED5 = 12
    RESERVED6 = 13
    RESERVED7 = 14
    RESERVED8 = 15

    @property
    def display_name(self) -> str:
        return self.name


class LlPduType(IntEnum):
    LL_RESERVED = 0
    LL_DATA1 = 1
    LL_DATA2 = 2
    LL_CTRL = 3

    @property
    def display_name(self) -> str:
        return self.name


class LlCtrlOpcode(IntEnum):
    LL_CONNECTION_UPDATE_REQ = 0x00
    LL_CHANNEL_MAP_REQ = 0x01
    LL_TERMINATE_IND = 0x02
    LL_ENC_REQ = 0x03
    LL_ENC_RSP = 0x04
    LL_START_ENC_REQ = 0x05
    LL_START_ENC_RSP = 0x06
    LL_UNKNOWN_RSP = 0x07
    LL_FEATURE_REQ = 0x08
    LL_FEATURE_RSP = 0x09
    LL_PAUSE_ENC_REQ = 0x0A
    LL_PAUSE_ENC_RSP = 0x0B
    LL_VERSION_IND = 0x0C
    LL_REJECT_IND = 0x0D


@dataclass
class AdvHeader:
    pdu_type: AdvPduType
    tx_add: int
    rx_add: int
    payload_len: int


def parse_adv_header(header_bytes) -> AdvHeader:
    b = _as_bytes(header_bytes)
    return AdvHeader(
        AdvPduType(int(b[0]) & 0x0F),
        int((int(b[0]) & 0x40) != 0),
        int((int(b[0]) & 0x80) != 0),
        int(b[1]) & 0x3F,
    )


@dataclass
class LlHeader:
    llid: LlPduType
    nesn: int
    sn: int
    md: int
    payload_len: int


def parse_ll_header(header_bytes) -> LlHeader:
    b = _as_bytes(header_bytes)
    h = int(b[0])
    return LlHeader(LlPduType(h & 0x03), (h >> 2) & 1, (h >> 3) & 1, (h >> 4) & 1, int(b[1]) & 0x1F)


def _as_bytes(x) -> bytes:
    if isinstance(x, (bytes, bytearray, memoryview)):
        return bytes(x)
    return bytes(bytearray(np.asarray(x, dtype=np.uint8)))


def _rev(b) -> bytes:
    return bytes(bytearray(b))[::-1]


@dataclass
class AdvPayload:
    """Parsed ADV payload; populated fields depend on pdu_type."""

    adv_a: bytes | None = None       # display order (MSB first)
    init_a: bytes | None = None
    scan_a: bytes | None = None
    data: bytes = b""                # AdvData / ScanRspData / raw
    # CONNECT_REQ extras
    aa: int | None = None
    crc_init: int | None = None
    win_size: int | None = None
    win_offset: int | None = None
    interval: int | None = None
    latency: int | None = None
    timeout: int | None = None
    chm: bytes | None = None         # 5 bytes display order (0x1F first)
    hop: int | None = None
    sca: int | None = None


def parse_adv_payload(payload, pdu_type: AdvPduType) -> AdvPayload:
    """Port of parse_adv_pdu_payload_byte (btle_rx.c:1564-1712).

    Raises ValueError on the same length conditions the reference rejects.
    """
    p = _as_bytes(payload)
    n = len(p)
    if n < 6:
        raise ValueError(f"ADV payload too short ({n} bytes)")
    t = AdvPduType(pdu_type)
    out = AdvPayload()
    if t in (AdvPduType.ADV_IND, AdvPduType.ADV_NONCONN_IND, AdvPduType.SCAN_RSP, AdvPduType.ADV_SCAN_IND):
        out.adv_a = _rev(p[0:6])
        out.data = p[6:]
    elif t in (AdvPduType.ADV_DIRECT_IND, AdvPduType.SCAN_REQ):
        if n != 12:
            raise ValueError(f"payload length {n} != 12 for {t.display_name}")
        if t == AdvPduType.ADV_DIRECT_IND:
            out.adv_a = _rev(p[0:6])
            out.init_a = _rev(p[6:12])
        else:
            out.scan_a = _rev(p[0:6])
            out.adv_a = _rev(p[6:12])
    elif t == AdvPduType.CONNECT_REQ:
        if n != 34:
            raise ValueError(f"payload length {n} != 34 for CONNECT_REQ")
        out.init_a = _rev(p[0:6])
        out.adv_a = _rev(p[6:12])
        out.aa = int.from_bytes(p[12:16], "little")
        out.crc_init = (p[16] << 16) | (p[17] << 8) | p[18]
        out.win_size = p[19]
        out.win_offset = int.from_bytes(p[20:22], "little")
        out.interval = int.from_bytes(p[22:24], "little")
        out.latency = int.from_bytes(p[24:26], "little")
        out.timeout = int.from_bytes(p[26:28], "little")
        out.chm = _rev(p[28:33])
        out.hop = p[33] & 0x1F
        out.sca = (p[33] >> 5) & 0x07
    else:
        out.data = p
    return out


def extract_adv_a(payload: AdvPayload, pdu_type: AdvPduType) -> bytes | None:
    """Advertiser address used for filtering (extract_adv_a, btle_rx.c:1714-1739).

    For ADV_DIRECT_IND/SCAN_REQ the reference filters on the FIRST address
    field (A0 = AdvA for ADV_DIRECT_IND, ScanA for SCAN_REQ)."""
    t = AdvPduType(pdu_type)
    if t == AdvPduType.SCAN_REQ:
        return payload.scan_a
    return payload.adv_a


@dataclass
class LlCtrlPayload:
    opcode: int
    fields: dict = field(default_factory=dict)


@dataclass
class LlPayload:
    data: bytes = b""
    ctrl: LlCtrlPayload | None = None


_CTRL_EXPECTED_LEN = {
    LlCtrlOpcode.LL_CONNECTION_UPDATE_REQ: 12,
    LlCtrlOpcode.LL_CHANNEL_MAP_REQ: 8,
    LlCtrlOpcode.LL_TERMINATE_IND: 2,
    LlCtrlOpcode.LL_ENC_REQ: 23,
    LlCtrlOpcode.LL_ENC_RSP: 13,
    LlCtrlOpcode.LL_START_ENC_REQ: 1,
    LlCtrlOpcode.LL_START_ENC_RSP: 1,
    LlCtrlOpcode.LL_UNKNOWN_RSP: 2,
    LlCtrlOpcode.LL_FEATURE_REQ: 9,
    LlCtrlOpcode.LL_FEATURE_RSP: 9,
    LlCtrlOpcode.LL_PAUSE_ENC_REQ: 1,
    LlCtrlOpcode.LL_PAUSE_ENC_RSP: 1,
    LlCtrlOpcode.LL_VERSION_IND: 6,
    LlCtrlOpcode.LL_REJECT_IND: 2,
}


def parse_ll_payload(payload, llid: LlPduType) -> LlPayload:
    """Port of parse_ll_pdu_payload_byte (btle_rx.c:1741-1937)."""
    p = _as_bytes(payload)
    n = len(p)
    t = LlPduType(llid)
    if n == 0:
        if t in (LlPduType.LL_DATA2, LlPduType.LL_CTRL):
            raise ValueError(f"{t.display_name} must not have empty payload")
        return LlPayload()
    if t != LlPduType.LL_CTRL:
        return LlPayload(data=p)

    op = p[0]
    f: dict = {}
    try:
        opcode = LlCtrlOpcode(op)
    except ValueError:
        return LlPayload(ctrl=LlCtrlPayload(op, {"raw": p[1:]}))
    exp = _CTRL_EXPECTED_LEN[opcode]
    if n != exp:
        raise ValueError(f"{opcode.name} payload length {n} != {exp}")
    if opcode == LlCtrlOpcode.LL_CONNECTION_UPDATE_REQ:
        f = {
            "win_size": p[1],
            "win_offset": int.from_bytes(p[2:4], "little"),
            "interval": int.from_bytes(p[4:6], "little"),
            "latency": int.from_bytes(p[6:8], "little"),
            "timeout": int.from_bytes(p[8:10], "little"),
            "instant": int.from_bytes(p[10:12], "little"),
        }
    elif opcode == LlCtrlOpcode.LL_CHANNEL_MAP_REQ:
        f = {"chm": _rev(p[1:6]), "instant": int.from_bytes(p[6:8], "little")}
    elif opcode in (LlCtrlOpcode.LL_TERMINATE_IND, LlCtrlOpcode.LL_UNKNOWN_RSP, LlCtrlOpcode.LL_REJECT_IND):
        f = {"error_code" if opcode != LlCtrlOpcode.LL_UNKNOWN_RSP else "unknown_type": p[1]}
    elif opcode == LlCtrlOpcode.LL_ENC_REQ:
        f = {"rand": _rev(p[1:9]), "ediv": _rev(p[9:11]), "skdm": _rev(p[11:19]), "ivm": _rev(p[19:23])}
    elif opcode == LlCtrlOpcode.LL_ENC_RSP:
        f = {"skds": _rev(p[1:9]), "ivs": _rev(p[9:13])}
    elif opcode in (LlCtrlOpcode.LL_FEATURE_REQ, LlCtrlOpcode.LL_FEATURE_RSP):
        f = {"feature_set": _rev(p[1:9])}
    elif opcode == LlCtrlOpcode.LL_VERSION_IND:
        f = {
            "vers_nr": p[1],
            "comp_id": int.from_bytes(p[2:4], "little"),
            "sub_vers_nr": int.from_bytes(p[4:6], "little"),
        }
    # START/PAUSE_ENC_* carry only the opcode
    return LlPayload(ctrl=LlCtrlPayload(int(opcode), f))
