"""Typed builders for transmitter packet descriptors.

Mirror of btle_cli.tx_builder: dataclass packet types serialize to the
descriptor-DSL lines consumed by btle_tpu.tx (and byte-compatible with the
reference btle_tx's packets.txt format); TxPlan groups packets with a
repeat count and loads from JSON plan files.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, ClassVar


def _hex_no_dash(s: str) -> str:
    return s.replace(":", "").replace("-", "").lower()


def _q(value: Any) -> str:
    """Descriptor fields cannot contain '-' (the separator)."""
    return str(value).replace("-", "_")


@dataclass
class Packet:
    channel: int = 37
    space_ms: int = 0
    packet_type: ClassVar[str] = "RAW"

    def fields(self) -> list[tuple[str, str]]:
        return []

    def to_line(self) -> str:
        parts = [str(self.channel), self.packet_type]
        for k, v in self.fields():
            if k:
                parts += [k, _q(v)]
            else:
                parts.append(_q(v))
        if self.space_ms:
            parts += ["Space", str(self.space_ms)]
        return "-".join(parts)


@dataclass
class AdvInd(Packet):
    adv_a: str = "010203040506"
    tx_add: int = 1
    rx_add: int = 0
    adv_data_hex: str = ""
    packet_type: ClassVar[str] = "ADV_IND"

    def fields(self):
        return [
            ("TxAdd", self.tx_add),
            ("RxAdd", self.rx_add),
            ("AdvA", _hex_no_dash(self.adv_a)),
            ("AdvData", _hex_no_dash(self.adv_data_hex)),
        ]


@dataclass
class IBeacon(Packet):
    adv_a: str = "010203040506"
    uuid: str = "B9407F30F5F8466EAFF925556B57FE6D"
    major: int = 0x0008
    minor: int = 0x0009
    tx_power: int = 0xC5
    packet_type: ClassVar[str] = "IBEACON"

    def fields(self):
        return [
            ("AdvA", _hex_no_dash(self.adv_a)),
            ("UUID", _hex_no_dash(self.uuid)),
            ("Major", f"{self.major:04x}"),
            ("Minor", f"{self.minor:04x}"),
            ("TxPower", f"{self.tx_power:02x}"),
        ]


@dataclass
class Discovery(Packet):
    """Discoverable broadcaster with optional AD structures."""

    adv_a: str = "010203040506"
    tx_add: int = 1
    rx_add: int = 0
    flags: int | None = 0x06
    local_name: str | None = None
    tx_power: int | None = None
    services_16: list[str] = field(default_factory=list)
    service_data_16: tuple[str, str] | None = None
    manuf_data_hex: str | None = None
    conn_interval: int | None = None
    packet_type: ClassVar[str] = "DISCOVERY"

    def fields(self):
        out = [
            ("TxAdd", self.tx_add),
            ("RxAdd", self.rx_add),
            ("AdvA", _hex_no_dash(self.adv_a)),
        ]
        if self.flags is not None:
            out.append(("FLAGS", f"{self.flags:02x}"))
        if self.local_name:
            out.append(("LOCAL_NAME09", self.local_name))
        if self.tx_power is not None:
            out.append(("TXPOWER", f"{self.tx_power:02x}"))
        if self.services_16:
            out.append(("SERVICE03", "".join(self.services_16)))
        if self.service_data_16:
            uuid, data = self.service_data_16
            out.append(("SERVICE_DATA", _hex_no_dash(uuid) + _hex_no_dash(data)))
        if self.manuf_data_hex:
            out.append(("MANUF_DATA", _hex_no_dash(self.manuf_data_hex)))
        if self.conn_interval is not None:
            out.append(("CONN_INTERVAL", f"{self.conn_interval:04x}"))
        return out


@dataclass
class Raw(Packet):
    hex_payload: str = ""
    packet_type: ClassVar[str] = "RAW"

    def fields(self):
        return [("", _hex_no_dash(self.hex_payload))]


PACKET_TYPES = {
    "ADV_IND": AdvInd,
    "iBeacon": IBeacon,
    "IBEACON": IBeacon,
    "DISCOVERY": Discovery,
    "Discovery": Discovery,
    "RAW": Raw,
}


@dataclass
class TxPlan:
    packets: list[Packet] = field(default_factory=list)
    repeat: int = 1

    def to_packets_txt(self) -> str:
        lines = [p.to_line() for p in self.packets]
        if self.repeat != 1:
            lines.append(f"r{self.repeat}")
        return "\n".join(lines) + "\n"

    def specs(self):
        """Parse back into synthesizable PacketSpecs."""
        from ..tx.descriptor import parse_descriptor

        return [parse_descriptor(p.to_line()) for p in self.packets]

    def synthesize(self, flavor: str = "c", sps: int | None = None):
        from ..tx.synth import synthesize

        return synthesize(self.specs(), flavor=flavor, sps=sps)


def load_plan(plan_path) -> TxPlan:
    """Load a JSON plan: {"packets": [{"type", "channel", "fields",
    "space_ms"}...], "repeat": N}."""
    obj = json.loads(Path(plan_path).read_text())
    packets = []
    for p in obj.get("packets", []):
        cls = PACKET_TYPES.get(p.get("type"))
        if cls is None:
            raise ValueError(f"unknown packet type {p.get('type')!r}")
        kwargs = dict(p.get("fields", {}))
        kwargs["channel"] = p.get("channel", 37)
        if "space_ms" in p:
            kwargs["space_ms"] = p["space_ms"]
        packets.append(cls(**kwargs))
    return TxPlan(packets, int(obj.get("repeat", 1)))
