"""Application-layer tests: events, aggregation, recon, tx builder, pcap
loader, and the CLI subcommands end-to-end on synthetic captures."""

import json
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.cli import (
    AdvInd,
    Discovery,
    IBeacon,
    ScanAggregator,
    TxPlan,
    load,
    packet_event_to_model,
    parse_ad_structures,
    parse_line,
    quickscan,
    profile,
    diff,
    payload_entropy,
)
from btle_tpu.cli.events import PktEvent
from btle_tpu.spec import bits as B

from test_golden import USRP_BIN


def make_adv_event(ts, adv_a="aa:bb:cc:dd:ee:ff", payload_hex=None, pdu_type=0,
                   rssi=-60, ch=37):
    if payload_hex is None:
        # AdvA + FLAGS + name "Tag" + mfg data (Apple)
        payload_hex = ("ffeeddccbbaa" + "020106" + "0409546167"
                       + "07ff4c0002155510")
    return PktEvent(
        v=1, t="pkt", ts=ts, pkt=1, ch=ch, aa="8e89bed6", crc_ok=True,
        kind="adv", pdu_type=pdu_type, pdu_name="ADV_IND", tx_add=0, rx_add=0,
        plen=len(payload_hex) // 2, adv_a=adv_a, payload_hex=payload_hex,
        rssi_est=rssi,
    )


class TestEvents:
    def test_parse_line_roundtrip(self):
        import io

        from btle_tpu.stream import NdjsonEmitter

        buf = io.StringIO()
        NdjsonEmitter(buf).pkt_adv(1.5, 3, 37, 0x8E89BED6, True, 0, "ADV_IND",
                                   1, 0, 10, bytes(6), b"\x01\x02", -50)
        ev = parse_line(buf.getvalue())
        assert isinstance(ev, PktEvent)
        assert ev.kind == "adv" and ev.crc_ok and ev.rssi_est == -50

    def test_parse_line_garbage(self):
        assert parse_line("") is None
        assert parse_line("not json") is None
        assert parse_line('{"v":1,"t":"nope","ts":0}') is None


class TestAggregate:
    def test_ad_parse(self):
        p = parse_ad_structures("ffeeddccbbaa" + "020106" + "0409546167"
                                + "0302180d" + "07ff4c0002155510")
        assert p.flags == 6
        assert p.local_name == "Tag"
        assert p.service_uuids_16 == ["0d18"]
        assert p.manufacturer_id == 0x004C

    def test_device_records(self):
        agg = ScanAggregator()
        for k in range(5):
            agg.update(make_adv_event(10.0 + 0.1 * k))
        agg.update(make_adv_event(10.6, adv_a="11:22:33:44:55:66"))
        assert len(agg.devices) == 2
        rec = agg.devices["aa:bb:cc:dd:ee:ff"]
        assert rec.pkt_count == 5
        assert rec.name == "Tag"
        assert rec.vendor == "Apple"
        assert len(rec.advert_intervals_ms) == 4
        assert abs(np.mean(rec.advert_intervals_ms) - 100) < 1


class TestRecon:
    def _agg(self):
        agg = ScanAggregator()
        for k in range(6):
            agg.update(make_adv_event(5.0 + 0.2 * k))
        return agg

    def test_quickscan(self):
        s = quickscan(self._agg())
        assert s.n_devices == 1
        assert s.devices_top[0].vendor_hint == "Apple"
        assert s.fingerprints_seen.get("ibeacon") == 1

    def test_profile(self):
        p = profile(self._agg(), "AA:BB:CC:DD:EE:FF")
        assert p.name == "Tag"
        assert p.protocol_fingerprint == "ibeacon"
        assert p.is_connectable
        assert p.avg_interval_ms == pytest.approx(200, rel=0.05)

    def test_diff(self):
        a = self._agg()
        b = ScanAggregator()
        b.update(make_adv_event(1.0, adv_a="11:22:33:44:55:66", rssi=-40))
        d = diff(a, b)
        assert d.only_in_a == ["aa:bb:cc:dd:ee:ff"]
        assert d.only_in_b == ["11:22:33:44:55:66"]

    def test_payload_entropy_counter(self):
        agg = ScanAggregator()
        for k in range(8):
            mfg = f"4c000215{k:02x}55"
            payload = "ffeeddccbbaa" + f"07ff{mfg}"
            agg.update(make_adv_event(1.0 + k, payload_hex=payload))
        r = payload_entropy(agg, "aa:bb:cc:dd:ee:ff")
        assert r.n_samples == 8
        assert r.likely_counter_positions == [4]
        assert r.static_prefix_bytes == 4


class TestTxBuilder:
    def test_lines_parse_back(self):
        plan = TxPlan([
            AdvInd(channel=37, adv_a="01:02:03:04:05:06", adv_data_hex="020106"),
            IBeacon(channel=38, space_ms=100),
            Discovery(channel=39, local_name="Hi", services_16=["180D"]),
        ], repeat=5)
        txt = plan.to_packets_txt()
        assert txt.endswith("r5\n")
        specs = plan.specs()
        assert [s.channel for s in specs] == [37, 38, 39]
        syn = plan.synthesize()
        assert len(syn) == 3

    def test_json_plan(self, tmp_path):
        p = tmp_path / "plan.json"
        p.write_text(json.dumps({
            "packets": [
                {"type": "iBeacon", "channel": 37,
                 "fields": {"major": 17, "minor": 3}, "space_ms": 50},
            ],
            "repeat": 3,
        }))
        from btle_tpu.cli import load_plan

        plan = load_plan(p)
        assert plan.repeat == 3
        assert plan.packets[0].major == 17
        assert plan.packets[0].space_ms == 50


class TestCliCommands:
    def _run(self, *args):
        return subprocess.run(
            [sys.executable, "-m", "btle_tpu.cli", *args],
            capture_output=True, text=True, timeout=300,
            env={"PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin",
                 "JAX_PLATFORMS": "cpu", "HOME": "/root"},
            cwd="/root/repo",
        )

    def test_decode_capture(self):
        r = self._run("decode", "--bin", USRP_BIN, "--format", "f32",
                      "--channel", "37", "--json")
        assert r.returncode == 0, r.stderr
        events = [parse_line(l) for l in r.stdout.splitlines()]
        pkts = [e for e in events if e is not None and e.t == "pkt"]
        status = [e for e in events if e is not None and e.t == "status"]
        assert [s.event for s in status] == ["start", "stop"]
        assert any(e.crc_ok for e in pkts)
        assert pkts[0].adv_a == "01:02:03:04:05:06"

    def test_tx_then_decode(self, tmp_path):
        out = tmp_path / "tx.bin"
        desc = "37-DISCOVERY-TxAdd-1-RxAdd-0-AdvA-0A0B0C0D0E0F-LOCAL_NAME09-TPU"
        r = self._run("tx", desc, "--out", str(out))
        assert r.returncode == 0, r.stderr
        r2 = self._run("decode", "--bin", str(out), "--format", "f32", "--json")
        assert r2.returncode == 0, r2.stderr
        pkts = [parse_line(l) for l in r2.stdout.splitlines()]
        pkts = [e for e in pkts if e is not None and e.t == "pkt" and e.crc_ok]
        assert len(pkts) == 1
        assert pkts[0].adv_a == "0a:0b:0c:0d:0e:0f"

    def test_scan_and_pcap_and_recon(self, tmp_path):
        pcap = tmp_path / "cap.pcap"
        r = self._run("decode", "--bin", USRP_BIN, "--format", "f32",
                      "--rssi", "--quiet-text", "--pcap", str(pcap))
        assert r.returncode == 0, r.stderr
        cap = load(pcap)
        assert len(cap.packets) == 1
        assert cap.packets[0].adv_a == "01:02:03:04:05:06"
        r2 = self._run("recon", "quickscan", str(pcap))
        assert r2.returncode == 0, r2.stderr
        out = json.loads(r2.stdout)
        assert out["n_devices"] == 1
        r3 = self._run("analyze", str(pcap))
        assert r3.returncode == 0 and "devices: 1" in r3.stdout
