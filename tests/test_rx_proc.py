"""RxProcess subprocess wrapper tests, including the reference's
fake-receiver pattern ($BTLE_RX pointing at a script that cats a fixture —
tests/test_rx_proc.py of btle_cli) and the TUI aggregation loop."""

import asyncio
import json
import os
import stat

import numpy as np
import pytest

from btle_tpu.cli import RxOptions, RxProcess, collect_events, receiver_command
from btle_tpu.cli.events import PktEvent
from btle_tpu.cli.tui import run_headless

FIXTURE_LINES = [
    {"v": 1, "t": "pkt", "ts": 1.0, "pkt": 1, "ch": 37, "aa": "8e89bed6",
     "crc_ok": True, "kind": "adv", "pdu_type": 0, "pdu_name": "ADV_IND",
     "tx_add": 0, "rx_add": 0, "plen": 9,
     "adv_a": "aa:bb:cc:dd:ee:ff",
     "payload_hex": "ffeeddccbbaa020106", "rssi_est": -55},
    {"v": 1, "t": "status", "ts": 1.1, "event": "stop", "board": "file",
     "ch": 37, "freq_hz": 2402000000, "gain": 0, "lna": 0, "amp": 0},
]


@pytest.fixture
def fake_rx(tmp_path, monkeypatch):
    fixture = tmp_path / "sample.ndjson"
    fixture.write_text("\n".join(json.dumps(x) for x in FIXTURE_LINES) + "\n")
    script = tmp_path / "fake_btle_rx"
    script.write_text(f"#!/bin/sh\ncat {fixture}\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("BTLE_RX", str(script))
    return script


class TestRxProcess:
    def test_command_override(self, fake_rx):
        cmd = receiver_command(RxOptions(bin_path="x.bin"))
        assert cmd[0] == str(fake_rx)
        assert "--json" in cmd

    def test_stream_fake_receiver(self, fake_rx):
        events = asyncio.run(collect_events(RxOptions(bin_path="ignored")))
        assert len(events) == 2
        assert isinstance(events[0], PktEvent)
        assert events[0].adv_a == "aa:bb:cc:dd:ee:ff"
        assert events[1].t == "status"

    def test_stream_real_cli(self, monkeypatch):
        monkeypatch.delenv("BTLE_RX", raising=False)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv("PYTHONPATH", "/root/repo")
        from test_golden import USRP_BIN

        events = asyncio.run(collect_events(
            RxOptions(bin_path=USRP_BIN, fmt="f32", channel=37, sps=4)))
        pkts = [e for e in events if isinstance(e, PktEvent)]
        assert any(e.crc_ok for e in pkts)
        assert pkts[0].adv_a == "01:02:03:04:05:06"


class TestTui:
    def test_headless_aggregation(self, fake_rx):
        events = asyncio.run(collect_events(RxOptions(bin_path="ignored")))
        agg = run_headless(events)
        assert len(agg.devices) == 1
        assert agg.devices["aa:bb:cc:dd:ee:ff"].last_rssi == -55


class TestTxProcess:
    def test_tx_subprocess(self, tmp_path, monkeypatch):
        monkeypatch.delenv("BTLE_RX", raising=False)
        monkeypatch.delenv("BTLE_TX", raising=False)
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        monkeypatch.setenv("PYTHONPATH", "/root/repo")
        from btle_tpu.cli import TxOptions, run_tx

        out = tmp_path / "o.bin"
        rc = asyncio.run(run_tx(TxOptions(
            descriptors=["37-ADV_IND-TxAdd-1-RxAdd-0-AdvA-0A0B0C0D0E0F-AdvData-02010610"],
            out=str(out))))
        assert rc == 0
        assert out.stat().st_size > 0


class TestStatusEvents:
    def test_start_stop_emitted(self):
        import io

        import numpy as np

        from btle_tpu.cli.events import parse_line
        from btle_tpu.stream import NdjsonEmitter, Sniffer, SnifferConfig, array_source

        buf = io.StringIO()
        sn = Sniffer(SnifferConfig(channel=37, sps=4), ndjson=NdjsonEmitter(buf),
                     quiet_text=True)
        sn.run(array_source(np.zeros(100, np.int16), np.zeros(100, np.int16)))
        evs = [parse_line(l) for l in buf.getvalue().splitlines()]
        kinds = [e.event for e in evs if e is not None and e.t == "status"]
        assert kinds == ["start", "stop"]
