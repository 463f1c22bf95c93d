"""Wideband TX composition: descriptor plan -> ONE 80 Msps multi-channel
capture -> wideband sniffer round trip.

This closes the loop the reference can never close in software alone: its
transmitter keys one radio to one channel per burst (btle_tx.c:559-707),
while `plan_to_wideband` puts every packet of a plan on its own channel
carrier in a single capture the 40-channel sniffer decodes in one pass.
"""

import subprocess
import sys

import numpy as np
import pytest

from btle_tpu.spec import bits as B
from btle_tpu.tx import parse_descriptor_sequence, plan_to_wideband
from btle_tpu.wideband import WidebandConfig, WidebandSniffer
from btle_tpu.wideband.channelizer import compose_wideband

PLAN = [
    "37-ADV_IND-TxAdd-0-RxAdd-0-AdvA-010203040506-AdvData-00112233445566-Space-1",
    "38-ADV_NONCONN_IND-TxAdd-0-RxAdd-0-AdvA-0A0B0C0D0E0F-AdvData-CAFEBABE-Space-1",
    # data channel with the default wideband keys (ADV AA / 0x555555).
    # NOTE: descriptor AA fields carry the NUMERIC access address
    # (0x8E89BED6) — the reference parses AA with stream_flip=1
    # (btle_tx.c:1253-1260), so octets are reversed onto the air as
    # D6 BE 89 8E, exactly what the sniffer's default correlator keys on.
    "9-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0-DATA-AABBCCDDEE-CRCInit-555555-Space-1",
]


def _expected(specs):
    return {(s.channel, bytes(B.bits_to_bytes(s.info_bits[40:]))) for s in specs}


class TestPlanToWideband:
    def test_roundtrip_multichannel(self):
        specs, _ = parse_descriptor_sequence(PLAN)
        wi, wq = plan_to_wideband(specs, noise_std=0.05)
        pkts = WidebandSniffer(WidebandConfig()).run(wi, wq)
        got = {(p.channel, bytes(p.pdu_bytes)) for p in pkts if p.crc_ok}
        assert _expected(specs) <= got
        # the serial air schedule: later packets sit later in the capture
        order = [p.sample_pos for p in sorted(
            (p for p in pkts if p.crc_ok), key=lambda p: p.sample_pos)]
        assert order == sorted(order) and len(set(order)) == len(order)

    def test_repeat_doubles_packets(self):
        specs, _ = parse_descriptor_sequence([PLAN[0]])
        wi, wq = plan_to_wideband(specs, num_repeat=2)
        pkts = [p for p in WidebandSniffer(WidebandConfig()).run(wi, wq)
                if p.crc_ok and p.channel == 37]
        assert len(pkts) == 2

    def test_infinite_repeat_rejected(self):
        specs, _ = parse_descriptor_sequence([PLAN[0]])
        with pytest.raises(ValueError):
            plan_to_wideband(specs, num_repeat=-1)

    def test_compose_handles_overlap_and_clipping(self):
        # bursts that straddle the stream edges are clipped, not dropped
        sig = (np.ones(100, np.float32), np.zeros(100, np.float32))
        wi, wq = compose_wideband(
            [(17, -50, *sig), (17, 950, *sig), (21, 400, *sig)], 1000)
        assert wi.shape == (1000,)
        assert np.any(wi[:50]) and np.any(wi[950:])


class TestCliWidebandOut:
    def test_tx_wideband_out_decodes(self, tmp_path):
        out = tmp_path / "air80.bin"
        r = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "tx", *PLAN,
             "--wideband-out", str(out)],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        assert "80 Msps" in r.stderr
        r2 = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "wideband", "--bin", str(out)],
            capture_output=True, text=True)
        assert r2.returncode == 0, r2.stderr
        lines = [ln for ln in r2.stdout.splitlines() if ln.startswith("ch")]
        chans = {int(ln[2:4]) for ln in lines if " crc0 " in ln}
        assert {37, 38, 9} <= chans
