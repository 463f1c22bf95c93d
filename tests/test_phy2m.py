"""LE 2M PHY support (beyond-reference: the C/Python/Verilog reference is
LE-1M only, btle_rx.c:219 / btlelib.py:13).

The LE 2M PHY (BLE 5, Core 5.3 Vol 6 Part B 2.1.1) doubles the symbol
rate and extends the preamble to 16 alternating symbols; AA framing,
whitening, CRC and GFSK shaping (BT=0.5, h=0.5) are identical.  Because
the whole DSP chain here is symbol-indexed (sps samples per symbol, any
absolute rate), 2M support is a framing + timekeeping feature: these
tests pin the 16-bit preamble construction, loop 2M packets through the
golden AND device receivers, and check the Sniffer's halved-microsecond
bookkeeping.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from btle_tpu.golden import model as G
from btle_tpu.rx import stream_decode
from btle_tpu.spec import bits as B
from btle_tpu.tx import parse_descriptor, synthesize
from btle_tpu.tx.synth import plan_to_stream

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ADV_NONCONN_IND, TxAdd=1: AdvA 06:05:04:03:02:01 + 3 payload bytes
PDU_HEX = "4209010203040506aabbcc"


def _pdu_bits():
    return B.hex_to_bits(PDU_HEX)


class TestFraming:
    def test_preamble_is_16_alternating_bits(self):
        phy1 = G.assemble_phy_bits(_pdu_bits(), channel=37)
        phy2 = G.assemble_phy_bits(_pdu_bits(), channel=37, phy="2m")
        assert len(phy2) == len(phy1) + 8
        # alternation extends: first 16 bits = the 1M preamble twice
        np.testing.assert_array_equal(phy2[:8], phy1[:8])
        np.testing.assert_array_equal(phy2[8:16], phy1[:8])
        # everything after the preamble is untouched by the PHY switch
        np.testing.assert_array_equal(phy2[16:], phy1[8:])

    def test_data_channel_preamble_follows_aa_lsb(self):
        # AA with LSB 1 -> "55" preamble on 1M, "5555" on 2M
        aa = "01850A1B"
        phy2 = G.assemble_phy_bits(_pdu_bits(), channel=9, phy="2m",
                                   crc_init_hex="A77B22",
                                   access_address_hex=aa)
        assert B.hex_to_bits(aa)[0] == 1
        np.testing.assert_array_equal(phy2[:16], B.hex_to_bits("5555"))

    def test_unknown_phy_rejected(self):
        with pytest.raises(ValueError):
            G.assemble_phy_bits(_pdu_bits(), phy="coded")

    def test_descriptor_to_2m(self):
        spec = parse_descriptor(
            "37-ADV_IND-TxAdd-1-RxAdd-0-AdvA-010203040506-AdvData-0011")
        s2 = spec.to_2m()
        assert (spec.phy, s2.phy) == ("1m", "2m")
        assert (spec.pdu_start, s2.pdu_start) == (40, 48)
        assert s2.num_info_bits == spec.num_info_bits + 8
        # the on-air stream differs ONLY by the extra preamble byte
        np.testing.assert_array_equal(s2.phy_bits()[8:], spec.phy_bits())
        # idempotent
        assert s2.to_2m().num_info_bits == s2.num_info_bits

    def test_to_2m_rejects_raw(self):
        # RAW bits are final on-air bits: no preamble to extend, and
        # flipping phy alone would shift pdu_start under consumers
        raw = parse_descriptor("37-RAW-aaaaaaaa")
        with pytest.raises(ValueError, match="raw_phy_bits"):
            raw.to_2m()

    def test_plan_to_stream_rejects_mixed_phy(self):
        from btle_tpu.tx.synth import synthesize

        spec = parse_descriptor(
            "37-ADV_IND-TxAdd-1-RxAdd-0-AdvA-010203040506-AdvData-0011")
        pkts = synthesize([spec], flavor="c", sps=4) \
            + synthesize([spec.to_2m()], flavor="c", sps=4)
        with pytest.raises(ValueError, match="mixes PHYs"):
            plan_to_stream(pkts, sps=4)
        # and a right-phy plan with the wrong declared symbol rate
        with pytest.raises(ValueError, match="sym_rate"):
            plan_to_stream(pkts[1:], sps=4, sym_rate_msym=1)


class TestLoopback:
    def test_golden_2m_loopback(self):
        """2M TX at 4 samples/symbol (8 Msps air) decodes byte-exactly
        through the golden receiver — the DSP is symbol-indexed."""
        pdu = _pdu_bits()
        i, q, _ = G.btle_tx(pdu, channel=37, sps=4, phy="2m")
        pad = np.zeros(40, np.int16)
        res = G.btle_rx(np.concatenate([pad, i, pad]),
                        np.concatenate([pad, q, pad]), 37, sps=4)
        assert res.crc_ok
        np.testing.assert_array_equal(res.pdu_bits, pdu)

    def test_device_pipeline_2m_loopback(self):
        """The jitted block decoder needs no 2M knob at all: AA search +
        de-whiten + CRC are position-relative to the AA hit."""
        pdu = _pdu_bits()
        i, q, _ = G.btle_tx(pdu, channel=37, sps=4, phy="2m")
        pad = np.zeros(256, np.int16)
        res = stream_decode(np.concatenate([pad, i, pad]),
                            np.concatenate([pad, q, pad]), 37, sps=4)
        pkts = [p for p in res.packets if p.crc_ok]
        assert len(pkts) == 1
        np.testing.assert_array_equal(
            B.bits_to_bytes(pdu), np.frombuffer(pkts[0].pdu_bytes, np.uint8))

    def test_sniffer_2m_timestamps_are_halved(self):
        """Same sample stream, phy='2m' -> microsecond clock runs at
        sps*2 samples/us (a 2M symbol is 0.5 us)."""
        from btle_tpu.stream import Sniffer, SnifferConfig
        from btle_tpu.stream.sources import array_source

        spec = parse_descriptor(
            "37-ADV_IND-TxAdd-1-RxAdd-0-AdvA-010203040506-AdvData-0011"
            "-Space-2").to_2m()
        pkt = synthesize([spec], flavor="c", sps=4)
        i, q = plan_to_stream(pkt, sps=4, num_repeat=2, sym_rate_msym=2)
        evs = {}
        for phy in ("1m", "2m"):
            sn = Sniffer(SnifferConfig(channel=37, sps=4, phy=phy),
                         quiet_text=True)
            evs[phy] = sn.run(array_source(i, q))
        assert len(evs["2m"]) == 2
        t1 = [e.ts_us for e in evs["1m"]]
        t2 = [e.ts_us for e in evs["2m"]]
        assert all(abs(a - 2 * b) <= 2 for a, b in zip(t1, t2))
        # 2 ms Space at 8 Msps: second packet ~2000 us after the first
        assert 1900 <= t2[1] - t2[0] <= 2400


class TestConfigValidation:
    def test_unknown_phy_rejected_at_config(self):
        from btle_tpu.stream import SnifferConfig

        with pytest.raises(ValueError):
            SnifferConfig(phy="2M")       # case-sensitive: '1m'|'2m'
        with pytest.raises(ValueError):
            SnifferConfig(phy="coded")
        assert SnifferConfig(phy="2m").samples_per_us == 8


class TestHopFollow2m:
    def test_2m_connection_follow_two_hops(self, rng):
        """Hop following on LE 2M: the interval clock (16 * 1250 us)
        must pace correctly at 8 samples/us — a CONNECT_REQ then data
        packets on the first two dwell channels (9 -> 18 with hop=9),
        all framed and decoded at 2M."""
        from btle_tpu.stream import Sniffer, SnifferConfig
        from btle_tpu.stream.sources import array_source
        from test_hop import (CONN_AA_HEX, CRC_INIT_HEX, connect_req_pdu,
                              data_pdu, place)

        sps = 4                      # 8 Msps wire at 2 Msym/s
        n = 240_000
        i = np.zeros(n, np.int16)
        q = np.zeros(n, np.int16)
        ci, cq, _ = G.btle_tx(connect_req_pdu(), 37, sps=sps, phy="2m")
        place(i, q, 20_000, ci, cq)            # t = 2500 us
        d1 = data_pdu(rng)
        ci, cq, _ = G.btle_tx(d1, 9, crc_init_hex=CRC_INIT_HEX,
                              access_address_hex=CONN_AA_HEX, sps=sps,
                              phy="2m")
        place(i, q, 72_000, ci, cq)            # t = 9000 us, dwell 1
        d2 = data_pdu(rng)
        ci, cq, _ = G.btle_tx(d2, 18, crc_init_hex=CRC_INIT_HEX,
                              access_address_hex=CONN_AA_HEX, sps=sps,
                              phy="2m")
        place(i, q, 192_000, ci, cq)           # t = 24000 us, post-hop
        sn = Sniffer(SnifferConfig(channel=37, sps=sps, hop=True,
                                   phy="2m"), quiet_text=True)
        events = sn.run(array_source(i, q))
        ok = [e for e in events if e.crc_ok]
        assert [e.channel for e in ok] == [37, 9, 18]
        np.testing.assert_array_equal(
            np.frombuffer(ok[2].payload_bytes, np.uint8),
            B.bits_to_bytes(d2)[2:])
        t = sn.hop_tracker
        assert t.hop == 9 and t.interval_us == 16 * 1250


class TestWideband2m:
    def test_selftest_xla_2m(self):
        """The known-answer scene framed for 2M decodes on all three
        channels through the XLA wideband pipeline at sps=2."""
        from btle_tpu.wideband.selftest import fused_selftest

        pos = fused_selftest(pipeline="xla", phy="2m")
        assert set(pos) == {37, 17, 39}

    def test_config_rejects_unknown_phy(self):
        from btle_tpu.wideband import WidebandConfig

        with pytest.raises(ValueError):
            WidebandConfig(phy="coded")


class TestCli2m:
    def _run(self, *argv):
        return subprocess.run(
            [sys.executable, "-m", "btle_tpu.cli", *argv],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": REPO}, timeout=600)

    def test_tx_decode_2m_roundtrip(self, tmp_path):
        out = tmp_path / "tx2m.bin"
        r = self._run(
            "tx", "37-DISCOVERY-TxAdd-1-RxAdd-0-AdvA-010203040506-"
            "LOCAL_NAME09-2M", "--phy", "2m", "--out", str(out))
        assert r.returncode == 0, r.stderr
        r = self._run("decode", "--bin", str(out), "--format", "f32",
                      "--phy", "2m", "--json")
        assert r.returncode == 0, r.stderr
        pkts = [json.loads(l) for l in r.stdout.splitlines()
                if l.strip().startswith("{")]
        pkts = [p for p in pkts if p.get("t") == "pkt"]
        assert len(pkts) == 1 and pkts[0]["crc_ok"]
        assert pkts[0]["adv_a"] == "01:02:03:04:05:06"

    def test_tx_2m_wideband_roundtrip(self, tmp_path):
        """Closed 2M wideband loop: `tx --phy 2m --wideband-out` ->
        `wideband --phy 2m` — the 2M packet rides the same 2 MHz channel
        grid (40 samples/symbol at 80 Msps) and decodes at sps=2."""
        wb = tmp_path / "wb2m.bin"
        r = self._run(
            "tx", "37-ADV_IND-TxAdd-1-RxAdd-0-AdvA-010203040506-"
            "AdvData-00112233-Space-1", "--phy", "2m",
            "--wideband-out", str(wb))
        assert r.returncode == 0, r.stderr
        r = self._run("wideband", "--bin", str(wb), "--format", "f32",
                      "--phy", "2m")
        assert r.returncode == 0, r.stderr
        lines = [ln for ln in r.stdout.splitlines()
                 if ln.startswith("ch37 ") and " crc0 " in ln]
        assert lines, r.stdout
        # AdvA on-air order + the AdvData in the PDU dump
        assert "06050403020100112233" in lines[0]
