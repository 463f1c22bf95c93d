"""LE Coded PHY (BLE 5 long range) — beyond-reference (the C tool and
its chip are LE-1M only; its doc lists only "LE 1M, with uncoded data").

Conformance evidence is structural self-consistency (this environment
has no off-the-air Coded captures and the reference provides none):
FEC free distance matches the optimal K=4 rate-1/2 code, Viterbi
corrects errors and terminates exactly, the pattern mapper inverts, the
end-to-end chain decodes both S through AWGN with the expected coding
gain over uncoded 1M (~+6 dB at S=2, ~+10 dB at S=8 — the LE Coded
link-budget classes), and the wideband channelizer carries 40 channels
of coded airspace like any other PHY.
"""

import subprocess
import sys
from itertools import product

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from btle_tpu.golden import model as G
from btle_tpu.phy.viterbi import fec_decode_bits, viterbi_decode
from btle_tpu.rx.coded import decode_coded
from btle_tpu.spec import bits as B
from btle_tpu.spec import coded as K


def make_packet(rng, ch, s, n_payload=12):
    payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
    pdu = B.bytes_to_bits(
        np.concatenate([[0x42, n_payload], payload]).astype(np.uint8))
    sym = K.assemble_coded_phy(pdu, ch, s=s)
    exp = np.concatenate([[0x42, n_payload], payload]).astype(np.uint8)
    return sym, exp


class TestFec:
    def test_roundtrip(self, rng):
        for n in (5, 64, 300):
            msg = np.concatenate(
                [rng.integers(0, 2, n), np.zeros(3)]).astype(np.int8)
            assert np.array_equal(fec_decode_bits(K.fec_encode(msg)), msg)

    def test_corrects_random_flips(self, rng):
        msg = np.concatenate(
            [rng.integers(0, 2, 200), np.zeros(3)]).astype(np.int8)
        enc = K.fec_encode(msg)
        bad = enc.copy()
        bad[rng.choice(len(enc), 20, replace=False)] ^= 1
        assert np.array_equal(fec_decode_bits(bad), msg)

    def test_free_distance_is_6(self):
        # the optimal K=4 rate-1/2 code's dfree (G0=x^3+x^2+1,
        # G1=x^3+x^2+x+1) — a wrong generator pair would change this
        best = 99
        for n in range(1, 8):
            for msg in product([0, 1], repeat=n):
                if msg[0] != 1:
                    continue
                m = np.asarray(msg + (0, 0, 0), np.int8)
                best = min(best, int(K.fec_encode(m).sum()))
        assert best == 6

    def test_soft_beats_hard(self, rng):
        # soft metrics must do at least as well as sign-quantizing them,
        # and decode cleanly at moderate noise where hard decisions
        # already carry flips
        msg = np.concatenate(
            [rng.integers(0, 2, 100), np.zeros(3)]).astype(np.int8)
        enc = K.fec_encode(msg).astype(np.float32) * 2 - 1
        noisy = enc + rng.normal(0, 0.6, enc.shape).astype(np.float32)
        assert ((noisy * enc) < 0).sum() > 0       # hard flips exist
        la, lb = noisy[0::2], noisy[1::2]
        soft, _ = viterbi_decode(jnp.asarray(la), jnp.asarray(lb), len(la))
        hard, _ = viterbi_decode(jnp.asarray(np.sign(la)),
                                 jnp.asarray(np.sign(lb)), len(la))
        err_soft = int((np.asarray(soft) != msg).sum())
        err_hard = int((np.asarray(hard) != msg).sum())
        assert err_soft == 0
        assert err_soft <= err_hard

    def test_pattern_mapper(self):
        bits = np.asarray([0, 1, 1, 0], np.int8)
        assert np.array_equal(
            K.pattern_map(bits, 8),
            [0, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1])
        assert np.array_equal(K.pattern_map(bits, 2), bits)
        soft = K.pattern_map(bits, 8).astype(np.float64) * 2 - 1
        assert np.array_equal(
            (K.pattern_demap_soft(soft, 8) > 0).astype(np.int8), bits)

    def test_packet_structure(self):
        sym, _ = make_packet(np.random.default_rng(0), 37, 8)
        assert np.array_equal(sym[:80], K.preamble_symbols())
        assert len(sym) == 80 + K.fec1_symbol_count() \
            + K.fec2_symbol_count(14 * 8, 8)
        # FEC1 is always S=8: 4-symbol groups are 0011 or 1100
        f1 = sym[80 : 80 + K.fec1_symbol_count()].reshape(-1, 4)
        assert all(tuple(g) in ((0, 0, 1, 1), (1, 1, 0, 0)) for g in f1)


class TestLoopback:
    @pytest.mark.parametrize("s", [8, 2])
    def test_decode_through_noise(self, rng, s):
        sym, exp = make_packet(rng, 37, s)
        ci, cq = G.gfsk_modulate_float(sym, 4)
        n = len(ci) + 4000
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        wi[1000 : 1000 + len(ci)] = ci
        wq[1000 : 1000 + len(cq)] = cq
        wi += rng.normal(0, 20, n).astype(np.float32)
        wq += rng.normal(0, 20, n).astype(np.float32)
        pkts = decode_coded(wi, wq, 37, sps=4)
        assert pkts and pkts[0]["crc_ok"]
        assert pkts[0]["s"] == s              # CI detected
        np.testing.assert_array_equal(pkts[0]["pdu_bytes"][: len(exp)], exp)

    def test_coding_gain_over_uncoded(self, rng):
        """At 5 dB (6 dB below the uncoded 0-ppm anchor) S=8 decodes
        reliably while the uncoded 1M receiver cannot — the whole point
        of the long-range PHY. Floors measured in round 5: S=8 ~1 dB,
        S=2 ~5 dB, uncoded ~11 dB."""
        from btle_tpu.rx import stream_decode

        snr = 5.0
        sig = 127 / 10 ** (snr / 20) / np.sqrt(2)
        coded_ok = uncoded_ok = 0
        trials = 6
        for _ in range(trials):
            sym, exp = make_packet(rng, 37, 8)
            ci, cq = G.gfsk_modulate_float(sym, 4)
            n = len(ci) + 4000
            wi = np.zeros(n, np.float32)
            wq = np.zeros(n, np.float32)
            wi[800 : 800 + len(ci)] = ci
            wq[800 : 800 + len(cq)] = cq
            wi += rng.normal(0, sig, n).astype(np.float32)
            wq += rng.normal(0, sig, n).astype(np.float32)
            pkts = decode_coded(wi, wq, 37, sps=4)
            coded_ok += bool(pkts and pkts[0]["crc_ok"] and np.array_equal(
                pkts[0]["pdu_bytes"][: len(exp)], exp))

            # the same PDU uncoded at the same SNR
            pdu = B.bytes_to_bits(exp)
            phy = G.assemble_phy_bits(pdu, 37)
            ui, uq = G.gfsk_modulate_float(phy, 4)
            m = len(ui) + 4000
            xi = np.zeros(m, np.float32)
            xq = np.zeros(m, np.float32)
            xi[800 : 800 + len(ui)] = ui
            xq[800 : 800 + len(uq)] = uq
            xi += rng.normal(0, sig, m).astype(np.float32)
            xq += rng.normal(0, sig, m).astype(np.float32)
            got = stream_decode(xi.astype(np.int16), xq.astype(np.int16),
                                37, sps=4)
            uncoded_ok += any(
                p.crc_ok and np.array_equal(
                    np.frombuffer(bytes(p.pdu_bytes), np.uint8)[: len(exp)],
                    exp) for p in got.packets)
        assert coded_ok == trials, f"coded {coded_ok}/{trials} at {snr} dB"
        assert uncoded_ok <= trials // 2, \
            f"uncoded unexpectedly fine ({uncoded_ok}/{trials}) at {snr} dB"


class TestWidebandCoded:
    def test_three_channels_mixed_s(self, rng):
        from btle_tpu.wideband import synthesize_wideband
        from btle_tpu.wideband.coded import scan_coded_capture

        n = 160000
        wi = np.zeros(n, np.float32)
        wq = np.zeros(n, np.float32)
        exp = {}
        for k, (ch, s) in enumerate([(37, 8), (9, 2), (25, 8)]):
            sym, e = make_packet(rng, ch, s, n_payload=8)
            burst = G.gfsk_modulate_float(sym, 80)
            si, sq = synthesize_wideband({ch: burst}, n, {ch: 8000 + 9000 * k})
            wi += si
            wq += sq
            exp[ch] = (e, s)
        wi += rng.normal(0, 3, n).astype(np.float32)
        wq += rng.normal(0, 3, n).astype(np.float32)
        pkts = scan_coded_capture(wi, wq)
        ok = {p["channel"]: p for p in pkts if p["crc_ok"]}
        for ch, (e, s) in exp.items():
            p = ok.get(ch)
            assert p and p["s"] == s, (ch, p)
            np.testing.assert_array_equal(p["pdu_bytes"][: len(e)], e)
        assert not [p for p in pkts
                    if p["crc_ok"] and p["channel"] not in exp], "ghosts"


class TestCli:
    def test_wideband_coded_roundtrip(self, tmp_path):
        out = tmp_path / "wbc.bin"
        r = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "tx",
             "17-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0-DATA-CAFE"
             "-CRCInit-555555-Space-1", "--phy", "coded8",
             "--wideband-out", str(out)],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        r2 = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "wideband", "--bin",
             str(out), "--phy", "coded8"],
            capture_output=True, text=True)
        assert r2.returncode == 0, r2.stderr
        ok = [ln for ln in r2.stdout.splitlines()
              if " crc0 " in ln and ln.startswith("ch17")]
        assert ok and ok[0].endswith("0102cafe")

    @pytest.mark.parametrize("phy", ["coded8", "coded2"])
    def test_tx_decode_loopback(self, tmp_path, phy):
        out = tmp_path / "c.bin"
        r = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "tx",
             "37-ADV_IND-TxAdd-0-RxAdd-0-AdvA-0A0B0C0D0E0F-AdvData-0011"
             "-Space-1", "--phy", phy, "--out", str(out)],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        r2 = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "decode", "--bin", str(out),
             "--format", "f32", "--phy", phy, "--channel", "37"],
            capture_output=True, text=True)
        assert r2.returncode == 0, r2.stderr
        assert " crc0 " in r2.stdout
        assert f"S={phy[-1]}" in r2.stdout
        assert "0f0e0d0c0b0a0011" in r2.stdout
        # --json: the same ABI as every other decode surface
        import json as _json

        r3 = subprocess.run(
            [sys.executable, "-m", "btle_tpu", "decode", "--bin", str(out),
             "--format", "f32", "--phy", phy, "--channel", "37", "--json"],
            capture_output=True, text=True)
        assert r3.returncode == 0, r3.stderr
        evs = [_json.loads(ln) for ln in r3.stdout.splitlines()]
        assert evs and evs[0]["kind"] == "adv" and evs[0]["crc_ok"]
        assert evs[0]["adv_a"] == "0a:0b:0c:0d:0e:0f"


class TestViterbiRadix2:
    def test_matches_radix1_on_noise(self, rng):
        from btle_tpu.phy.viterbi import viterbi_decode, viterbi_decode_r2

        for _ in range(10):
            n = int(rng.integers(4, 150)) * 2
            msg = np.concatenate(
                [rng.integers(0, 2, n - 3), np.zeros(3)]).astype(np.int8)
            enc = K.fec_encode(msg).astype(np.float32) * 2 - 1
            noisy = enc + rng.normal(0, 0.55, enc.shape).astype(np.float32)
            la, lb = noisy[0::2], noisy[1::2]
            b1, m1 = viterbi_decode(jnp.asarray(la), jnp.asarray(lb), n)
            b2, m2 = viterbi_decode_r2(jnp.asarray(la), jnp.asarray(lb), n)
            np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
            assert abs(float(m1) - float(m2)) < 1e-3
