"""Channelizer fidelity (SURVEY hard part #5): the wideband path must not
degrade BER vs the single-channel golden baseline. With symbol-lag
decisions after the polyphase filter, packets at the reference's 0-ppm
anchor SNR (11 dB) must decode reliably."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from btle_tpu.golden import model as G
from btle_tpu.rx.pipeline import decode_block
from btle_tpu.spec import bits as B
from btle_tpu.spec import crc24 as C
from btle_tpu.spec import whitening as W
from btle_tpu.wideband import synthesize_wideband
from btle_tpu.wideband.channelizer import channel_to_bin, channelize


def test_wideband_packets_at_anchor_snr():
    rng = np.random.default_rng(1)
    snr_db = 11.0
    # wideband noise: the channel filter keeps 2/80 of the band, so the
    # int8-peak-referenced in-channel SNR maps to sqrt(20)x wideband sigma
    sigma80 = 127 / 10 ** (snr_db / 20) / np.sqrt(2) * np.sqrt(20)
    aa = jnp.asarray(B.hex_to_bits("d6be898e"))
    mask = jnp.asarray(np.ones(32, np.int8))
    wh = jnp.asarray(W.whitening_bits(17, 336))
    crc = jnp.int32(C.lfsr_init_to_table_init("555555"))

    n_ok = 0
    trials = 25
    for _ in range(trials):
        payload = rng.integers(0, 256, 30, dtype=np.uint8)
        pdu = B.bytes_to_bits(np.concatenate([[0x40, 30], payload]).astype(np.uint8))
        phy = G.assemble_phy_bits(pdu, 17)
        i80, q80 = G.gfsk_modulate_float(phy, 80)
        wi, wq = synthesize_wideband({17: (i80, q80)}, len(i80) + 8000, {17: 4000})
        wi = wi + rng.normal(0, sigma80, len(wi)).astype(np.float32)
        wq = wq + rng.normal(0, sigma80, len(wq)).astype(np.float32)
        yi, yq = channelize(jnp.asarray(wi), jnp.asarray(wq))
        m = channel_to_bin(17)
        out = decode_block(yi[m], yq[m], aa, mask, wh, crc, jnp.asarray(True),
                           sps=4, lag=4, max_candidates=4)
        okk = np.asarray(out["crc_ok"])
        pdub = np.asarray(out["pdu_bytes"])
        exp = B.bits_to_bytes(pdu)
        for k in range(4):
            if okk[k] and np.array_equal(pdub[k][: len(exp)].astype(np.uint8), exp):
                n_ok += 1
                break
    # reference anchor: ~0.1% BER at 11 dB -> essentially every packet decodes
    assert n_ok >= trials - 2, f"{n_ok}/{trials} packets at anchor SNR"


def test_wideband_2m_floor_within_2db_of_1m():
    """Tightened pin of the LE-2M wideband floor (round-5 measurement,
    tools/ber_2m_wideband.py): with the sensitivity-optimized 1.2 MHz
    prototype (sniffer.CUTOFF_MHZ_2M_SENS — the AWGN-limited deployment
    option; the interference-robust 1.0 stays the default) the 2M scene
    decodes EVERY packet at +2 dB int8-peak SNR — ~2 dB above 1M's
    clean point (round 4 could only promise 4 dB)."""
    from btle_tpu.wideband.selftest import _scene
    from btle_tpu.wideband.sniffer import (CUTOFF_MHZ_2M_SENS,
                                           default_scan_tables,
                                           wideband_scan)

    aa, mask, whiten, crc, adv = default_scan_tables()
    wi0, wq0, expected = _scene(phy="2m")
    rng = np.random.default_rng(11)
    std = 127.0 * 10 ** (-2.0 / 20.0)
    ok = tot = 0
    for _ in range(3):
        wi = wi0 + rng.normal(0, std, len(wi0)).astype(np.float32)
        wq = wq0 + rng.normal(0, std, len(wq0)).astype(np.float32)
        out = wideband_scan(jnp.asarray(wi), jnp.asarray(wq), aa, mask,
                            whiten, crc, adv, sps=2, lag=2,
                            max_candidates=8,
                            cutoff_mhz=CUTOFF_MHZ_2M_SENS)
        crc_ok = np.asarray(out["crc_ok"])
        pdu = np.asarray(out["pdu_bytes"])
        for ch, exp in expected.items():
            m = channel_to_bin(ch)
            tot += 1
            ok += any(np.array_equal(pdu[m, k, : len(exp)].astype(np.uint8),
                                     exp)
                      for k in np.flatnonzero(crc_ok[m]))
    assert ok == tot, f"{ok}/{tot} 2M packets at 2 dB"


def test_2m_phy_aware_cutoff_beats_shared_filter():
    """The filter-design pin behind sniffer.CUTOFF_MHZ_2M: at a
    below-floor SNR the 1.2 MHz prototype decodes strictly more of a
    dense all-40-channel 2M scene than the 1M-shared 1.0 MHz filter
    (round-5 sweep: 84/120 vs 50/120 at -2 dB across three seeds)."""
    from btle_tpu.spec import bits as B
    from btle_tpu.tx import parse_descriptor
    from btle_tpu.tx.synth import scene_to_wideband
    from btle_tpu.wideband.sniffer import default_scan_tables, wideband_scan

    rng = np.random.default_rng(0x2A)
    placed, expected = [], {}
    for k, ch in enumerate(range(40)):
        payload = rng.integers(0, 256, 8 + (k % 12), dtype=np.uint8)
        if ch in (37, 38, 39):
            d = (f"{ch}-ADV_NONCONN_IND-TxAdd-0-RxAdd-0"
                 f"-AdvA-{bytes(payload[:6]).hex()}"
                 f"-AdvData-{bytes(payload[6:]).hex()}-Space-1")
        else:
            d = (f"{ch}-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0"
                 f"-DATA-{bytes(payload).hex()}-CRCInit-555555-Space-1")
        spec = parse_descriptor(d).to_2m()
        placed.append((spec, 12_000 + 55_000 * k))
        expected[ch] = np.asarray(
            B.bits_to_bytes(spec.info_bits[spec.pdu_start:]), np.uint8)
    n_wb = 12_000 + 55_000 * 40 + 60_000
    wi, wq = scene_to_wideband(placed, n_wb, noise_std=0.0)
    peak = float(np.max(np.abs(wi)))
    sig = peak * 10 ** (2.0 / 20)                 # -2 dB int8-peak SNR
    nz = np.random.default_rng(0x2B).normal(
        0, sig, (2, len(wi))).astype(np.float32)
    aa, mask, whiten, crc, adv = default_scan_tables()

    def count(cutoff):
        out = wideband_scan(jnp.asarray(wi + nz[0]), jnp.asarray(wq + nz[1]),
                            aa, mask, whiten, crc, adv, sps=2, lag=2,
                            max_candidates=8, cutoff_mhz=cutoff)
        out = {k: np.asarray(v) for k, v in out.items()}
        n = 0
        for ch, pdu in expected.items():
            m = channel_to_bin(ch)
            n += any(np.array_equal(
                out["pdu_bytes"][m, k, : len(pdu)].astype(np.uint8), pdu)
                for k in np.flatnonzero(out["crc_ok"][m]))
        return n

    n_old, n_new = count(1.0), count(1.2)
    assert n_new >= n_old + 5, (n_old, n_new)
    assert n_new >= 22, (n_old, n_new)
