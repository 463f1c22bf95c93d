"""Fused Pallas wideband front-end vs the XLA path (interpret mode on CPU;
the compiled kernel is exercised by bench.py on TPU hardware).

Parity criterion: identical packet sets (positions, CRC verdicts, PDU
octets) — the reference's own packet-decision parity notion
(python/test_btle_rx_by_captured_iq.py). Bit-for-bit lattice equality is
NOT required: the fused filterbank contracts in a different order, so
decisions where |d| ~ 1e-9 (pure-noise float ties) may flip.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import os

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from btle_tpu.golden import model as G
from btle_tpu.spec import bits as B
from btle_tpu.spec import crc24 as C
from btle_tpu.spec import whitening as W

if os.environ.get("BTLE_TPU_TEST_BACKEND") == "tpu":
    pytest.skip("pallas interpret mode is a CPU debugging path; the "
                "compiled kernel is exercised by bench.py on hardware",
                allow_module_level=True)

from btle_tpu.wideband import synthesize_wideband
from btle_tpu.wideband.channelizer import bin_to_channel
from btle_tpu.wideband.fused import fused_frontend, wideband_scan_fused
from btle_tpu.wideband.sniffer import wideband_scan


def _burst(rng, ch, n_payload=12):
    hdr = 0x40 if ch in (37, 38, 39) else 0x01
    payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
    pdu = B.bytes_to_bits(
        np.concatenate([[hdr, n_payload], payload]).astype(np.uint8))
    phy = G.assemble_phy_bits(pdu, ch)
    return G.gfsk_modulate_float(phy, 80)


def _tables():
    aa = jnp.asarray(B.hex_to_bits("d6be898e"))
    mask = jnp.asarray(np.ones(32, np.int8))
    whiten = jnp.asarray(
        np.stack([W.whitening_bits(bin_to_channel(m), 336) for m in range(40)]))
    crc = jnp.asarray(np.full(40, C.lfsr_init_to_table_init("555555"), np.int32))
    adv = jnp.asarray(
        np.array([bin_to_channel(m) in (37, 38, 39) for m in range(40)]))
    return aa, mask, whiten, crc, adv


def _wideband(rng, chans=(37, 0, 17, 39), n=100000):
    signals, offsets = {}, {}
    for k, ch in enumerate(chans):
        signals[ch] = _burst(rng, ch)
        offsets[ch] = 3000 + 20000 * k
    wi, wq = synthesize_wideband(signals, n, offsets)
    wi += rng.normal(0, 0.01, wi.shape).astype(np.float32)
    wq += rng.normal(0, 0.01, wq.shape).astype(np.float32)
    return wi, wq


@pytest.mark.parametrize("inner,lag", [("im2col", 4), ("im2col", 1),
                                       ("poly", 4), ("poly", 1)])
def test_fused_scan_packet_parity(rng, inner, lag):
    wi, wq = _wideband(rng)
    aa, mask, whiten, crc, adv = _tables()
    ref = wideband_scan(jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten,
                        crc, adv, sps=4, lag=lag, max_candidates=8)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    with pltpu.force_tpu_interpret_mode():
        out = wideband_scan_fused(
            jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten, crc, adv,
            sps=4, lag=lag, max_candidates=8, tile=512, inner=inner,
            interpret=True)
    out = {k: np.asarray(v) for k, v in out.items()}

    for key in ("pos", "valid", "crc_ok", "payload_len", "len_ok"):
        np.testing.assert_array_equal(ref[key], out[key], err_msg=key)
    assert int(ref["crc_ok"].sum()) >= 4  # every injected packet decoded
    np.testing.assert_array_equal(ref["num_hits"], out["num_hits"])
    # PDU octets compared over the meaningful span (header + payload +
    # CRC); bytes past the packet are noise decisions and may differ
    for m, k in np.argwhere(ref["crc_ok"]):
        span = 2 + int(ref["payload_len"][m, k]) + 3
        np.testing.assert_array_equal(
            ref["pdu_bytes"][m, k, :span], out["pdu_bytes"][m, k, :span])
        # the fused windowed RSSI sums are exact per window while the XLA
        # path differences a block-wide f32 cumsum — allow that error
        np.testing.assert_allclose(
            ref["mag_mean"][m, k], out["mag_mean"][m, k], rtol=0.02)


def test_fused_frontend_lattice_parity(rng):
    """Decision/hit lattices match the per-channel XLA scan except where
    |d| is at float-tie level (pure noise)."""
    from btle_tpu.rx.pipeline import scan_block
    from btle_tpu.wideband.channelizer import channelize

    wi, wq = _wideband(rng, chans=(37,), n=60000)
    aa, mask, *_ = _tables()
    yi, yq = channelize(jnp.asarray(wi), jnp.asarray(wq))
    yi, yq = np.asarray(yi), np.asarray(yq)
    hit_ref, bits_ref = [], []
    for m in range(40):
        h, b = scan_block(jnp.asarray(yi[m]), jnp.asarray(yq[m]), aa, mask,
                          sps=4, lag=4)
        hit_ref.append(np.asarray(h))
        bits_ref.append(np.asarray(b))
    hit_ref, bits_ref = np.stack(hit_ref), np.stack(bits_ref)
    with pltpu.force_tpu_interpret_mode():
        bits_f, hit_f, mag_f = fused_frontend(
            jnp.asarray(wi), jnp.asarray(wq), aa, mask, tile=512,
            interpret=True)
    np.testing.assert_array_equal(hit_ref, np.asarray(hit_f))
    frac = (bits_ref != np.asarray(bits_f)).mean()
    assert frac < 1e-3, frac  # only noise-tie flips
    # RSSI window means: exact windowed sums vs the channelize output.
    # On the packet (large |y|) the two filterbank evaluations agree
    # tightly; at the noise floor f32 contraction-order differences
    # dominate, so compare with an absolute floor there.
    mag_f = np.asarray(mag_f)
    d = np.abs(yi) + np.abs(yq)
    n0 = 300  # inside the ch-37 burst (frames ~150-850)
    want = d[:, n0 : n0 + 128].mean(axis=1)
    np.testing.assert_allclose(mag_f[20, n0], want[20], rtol=1e-4)
    np.testing.assert_allclose(mag_f[:, n0], want, rtol=1e-2, atol=1e-3)


def test_fused_bf16_decodes_real_packets(rng):
    """bf16 filterbank: every real packet still decodes. bf16's ~-48 dB
    stopband lets a strong burst ghost into other channels as extra AA
    hits (a 2 MHz-multiple CFO is invisible to symbol-lag phase-diff
    demod), but per-channel whitening makes ghosts fail CRC — they cost
    candidate slots, never produce false packets. f32 is the default."""
    wi, wq = _wideband(rng)
    aa, mask, whiten, crc, adv = _tables()
    with pltpu.force_tpu_interpret_mode():
        out = wideband_scan_fused(
            jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten, crc, adv,
            sps=4, lag=4, max_candidates=8, tile=512,
            compute_dtype="bf16", interpret=True)
    out = {k: np.asarray(v) for k, v in out.items()}
    from btle_tpu.wideband.channelizer import channel_to_bin

    got = {m for m, k in np.argwhere(out["crc_ok"])}
    assert {channel_to_bin(ch) for ch in (37, 0, 17, 39)} <= got
    # ghosts (extra crc_ok channels) would indicate whitening confusion
    assert got == {channel_to_bin(ch) for ch in (37, 0, 17, 39)}


def test_fused_has_context_streaming(rng):
    """has_context frame alignment matches channelize's (streaming mode)."""
    aa, mask, whiten, crc, adv = _tables()
    wi, wq = _wideband(rng, chans=(38,), n=80000)
    ctx = np.zeros(1279, np.float32)
    ref = wideband_scan(jnp.asarray(np.concatenate([ctx, wi])),
                        jnp.asarray(np.concatenate([ctx, wq])),
                        aa, mask, whiten, crc, adv, sps=4, lag=4,
                        max_candidates=8, has_context=True)
    with pltpu.force_tpu_interpret_mode():
        out = wideband_scan_fused(
            jnp.asarray(np.concatenate([ctx, wi])),
            jnp.asarray(np.concatenate([ctx, wq])),
            aa, mask, whiten, crc, adv, sps=4, lag=4, max_candidates=8,
            tile=512, has_context=True, interpret=True)
    for key in ("pos", "valid", "crc_ok"):
        np.testing.assert_array_equal(
            np.asarray(ref[key]), np.asarray(out[key]), err_msg=key)
    assert int(np.asarray(ref["crc_ok"]).sum()) >= 1


def test_sniffer_fused_streaming_parity(rng):
    """WidebandSniffer with cfg.fused=True produces the same packet list
    as the XLA path across streamed blocks (context carry + span-eating
    + cursor logic all exercised)."""
    from btle_tpu.wideband import WidebandConfig, WidebandSniffer

    signals, offsets = {}, {}
    for k, ch in enumerate((37, 5, 21, 38)):
        signals[ch] = _burst(rng, ch, n_payload=10 + k)
        offsets[ch] = 50000 + 140000 * k
    wi, wq = synthesize_wideband(signals, 700000, offsets)
    wi += rng.normal(0, 0.01, wi.shape).astype(np.float32)
    wq += rng.normal(0, 0.01, wq.shape).astype(np.float32)

    def run(fused):
        # exact parity mode pinned: this test asserts the identical
        # packet LIST vs the XLA path (the throughput default bf16x2w
        # is packet-set-validated separately)
        sn = WidebandSniffer(WidebandConfig(scan_len_ch=8192, fused=fused,
                                            fused_tile=512,
                                            fused_dtype="f32"))
        with pltpu.force_tpu_interpret_mode():
            pkts = sn.run(wi, wq)
        return [(p.channel, p.sample_pos, p.payload_len, p.crc_ok,
                 p.pdu_bytes.tobytes()) for p in pkts]

    ref = run(False)
    got = run(True)
    assert len([p for p in ref if p[3]]) >= 4
    assert ref == got


def test_fused_bf16x2w_packet_set(rng):
    """Production-throughput mode: bf16 hi/lo weight pair (filter
    response faithful to ~-96 dB) with bf16 operands. Criterion is
    packet-level (the reference's own parity notion): identical CRC-OK
    packet set; slot-exact equality is not required (operand rounding
    can flip noise decisions)."""
    wi, wq = _wideband(rng)
    aa, mask, whiten, crc, adv = _tables()
    ref = wideband_scan(jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten,
                        crc, adv, sps=4, lag=4, max_candidates=8)
    with pltpu.force_tpu_interpret_mode():
        out = wideband_scan_fused(
            jnp.asarray(wi), jnp.asarray(wq), aa, mask, whiten, crc, adv,
            sps=4, lag=4, max_candidates=8, tile=512,
            compute_dtype="bf16x2w", interpret=True)

    def pkt_set(o):
        o = {k: np.asarray(v) for k, v in o.items()}
        return {(int(m), bytes(o["pdu_bytes"][m, k, : 2 + int(o["payload_len"][m, k]) + 3]
                               .astype(np.uint8)))
                for m, k in np.argwhere(o["crc_ok"])}

    assert pkt_set(out) == pkt_set(ref)
    assert len(pkt_set(out)) >= 4


def test_fused_per_channel_aa_rows(rng):
    """Distinct AA/CRC-init per channel (the followed-connection re-key
    path): data-channel packets with a sniffed AA decode next to the
    advertising channels, slot-exact vs the XLA path."""
    conn_aa = 0x50655535
    conn_aa_hex = int(conn_aa).to_bytes(4, "little").hex()
    crc_init_lfsr = "a1b2c3"

    signals, offsets = {}, {}
    # adv packet on 37, data packets on two data channels with the conn AA
    signals[37] = _burst(rng, 37)
    offsets[37] = 3000
    for k, ch in enumerate((4, 22)):
        payload = rng.integers(0, 256, 9, dtype=np.uint8)
        pdu = B.bytes_to_bits(
            np.concatenate([[0x01, 9], payload]).astype(np.uint8))
        phy = G.assemble_phy_bits(pdu, ch, access_address_hex=conn_aa_hex,
                                  crc_init_hex=crc_init_lfsr)
        signals[ch] = G.gfsk_modulate_float(phy, 80)
        offsets[ch] = 25000 + 20000 * k
    wi, wq = synthesize_wideband(signals, 90000, offsets)
    wi += rng.normal(0, 0.01, wi.shape).astype(np.float32)
    wq += rng.normal(0, 0.01, wq.shape).astype(np.float32)

    _, mask, whiten, _, adv = _tables()
    aa_rows = np.tile(B.hex_to_bits("d6be898e"), (40, 1))
    crc_rows = np.full(40, C.lfsr_init_to_table_init("555555"), np.int32)
    conn_bits = B.hex_to_bits(conn_aa_hex)
    conn_crc = C.lfsr_init_to_table_init(crc_init_lfsr)
    for m in range(40):
        if bin_to_channel(m) not in (37, 38, 39):
            aa_rows[m] = conn_bits
            crc_rows[m] = conn_crc
    aa_rows = jnp.asarray(aa_rows)
    crc_rows = jnp.asarray(crc_rows)

    ref = wideband_scan(jnp.asarray(wi), jnp.asarray(wq), aa_rows, mask,
                        whiten, crc_rows, adv, sps=4, lag=4, max_candidates=8)
    with pltpu.force_tpu_interpret_mode():
        out = wideband_scan_fused(
            jnp.asarray(wi), jnp.asarray(wq), aa_rows, mask, whiten,
            crc_rows, adv, sps=4, lag=4, max_candidates=8, tile=512,
            interpret=True)
    ref = {k: np.asarray(v) for k, v in ref.items()}
    out = {k: np.asarray(v) for k, v in out.items()}
    for key in ("pos", "valid", "crc_ok", "payload_len"):
        np.testing.assert_array_equal(ref[key], out[key], err_msg=key)
    got = {bin_to_channel(int(m)) for m, k in np.argwhere(out["crc_ok"])}
    assert {37, 4, 22} <= got


@pytest.mark.parametrize("num_taps", [640, 1280])
def test_poly_tables_reconstruct_folded_weights(num_taps):
    """The poly factorization (perm, kcoef, wdft) must reproduce the
    DFT-folded conv weights EXACTLY: y[o,k] = sum_s G[s][o,i] f[i,k+s]
    == sum_row wdft[o,row] kcoef[row,s] f[perm[row],k+s]. Also checks
    the parity split (even rows carry only even shifts and vice versa),
    which the kernel's two grouped FMA loops rely on."""
    from btle_tpu.wideband.channelizer import D, M
    from btle_tpu.wideband.fused import _g_stack, _poly_tables

    perm, kcoef, wdft = _poly_tables(num_taps)
    width = kcoef.shape[1]
    g = _g_stack(num_taps)                       # (width, 80, 40) oracle
    g2 = np.zeros_like(g)
    for row in range(2 * M):
        for s in range(width):
            if kcoef[row, s]:
                g2[s, :, perm[row]] += wdft[:, row] * kcoef[row, s]
    np.testing.assert_allclose(g2, g, atol=1e-6)
    assert not kcoef[: 2 * D, 1::2].any()        # even rows: even shifts
    assert not kcoef[2 * D :, 0::2].any()        # odd rows: odd shifts


def test_aa_mxu_equals_fma_form(rng):
    """The block-diagonal MXU AA correlation (4 strided rolls + matmuls,
    _demod_tail + _aa_w4) must produce IDENTICAL hit lattices to the
    plain 32-shifted-FMA form (dev_skip="aafma" replays it) — both
    compute the same exact small integers, so any difference means the
    w4 weight layout or the roll shift geometry regressed. Exercised
    with per-channel AA rows (hop-following re-key shape) and a
    non-trivial care mask."""
    wi, wq = _wideband(rng, chans=(37, 9, 39), n=80000)
    aa_rows = jnp.asarray(rng.integers(0, 2, (40, 32)).astype(np.int8))
    mask = np.ones(32, np.int8)
    mask[5] = mask[17] = 0                       # care-mask holes
    mask = jnp.asarray(mask)
    with pltpu.force_tpu_interpret_mode():
        bits_m, hit_m, _ = fused_frontend(
            jnp.asarray(wi), jnp.asarray(wq), aa_rows, mask, tile=512,
            interpret=True)
        bits_f, hit_f, _ = fused_frontend(
            jnp.asarray(wi), jnp.asarray(wq), aa_rows, mask, tile=512,
            interpret=True, dev_skip="aafma")
    np.testing.assert_array_equal(np.asarray(bits_m), np.asarray(bits_f))
    np.testing.assert_array_equal(np.asarray(hit_m), np.asarray(hit_f))


def test_hilo_weight_pair_is_exact_and_stacked():
    """The bf16 hi/lo im2col weight pair (fused._g_chunks_hilo) must
    (a) sum to the f32 chunk weights with ~16-bit mantissa fidelity
    (each half carries 8 bf16 mantissa bits — the property behind
    bf16x2w's ~-96 dB filter response, vs ~-48 dB for hi alone) and
    (b) stack hi over lo on the output-row axis (rows 0..79 hi,
    80..159 lo) so the kernel's single-dot-per-chunk row-half sum
    reconstructs the f32 matmul."""
    import ml_dtypes

    from btle_tpu.wideband.fused import M, _g_chunks, _g_chunks_hilo

    gc = _g_chunks(1280).astype(np.float64)
    pair = _g_chunks_hilo(1280)
    assert pair.shape == (gc.shape[0], 4 * M, gc.shape[2])
    hi = pair[:, : 2 * M].astype(np.float64)
    lo = pair[:, 2 * M :].astype(np.float64)
    scale = np.abs(gc).max()
    err_pair = np.abs(hi + lo - gc).max() / scale
    err_hi = np.abs(hi - gc).max() / scale
    assert err_pair < 2.0 ** -15                 # ~-96 dB weight fidelity
    assert err_pair < err_hi / 100               # lo half genuinely helps
    # both halves must be bf16-representable (lossless cast round trip)
    for half in (pair[:, : 2 * M], pair[:, 2 * M :]):
        rt = half.astype(ml_dtypes.bfloat16).astype(half.dtype)
        np.testing.assert_array_equal(rt, half)


def test_polyroll_inner_matches_poly(rng):
    """The strided-roll shift manufacture (inner="polyroll") must produce
    the SAME lattices as the slice-copy poly inner: identical shifts,
    identical ascending-shift f32 accumulation order — any difference
    means the roll geometry (base amount / stride / row order) regressed."""
    wi = rng.normal(0, 20, 90000).astype(np.float32)
    wq = rng.normal(0, 20, 90000).astype(np.float32)
    aa = jnp.broadcast_to(jnp.asarray(B.hex_to_bits("d6be898e")), (40, 32))
    mask = jnp.asarray(np.ones(32, np.int8))
    with pltpu.force_tpu_interpret_mode():
        ref = fused_frontend(jnp.asarray(wi), jnp.asarray(wq), aa, mask,
                             tile=512, inner="poly", interpret=True)
        got = fused_frontend(jnp.asarray(wi), jnp.asarray(wq), aa, mask,
                             tile=512, inner="polyroll", interpret=True)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
    np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(got[2]),
                               rtol=1e-5)
