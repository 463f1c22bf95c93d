"""Fused Pallas front-end for the wideband pass: channelize + demod + AA.

The XLA wideband pass (channelizer.channelize -> phy.demodulator ->
rx.pipeline.scan_block) materializes the 40-channel baseband (2 x 40 x K
f32, ~42 MB per 131k block) in HBM between the polyphase conv, the DFT
matmuls, the demod and the AA correlation; measured stage costs put it
~10x above the HBM roofline (PERF.md) — the pass is lowering/bandwidth
limited, not FLOP limited. This kernel keeps the whole front end in VMEM
per time tile (the TPU-native form of the reference's one-pass
sample-serial receive loop, btle_rx.c:1489-1562 + 2188-2391):

  per grid step i (one tile of T output frames):
    1. DMA the frame tile from HBM                          [~0.4 us]
    2. filterbank, one of two inners (see _default_inner):
       - "im2col" (bf16 modes): y[:, k] = sum_s G_s @ F[:, k+s]  [MXU]
         where G_s folds the polyphase taps AND the 40-point DFT
         (channelizer._fused_kernel), rows 0..39 = y_i, 40..79 = y_q
       - "poly" (exact f32): per-branch 32-tap convs as VPU shifted
         FMAs over permuted frame rows, then ONE (80, 80) DFT matmul
         (_poly_tables) — the true polyphase work is ~3 GFLOP/131k
         block vs the folded form's 109; at f32 the VPU form wins
    3. phase-difference decisions d > 0                     [VPU]
    4. 32-tap per-channel access-address correlation: 4 strided
       rolls + 4 block-diagonal matmuls (see _demod_tail)   [MXU]
    5. 128-sample |I|+|Q| window sums for RSSI              [VPU]
    6. write ONLY the bit lattice, hit mask and RSSI sums

Channels live on sublanes (40 = 5 exact f32 sublane tiles) and time on
lanes, so VPU stages carry no lane-padding waste and the downstream
decode gets (40, K) lattices with no transpose.

The (-1)^(m k) half-band correction commutes through the demod: with
even lag it cancels exactly (s(m,k) s(m,k+lag) = (-1)^(m lag) = +1);
with odd lag it is a constant per-channel decision flip — so the kernel
never applies it to y at all (odd-m rows compare d < 0 instead; |y| is
sign-invariant for the RSSI sums).

Numerics (compute_dtype; see PERF.md's dynamic-range ladder): "f32"
evaluates the filterbank at Precision.HIGHEST (the MXU's DEFAULT would
silently run ONE bf16 pass) — float-close, not bit-identical, to the
XLA path (different contraction order), so decisions can differ where
|d| ~ 1e-9 (pure-noise float ties). "bf16x2w" is the production
throughput mode: the weights as an exact bf16 hi/lo pair (~-96 dB
faithful filter response) with bf16 operands — exact for int8 SDR wire
formats, -48 dB noise-like input rounding otherwise; packet-set
identical to the exact mode (tools/validate_fused_tpu.py on hardware).
"bf16" quantizes the weights too (~-48 dB coherent stopband — strong
bursts ghost CRC-rejected AA hits into other channels).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .channelizer import (D, DEFAULT_TAPS, M, _dft_matrix, _fused_kernel,
                          _poly_kernel, branch_columns)

AA_BITS = 32
# TPU MXU precision for the filterbank matmuls. DEFAULT lowers f32
# operands to ONE bf16 pass on hardware — a ~-48 dB effective stopband
# that ghosts strong bursts into other channels (extra CRC-rejected AA
# hits). HIGHEST uses the multi-pass f32 algorithm and restores the
# prototype's real stopband. (The CRC/byte-pack matmuls elsewhere are
# exact at any precision: 0/1 and power-of-two operands are
# bf16-representable and accumulation is f32.)
_FILTER_PRECISION = jax.lax.Precision.HIGHEST


N_CHUNKS = 5  # im2col chunking of the shift axis (width 65 -> 5 x 13)
_POLY_GROUP = 8  # poly inner: shifts chained in registers per ref store


@lru_cache(maxsize=None)
def _g_stack(num_taps: int, cutoff_mhz: float = 1.0) -> np.ndarray:
    """(65, 80, 40) filterbank+DFT weights: y[o, k] = sum_s G[s] @ F[:, k+s].

    From channelizer._fused_kernel's conv weights w[o, i, s] (OIW layout):
    G[s][o, i] = w[o, i, s]. Input rows i: 0..19 = I decimated streams,
    20..39 = Q; output rows o: 0..39 = y_i bins, 40..79 = y_q bins.
    """
    w = _fused_kernel(num_taps, cutoff_mhz)  # (80, 40, width)
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1)))


@lru_cache(maxsize=None)
def _g_chunks(num_taps: int, cutoff_mhz: float = 1.0) -> np.ndarray:
    """(N_CHUNKS, 80, chunk*40) im2col weights.

    Chunk c's matmul contracts over chunk*40 = 520 rows of the im2col
    buffer X[j*40+i, k] = F[i, k + c*chunk + j] — a 520-deep contraction
    keeps the MXU ~4x better utilized than the 40-deep per-shift dots
    (K pads to the 128 tile either way).

    (Negative result, measured: manufacturing X with ONE strided lane
    rotate per chunk instead of the chunk slice-copies ran 1.06x on an
    isolated f32 inner, but the 5 chained 2.7 MB rolled broadcasts blow
    the 16 MB Mosaic stack inside the full kernel even when stored
    through scratch, and the bf16 modes cannot rotate packed vectors —
    an f32 roll detour measured a wash. The copies stay.)
    """
    g = _g_stack(num_taps, cutoff_mhz)   # (width, 80, 40)
    width = g.shape[0]
    chunk = -(-width // N_CHUNKS)
    gp = np.zeros((N_CHUNKS * chunk, 2 * M, 2 * D), g.dtype)
    gp[:width] = g
    # gc[c][o, j*40 + i] = g[c*chunk + j][o, i]
    gc = gp.reshape(N_CHUNKS, chunk, 2 * M, 2 * D)
    gc = np.transpose(gc, (0, 2, 1, 3)).reshape(N_CHUNKS, 2 * M, chunk * 2 * D)
    return np.ascontiguousarray(gc)


@lru_cache(maxsize=None)
def _g_chunks_hilo(num_taps: int, cutoff_mhz: float = 1.0) -> np.ndarray:
    """(N_CHUNKS, 160, chunk*40) bf16 hi/lo im2col weight pair, stacked.

    gc = hi + lo to ~16 mantissa bits (~-96 dB — each half carries 8
    bf16 mantissa bits), with both halves bf16-representable: the
    DEFAULT-precision MXU pass then evaluates the filterbank with
    ~f32-faithful WEIGHTS (~-96 dB response error) while operands stay
    bf16. The hi and lo halves share the SAME im2col operand, so they
    stack on the output-row axis (rows 0..159 = [hi; lo]) and each chunk
    costs ONE matmul whose row halves are summed — instead of two
    80-row dots (same MXU row-tiles, half the instruction overhead).
    """
    import ml_dtypes

    gc = _g_chunks(num_taps, cutoff_mhz).astype(np.float32)
    hi = gc.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (gc - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    return np.ascontiguousarray(np.concatenate([hi, lo], axis=1))


@lru_cache(maxsize=None)
def _g_chunks_pair(num_taps: int, cutoff_mhz: float = 1.0,
                   hilo: bool = False) -> np.ndarray:
    """(N_CHUNKS, 80|160, chunk_pairs*80) PAIR-STACKED im2col weights.

    The im2col copies are the bf16 modes' Mosaic-roll cost (65 unaligned
    slices per tile). Like the polyx inner, stacking the frames with a
    1-column-left-shifted copy ([f; f<<1], 80 rows) lets ONE slice at
    offset 2j deliver shifts 2j AND 2j+1: 35 copies replace 65 at +8%
    matmul FLOPs (the shift axis pads 65 -> 70). MEASURED A WASH on
    v5e (round 5, bench config: im2colp-t2048 1057 Msps vs im2col-t2048
    1062; t3072 1047, t1024 1003) — unlike the f32 poly path, the
    (40, ycols) bf16 slice copies were never the im2col bound, so the
    extra MXU work cancels the saving; kept as an interpret-exact
    documented mode. Column layout:
    X[j*80 + i, k] = F[i, k + base + 2j] for i < 40 (shift 2j) and
    F[i-40, k + base + 2j + 1] for i >= 40 (shift 2j+1), with base =
    c * chunk_pairs * 2; weights are rearranged to match. hilo=True
    stacks the exact bf16 hi/lo weight pair on the output-row axis
    (rows [hi; lo], same trick as _g_chunks_hilo).
    """
    g = _g_stack(num_taps, cutoff_mhz)   # (width, 80, 40)
    width = g.shape[0]
    pairs_total = -(-width // 2)
    chunk_p = -(-pairs_total // N_CHUNKS)            # pairs per chunk
    gp = np.zeros((N_CHUNKS * chunk_p * 2, 2 * M, 2 * D), g.dtype)
    gp[:width] = g
    # gc[c][o, j*80 + q*40 + i] = gp[(c*chunk_p + j)*2 + q][o, i]
    gc = gp.reshape(N_CHUNKS, chunk_p * 2, 2 * M, 2 * D)
    gc = np.transpose(gc, (0, 2, 1, 3)).reshape(
        N_CHUNKS, 2 * M, chunk_p * 2 * 2 * D)
    gc = np.ascontiguousarray(gc).astype(np.float32)
    if not hilo:
        return gc
    import ml_dtypes

    hi = gc.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (gc - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    return np.ascontiguousarray(np.concatenate([hi, lo], axis=1))


@lru_cache(maxsize=None)
def _g_chunks_x2(num_taps: int, cutoff_mhz: float = 1.0) -> np.ndarray:
    """(N_CHUNKS, 160, chunk*80) weights for the "f32x2" parity mode.

    Both operands of the filterbank matmul are split into exact bf16
    hi/lo pairs, and the stacked weight matrix computes all FOUR cross
    terms in ONE MXU matmul per chunk:

        y = (Ghi + Glo) @ (xhi + xlo)
          = yc[:80] + yc[80:]   with   yc = W2 @ X2

    where X2 interleaves [xhi(40); xlo(40)] per im2col shift j (so the
    contraction runs chunk*80 = 1040 deep) and W2 duplicates each weight
    column across the hi/lo operand rows:

        W2[0:80,   j*80+0:40] = W2[0:80,   j*80+40:80] = Ghi[:, j*40:+40]
        W2[80:160, j*80+0:40] = W2[80:160, j*80+40:80] = Glo[:, j*40:+40]

    Numerics: Ghi+Glo carries 16 weight mantissa bits (the validated
    bf16x2w pair, ~-96 dB response) and xhi+xlo carries 16 input
    mantissa bits — EXACT for int8/int16 SDR wire formats, ~2^-17
    noise-like residual for f32 captures. Each bf16*bf16 product is
    exact in the f32 accumulator (8x8 mantissa bits), so the only error
    vs true f32 is the two 2^-17-class split residuals — ~256x tighter
    than the shipped bf16x2w mode's single-bf16 operands, with the same
    all-MXU cost structure (2x the matmul FLOPs, none of the poly
    inner's ~65 Mosaic rolls per tile).
    """
    import ml_dtypes

    gc = _g_chunks(num_taps, cutoff_mhz).astype(np.float32)
    hi = gc.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (gc - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    n, rows, cols = gc.shape
    chunk = cols // (2 * D)

    def dup(a):
        a4 = a.reshape(n, rows, chunk, 1, 2 * D)
        a4 = np.broadcast_to(a4, (n, rows, chunk, 2, 2 * D))
        return a4.reshape(n, rows, chunk * 4 * D)

    return np.ascontiguousarray(
        np.concatenate([dup(hi), dup(lo)], axis=1))


@lru_cache(maxsize=None)
def _poly_tables(num_taps: int, cutoff_mhz: float = 1.0):
    """Static tables for the TRUE-polyphase inner ("poly"): the folded
    dense conv (109 GFLOP/131k block at K=2600) inflates the arithmetic
    ~18x over the actual polyphase work — each branch p convolves ONE
    decimated column with its own taps_per=L/M taps (VPU shifted FMAs,
    ~3 GFLOP total), and only the tiny M-point DFT touches the MXU.
    Exact f32 throughout: no bf16 weight/operand ladder needed.

    Returns (perm, kcoef, wdft):
      perm  (80,)  frame-row gather building f_perm = f_t[perm], rows
                   [even-parity I(20) | even Q(20) | odd I(20) | odd Q(20)]
                   (branch p's taps sit at shifts s = base(p)-2r, all of
                   one parity; grouping halves the shifted-FMA work)
      kcoef (80, width) per-row tap value at shift s (zeros elsewhere)
      wdft  (80, 80) DFT + row-permutation matmul: [y_i; y_q] = W @ u
    """
    # the parity split below needs width = num_taps/D + 1 odd, i.e. the
    # taps to distribute evenly over the M branches (an uneven count
    # would put "even" rows on odd shifts and the kernel's grouped FMA
    # loops would silently produce a zero filterbank)
    assert num_taps % (2 * D) == 0, \
        f"poly inner needs num_taps % {2 * D} == 0, got {num_taps}"
    kern, row_of_p = _poly_kernel(num_taps, cutoff_mhz)
    width = kern.shape[2]
    cols = branch_columns()
    # base(p) parity: p=0 -> width-1 (even), p in 1..D -> width-2 (odd),
    # p in D+1.. -> width-3 (even); width = num_taps/D + 1 is odd.
    even_p = [0] + list(range(D + 1, M))
    odd_p = list(range(1, D + 1))
    perm = np.array(
        [cols[p] for p in even_p] + [D + cols[p] for p in even_p]
        + [cols[p] for p in odd_p] + [D + cols[p] for p in odd_p],
        np.int32)
    kcoef = np.zeros((2 * M, width), np.float32)
    half = len(even_p)                                    # 20
    for g, p in enumerate(even_p):
        kcoef[g] = kcoef[half + g] = kern[row_of_p[p], 0]
    for g, p in enumerate(odd_p):
        kcoef[2 * half + g] = kcoef[3 * half + g] = kern[row_of_p[p], 0]
    # u row index of branch p's I / Q streams in the kernel's layout
    ri = np.zeros(M, np.int64)
    rq = np.zeros(M, np.int64)
    for g, p in enumerate(even_p):
        ri[p], rq[p] = g, half + g
    for g, p in enumerate(odd_p):
        ri[p], rq[p] = 2 * half + g, 3 * half + g
    er, ei = _dft_matrix()
    er64, ei64 = er.astype(np.float64), ei.astype(np.float64)
    wdft = np.zeros((2 * M, 2 * M), np.float64)
    rows = np.arange(M)[:, None]
    wdft[rows, ri[None, :]] = er64                        # y_i <- Er u_i
    wdft[rows, rq[None, :]] = -ei64                       # y_i <- -Ei u_q
    wdft[M + rows, ri[None, :]] = ei64                    # y_q <- Ei u_i
    wdft[M + rows, rq[None, :]] = er64                    # y_q <- Er u_q
    return perm, kcoef, wdft.astype(np.float32)


# pre-shifted frame copies stacked per slice ("polyx"). 4 halves the
# slice count again over 2 but quadruples the chain/scratch rows — every
# VMEM-feasible tile OOMs the 16 MB scoped limit at stack 4 (round-5
# sweep: t2560 needs 17.9M, t3072 21.2M), while stack 2 matches the poly
# inner's footprint exactly (same 80 scratch rows, same chain bytes at
# half the group length) and keeps most of the measured roll win
# (tools/dev_rollscale.py: 65x(40,.) 1.297 -> 33x(80,.) 1.191 ->
# 17x(160,.) 1.166 ms/block).
POLYX_STACK = 2


@lru_cache(maxsize=None)
def _polyx_tables(num_taps: int, stack: int = POLYX_STACK,
                  cutoff_mhz: float = 1.0):
    """Static tables for the STACKED true-polyphase inner ("polyx").

    The plain poly inner pays one unaligned lane slice (one Mosaic roll)
    per tap shift — 65 per tile — and PERF.md pins those rolls, not
    FLOPs, as the exact-f32 mode's floor. polyx builds ``stack``
    pre-shifted copies of the permuted frame rows HOST-side (row group g
    holds parity-(g%2) rows left-shifted by g columns), so ONE slice at
    offset stack*j covers tap shifts stack*j .. stack*j+stack-1 across
    its 40-row groups: 33 slices replace 65 at stack 2. Measured on v5e
    (tools/dev_rollscale.py, same FMA work): 65x(40,·) slices 1.297
    ms/block vs 33x(80,·) 1.191 vs 17x(160,·) 1.166 — roll cost scales
    mostly with rows, but the saved per-op overhead is real. The parity
    fold also disappears: the DFT contracts the stacked accumulator
    directly (w4x = [We|Wo|...]).

    Returns (perm, kcoefx, w4x, n_slices):
      perm    (80,)   frame-row gather (same as _poly_tables)
      kcoefx  (stack*40, n_slices) tap value of row r's branch at shift
                      stack*j + (r//40), zero where that shift >= width
      w4x     (80, stack*40) DFT matmul over the stacked accumulator
    """
    assert stack % 2 == 0, "stack must pair the even/odd parity groups"
    perm, kcoef, wdft = _poly_tables(num_taps, cutoff_mhz)
    width = kcoef.shape[1]
    n_slices = -(-width // stack)
    kcoefx = np.zeros((stack * 2 * D, n_slices), np.float32)
    for g in range(stack):
        block = kcoef[:2 * D] if g % 2 == 0 else kcoef[2 * D:]
        for j in range(n_slices):
            s = stack * j + g
            if s < width:
                kcoefx[g * 2 * D : (g + 1) * 2 * D, j] = block[:, s]
    we, wo = wdft[:, :2 * D], wdft[:, 2 * D:]
    w4x = np.concatenate([we if g % 2 == 0 else wo
                          for g in range(stack)], axis=1)
    return perm, kcoefx, np.ascontiguousarray(w4x), n_slices


def _aa_w4(tsign):
    """Block-diagonal AA weights for _demod_tail's MXU correlation.

    (n_grp, M, AA_GRP*M) with w4[g, ch, r*M + ch'] = delta(ch, ch') *
    tsign[ch, g*AA_GRP + AA_GRP-1-r]: row r of the g-th strided roll
    holds the lattice shifted by sps*(g*AA_GRP + AA_GRP-1-r), so the
    matmul reduces exactly the 32 masked-sign taps per channel. Built
    in plain XLA (tiny, (4, 40, 320) f32) because tsign is runtime data
    (per-channel AA re-keying under hop following).
    """
    n_grp = AA_BITS // AA_GRP
    # t2[g, r, ch] = tsign[ch, g*AA_GRP + AA_GRP-1-r]
    t2 = jnp.swapaxes(tsign, 0, 1).reshape(n_grp, AA_GRP, M)[:, ::-1, :]
    eye = jnp.eye(M, dtype=jnp.float32)
    w4 = t2[:, :, :, None] * eye[None, None]        # [g, r, ch, ch']
    return jnp.swapaxes(w4, 1, 2).reshape(n_grp, M, AA_GRP * M)


def _ycols(tile: int, sps: int, lag: int) -> int:
    """y columns needed per tile: the AA correlation span plus demod lag,
    or the RSSI window (32*sps), whichever reaches further."""
    return tile + max((AA_BITS - 1) * sps + lag, AA_BITS * sps - 1)


def _fcols(tile: int, width: int, sps: int, lag: int,
           pair: bool = False) -> int:
    """Frame columns DMA'd per tile, rounded up to the 128-lane tiling
    (Mosaic requires DMA slice shapes aligned to the lane tile). Covers
    the im2col chunk padding (shifts up to N_CHUNKS*chunk - 1; the
    pair-stacked inner pads the shift axis to 2*N_CHUNKS*chunk_pairs)."""
    if pair:
        width_pad = 2 * N_CHUNKS * (-(-(-(-width // 2)) // N_CHUNKS))
    else:
        width_pad = N_CHUNKS * (-(-width // N_CHUNKS))
    need = _ycols(tile, sps, lag) + width_pad - 1
    return -(-need // 128) * 128


def _kernel(f_hbm, g_ref, w4_ref, ts_ref, nmask_ref, bits_ref, hit_ref,
            mag_ref, fbuf, xbuf, sem, *, tile: int, width: int, sps: int,
            lag: int, inner: str, fb_rows: int = 2 * D,
            shift_step: int = 1, dev_skip: str = ""):
    T = tile
    ycols = _ycols(T, sps, lag)
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(i * T, _fcols(T, width, sps, lag,
                                        pair=shift_step == 2))], fbuf, sem)
    cp.start()
    cp.wait()

    # filterbank + DFT on the MXU. Precision: for bf16 weights DEFAULT
    # is already the exact bf16-multiply / f32-accumulate pass —
    # HIGHEST adds nothing for bf16 inputs (and crashes the TPU
    # compiler on this kernel). HIGHEST only matters for f32 operands
    # (multi-pass vs 1 silent bf16 pass). hilo implies bf16 weights.
    prec = (jax.lax.Precision.DEFAULT if g_ref.dtype == jnp.bfloat16
            else _FILTER_PRECISION)
    if inner == "im2col":
        # chunked im2col: contract (2M, chunk*40) x (chunk*40, ycols) —
        # ~4x better MXU utilization than per-shift 40-deep dots.
        # hilo mode: g_ref rows are a stacked bf16 hi/lo weight pair
        # ([hi; lo], 160 rows) sharing one operand — each chunk is ONE
        # matmul whose row halves sum to the exact-ish f32 weights.
        # f32x2 (fb_rows == 4*D): the frame buffer rows are themselves a
        # stacked [xhi(40); xlo(40)] operand pair and g_ref duplicates
        # each weight column across them (_g_chunks_x2) — each per-shift
        # copy moves all 80 rows at once, so the copy COUNT (the Mosaic
        # roll cost, which is width-independent) matches the plain bf16
        # path while the matmul computes all four hi/lo cross terms.
        hilo = g_ref.shape[1] == 4 * M
        chunk = g_ref.shape[2] // fb_rows
        y = jnp.zeros((2 * M, ycols), jnp.float32)
        for c in range(N_CHUNKS):
            if "col" not in dev_skip:   # dev-only stage timing knob
                for j in range(chunk):
                    s = (c * chunk + j) * shift_step
                    xbuf[j * fb_rows : (j + 1) * fb_rows, :] = \
                        fbuf[:, s : s + ycols]
            if "mm" in dev_skip:        # dev-only stage timing knob
                y = y + xbuf[: 2 * M, :ycols].astype(jnp.float32)
                continue
            yc = jax.lax.dot_general(
                g_ref[c], xbuf[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            y = y + (yc[: 2 * M] + yc[2 * M :] if hilo else yc)
    else:
        # per-shift accumulating dots (simplest correct form)
        F = fbuf[:, : ycols + width - 1]
        y = jnp.zeros((2 * M, ycols), jnp.float32)
        for s in range(width):
            y = y + jax.lax.dot_general(
                g_ref[s], F[:, s : s + ycols],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
    _demod_tail(y[:M], y[M:], w4_ref, ts_ref, nmask_ref, bits_ref, hit_ref,
                mag_ref, tile=T, sps=sps, lag=lag, dev_skip=dev_skip)


# Shifts manufactured per strided roll in the AA correlation. Measured
# on v5e at the production config (bf16x2w, tile 2048): GRP=4 2.18,
# GRP=8 2.28, GRP=16 2.28 ms/block — BUT GRP=4 decodes ZERO packets on
# hardware while interpret mode is correct. ROOT CAUSE (round-5
# bisection, tools/dev_aagrp_bisect.py): pltpu.roll(stride=SPS,
# stride_axis=0) over a (4, 40, nbp) broadcast mis-shifts rows on the
# chip WHEN ITS OPERAND IS AN IN-KERNEL COMPUTED VALUE (the where/
# concatenate-produced lattice) — acc comes back with dense even-integer
# errors up to +-34 (~88% of positions), so the acc == 32 hit test never
# fires. The same op is EXACT when the lattice is loaded from a kernel
# input ref (tools/dev_aagrp_repro.py), and a VMEM-scratch store/reload
# does NOT restore correctness (Mosaic fuses the producer into the roll
# either way) — the bug class is producer-fusion x stack-height-4, not
# memory residency. Stack heights 8 and 16 are exact in every context.
# fused_frontend REJECTS GRP=4 at construction on hardware backends;
# the knob matrix regression-tracks the pin (KNOBMATRIX.json).
AA_GRP = 8


def _demod_tail(y_i, y_q, w4_ref, ts_ref, nmask_ref, bits_ref, hit_ref,
                mag_ref, *, tile: int, sps: int, lag: int,
                dev_skip: str = ""):
    """Stages 3-6 shared by every filterbank inner: phase-diff decisions,
    AA correlation, RSSI window sums, lattice writes."""
    T = tile
    # phase-difference decisions over T + 31*sps positions
    nb = T + (AA_BITS - 1) * sps
    d = y_i[:, :nb] * y_q[:, lag : nb + lag] - y_i[:, lag : nb + lag] * y_q[:, :nb]
    if lag % 2:
        # (-1)^(m lag) demod correction for odd lag: odd bins flip
        odd = (jax.lax.broadcasted_iota(jnp.int32, (M, nb), 0) % 2) == 1
        bits = jnp.where(odd, d < 0, d > 0)
    else:
        bits = d > 0
    bits_ref[:] = bits[:, :T].astype(jnp.int8)

    # Per-channel AA correlation. The naive form is 32 shifted FMAs of
    # the +-1 lattice — 32 unaligned lane slices = 32 Mosaic rolls
    # (~0.35 us each, width-independent), which made this stage nearly
    # as expensive as the filterbank. Instead each strided
    # tpu.dynamic_rotate manufactures AA_GRP shifts at once (row r of
    # the rolled broadcast holds the lattice left-shifted by
    # sps*(g0 + AA_GRP-1-r)) and the per-channel weighted reduce is ONE
    # block-diagonal (M, AA_GRP*M) MXU matmul per group (w4_ref, built
    # by _aa_w4 outside the kernel): 4 rolls + 4 small matmuls replace
    # 32 rolls + FMAs (stage 0.47 -> 0.25 ms/block in-kernel A/B). Exact:
    # operands are +-1/0 (bf16-representable) with f32 accumulation, so
    # the acc == n_mask hit test is unchanged.
    if "aafma" in dev_skip:         # dev-only A/B knob: 32-FMA AA form
        s_lat = jnp.where(bits, 1.0, -1.0)
        acc = jnp.zeros((M, T), jnp.float32)
        for j in range(AA_BITS):
            acc = acc + s_lat[:, j * sps : j * sps + T] * ts_ref[:, j : j + 1]
        hit_ref[:] = (acc == nmask_ref[0, 0]).astype(jnp.int8)
    elif "aa" in dev_skip:          # dev-only stage timing knob
        hit_ref[:] = bits[:, :T].astype(jnp.int8)
    else:
        s_lat = jnp.where(bits, 1.0, -1.0)              # (M, nb)
        # tpu.dynamic_rotate rejects unaligned lane shapes: pad nb up to
        # the 128 tile. The pad columns are never read into x[:, :T] —
        # the largest shift sps*(AA_BITS-1) reads up to column
        # T-1 + sps*(AA_BITS-1) = nb-1, the last REAL column.
        nbp = -(-nb // 128) * 128
        if nbp != nb:
            s_lat = jnp.concatenate(
                [s_lat, jnp.zeros((M, nbp - nb), jnp.float32)], axis=1)
        acc = jnp.zeros((M, T), jnp.float32)
        for g in range(AA_BITS // AA_GRP):
            g0 = AA_GRP * g
            xb = jnp.broadcast_to(s_lat[None], (AA_GRP, M, nbp))
            x = pltpu.roll(xb, nbp - sps * (g0 + AA_GRP - 1), 2,
                           stride=sps, stride_axis=0).reshape(AA_GRP * M, nbp)
            acc = acc + jax.lax.dot_general(
                w4_ref[g], x[:, :T],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        hit_ref[:] = (acc == nmask_ref[0, 0]).astype(jnp.int8)

    # RSSI: mean(|I|+|Q|) over the 32-symbol AA window (btle_rx.c:2234-2252)
    if "mag" in dev_skip:           # dev-only stage timing knob
        mag_ref[:] = y_i[:, :T]
    else:
        win = AA_BITS * sps
        w = jnp.abs(y_i) + jnp.abs(y_q)             # (40, ycols)
        span = 1
        while span < win:
            w = w[:, : w.shape[1] - span] + w[:, span:]
            span *= 2
        mag_ref[:] = w[:, :T] * (1.0 / win)


def _kernel_poly(f_hbm, kc_ref, w_ref, w4_ref, ts_ref, nmask_ref, bits_ref,
                 hit_ref, mag_ref, fbuf, ue_ref, uo_ref, sem, *, tile: int,
                 width: int, sps: int, lag: int, roll_shifts: bool = False,
                 dev_skip: str = ""):
    """True-polyphase inner: per-branch taps as VPU shifted FMAs over the
    permuted frame rows (f_perm = f_t[perm], see _poly_tables), then ONE
    (80, 80) DFT matmul. All arithmetic is f32 — the MXU only ever sees
    the tiny DFT contraction, so no precision ladder applies."""
    T = tile
    ycols = _ycols(T, sps, lag)
    fcols = _fcols(T, width, sps, lag)
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(i * T, fcols)], fbuf, sem)
    cp.start()
    cp.wait()

    # Branch-conv accumulation, grouped: a pure value chain keeps all
    # ~65 shifted (40, ycols) temporaries live on the Mosaic stack at
    # once (>16 MB scoped-vmem at big tiles); a ref store per shift
    # forces a VMEM round trip per tap (measured 4.2 ms/block). Groups
    # of _POLY_GROUP shifts chain in registers, then one store.
    half = 2 * D                                   # 40 rows per parity group
    f = fbuf[:]
    # dev-only A/B knob: "pgN" in dev_skip overrides the register-chain
    # group size (e.g. dev_skip="pg12")
    group = _POLY_GROUP
    if "pg" in dev_skip:
        group = int(dev_skip.split("pg")[1].split(",")[0])

    def accumulate(out_ref, rows, shifts):
        first = True
        for g0 in range(0, len(shifts), group):
            acc = None
            for s in shifts[g0 : g0 + group]:
                t = f[rows, s : s + ycols] * kc_ref[rows, s : s + 1]
                acc = t if acc is None else acc + t
            out_ref[:] = acc if first else out_ref[:] + acc
            first = False

    def accumulate_roll(out_ref, rows, shifts):
        # Each unaligned lane slice above lowers to one Mosaic roll
        # (~0.35 us per (40, ycols) regardless of width) — the measured
        # bound of the whole poly inner. One strided roll over a
        # broadcast manufactures _POLY_GROUP shifted copies per op
        # instead (the _demod_tail AA trick): row r of the rolled
        # (G, 40, fcols) value holds f[rows] left-shifted by
        # s0 + step*(G-1-r); the weighted reduce per row is the same
        # VPU mul/add chain. ~9 rolls replace ~65. f32 only —
        # pltpu.roll is unimplemented for packed bf16 (and fcols is
        # 128-lane aligned by construction, as the roll requires).
        step = shifts[1] - shifts[0] if len(shifts) > 1 else 1
        first = True
        for g0 in range(0, len(shifts), _POLY_GROUP):
            grp = shifts[g0 : g0 + _POLY_GROUP]
            n = len(grp)
            if n == 1:
                acc = f[rows, grp[0] : grp[0] + ycols] \
                    * kc_ref[rows, grp[0] : grp[0] + 1]
            else:
                xb = jnp.broadcast_to(f[rows][None], (n, half, fcols))
                x = pltpu.roll(xb, fcols - (grp[0] + step * (n - 1)), 2,
                               stride=step, stride_axis=0)
                acc = None
                for r in reversed(range(n)):     # ascending shift order:
                    s = grp[0] + step * (n - 1 - r)   # same f32 rounding
                    t = x[r, :, :ycols] * kc_ref[rows, s : s + 1]
                    acc = t if acc is None else acc + t
            out_ref[:] = acc if first else out_ref[:] + acc
            first = False

    acc_fn = accumulate_roll if roll_shifts else accumulate
    acc_fn(ue_ref, slice(None, half), list(range(0, width, 2)))
    acc_fn(uo_ref, slice(half, None), list(range(1, width, 2)))

    # DFT as two half-contractions (Mosaic cannot concatenate the two
    # accumulators: their lazy lane offsets differ by the shift parity)
    dn = (((1,), (0,)), ((), ()))
    y = (jax.lax.dot_general(w_ref[:, :half], ue_ref[:],
                             dimension_numbers=dn,
                             preferred_element_type=jnp.float32,
                             precision=_FILTER_PRECISION)
         + jax.lax.dot_general(w_ref[:, half:], uo_ref[:],
                               dimension_numbers=dn,
                               preferred_element_type=jnp.float32,
                               precision=_FILTER_PRECISION))
    _demod_tail(y[:M], y[M:], w4_ref, ts_ref, nmask_ref, bits_ref, hit_ref,
                mag_ref, tile=T, sps=sps, lag=lag, dev_skip=dev_skip)


def _kernel_polyx(f_hbm, kc_ref, w_ref, w4_ref, ts_ref, nmask_ref, bits_ref,
                  hit_ref, mag_ref, fbuf, acc_ref, sem, *, tile: int,
                  n_slices: int, stack: int, sps: int, lag: int, fcols: int,
                  dev_skip: str = ""):
    """Stacked true-polyphase inner (see _polyx_tables): 33 double-height
    slices instead of 65 at stack 2, one (80, stack*40) DFT matmul, no
    parity fold. Exact f32 throughout like the poly inner."""
    T = tile
    ycols = _ycols(T, sps, lag)
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(f_hbm.at[:, pl.ds(i * T, fcols)], fbuf, sem)
    cp.start()
    cp.wait()

    f = fbuf[:]
    # slices chained in registers per acc store: a slice is stack x the
    # poly inner's 40 rows, so divide the group by stack to keep the
    # Mosaic stack at the poly inner's proven liveness (group 8 chains
    # of (80, ycols) measured 18.95M scoped VMEM at tile 3072 — OOM).
    # Round-5 sweep at t3072 confirms 4 optimal: pg3 -> 808, pg4 -> 809,
    # pg5 -> 805, pg6 -> 799 Msps, pg8 exceeds scoped VMEM.
    group = max(1, _POLY_GROUP // stack)
    if "pg" in dev_skip:
        group = int(dev_skip.split("pg")[1].split(",")[0])
    first = True
    for g0 in range(0, n_slices, group):
        acc = None
        for j in range(g0, min(g0 + group, n_slices)):
            s = stack * j
            t = f[:, s : s + ycols] * kc_ref[:, j : j + 1]
            acc = t if acc is None else acc + t
        acc_ref[:] = acc if first else acc_ref[:] + acc
        first = False

    y = jax.lax.dot_general(
        w_ref[:], acc_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_FILTER_PRECISION)
    _demod_tail(y[:M], y[M:], w4_ref, ts_ref, nmask_ref, bits_ref, hit_ref,
                mag_ref, tile=T, sps=sps, lag=lag, dev_skip=dev_skip)


def _default_inner(compute_dtype: str) -> str:
    """Measured-fastest inner per mode: the bf16 modes (incl. the f32x2
    dual hi/lo split) keep the im2col MXU form (the hi/lo weight pair
    needs matmuls); exact f32 is fastest as the STACKED true-polyphase
    VPU form (round-5 "polyx": 33 double-height slices instead of the
    poly inner's 65 rolls — 806 vs 794 Msps on v5e; the folded dense
    conv's 18x FLOP inflation keeps im2col-f32 far behind at 519)."""
    return ("im2col" if compute_dtype in ("bf16", "bf16x2w", "f32x2")
            else "polyx")


def _default_tile(compute_dtype: str, inner: str) -> int:
    """Largest measured-fastest time tile that fits scoped VMEM (16 MB)
    per mode: bf16 operand storage halves the frame scratch, so the bf16
    modes take a 2048-frame tile (1003 vs 911 Msps at 1024 on v5e; 4096
    regresses); the poly inner's grouped register chains fit tiles up to
    3840 at f32 — the ~65 rolls per tile are the bound, so fewer/larger
    tiles win until the VMEM cliff (round-4 sweep at the bench config:
    3072 -> 776, 3328 -> 785, 3584 -> 794, 3840 -> 788 Msps; 4096
    exceeds the scoped limit) — default 3584; polyroll only fits 1024
    (its rolled broadcasts stay live — a wash vs poly, kept as a
    measured negative); f32 im2col must stay at 1024 (its 520-row f32
    im2col scratch plus the unrolled value chains exceed the scoped
    limit)."""
    if compute_dtype == "f32" and inner == "im2col":
        return 1024
    if inner == "polyx":
        # round-5 hardware sweep at the bench config (131k blocks, 16
        # cand slots, 192-dispatch folds): 3072 -> 806 Msps, 3328 ->
        # 803; 3456+ exceeds the 16 MB scoped-VMEM limit (17.8M at
        # 3584 even with shorter register chains). 806 = 1.01x the
        # 800 Msps target — the parity mode's first >=1.0x form.
        return 3072
    if compute_dtype == "f32x2":
        # round-5 hardware sweep (131k bench config, 192-dispatch
        # folds): 1024 -> 701, 1536 -> 716, 2048 -> 733, 2560 -> 740
        # Msps — a measured NEGATIVE vs the poly inner's 794 (the
        # doubled im2col copy rows + 2x matmul FLOPs outweigh the
        # avoided VPU rolls); the mode stays as the documented
        # all-MXU hi/lo-split form and for >=16-bit-exact operand use.
        return 2560
    if inner == "polyroll":
        return 1024
    if inner == "poly":
        return 3584
    return 2048


@partial(jax.jit, static_argnames=("num_taps", "has_context", "sps", "lag",
                                   "tile", "compute_dtype", "inner",
                                   "interpret", "dev_skip", "cutoff_mhz"))
def fused_frontend(i_wb, q_wb, aa_rows, aa_mask, num_taps: int = DEFAULT_TAPS,
                   has_context: bool = False, sps: int = 4, lag: int = 4,
                   tile: int | None = None, compute_dtype: str = "f32",
                   inner: str | None = None, interpret: bool = False,
                   dev_skip: str = "", cutoff_mhz: float = 1.0):
    """80 Msps wideband IQ -> per-channel (bits, hit, mag) lattices.

    Drop-in for channelize + scan_block per channel: returns
      bits (M, K-lag)          decision lattice (int8 0/1)
      hit  (M, K-lag-31*sps)   AA-match mask (bool)
      mag  (M, K-lag-31*sps)   RSSI window mean at each position (f32)
    with K the per-channel sample count channelize() would produce.
    aa_rows: (M, 32) per-channel AA bits (or (32,), broadcast).
    """
    win = AA_BITS * sps
    assert win & (win - 1) == 0, "RSSI doubling loop needs 32*sps power of 2"
    if AA_GRP == 4 and not interpret:
        # construction-time fence for the known hardware miscompile:
        # 4-high strided-roll stacks over computed operands mis-shift on
        # the chip (see the AA_GRP note above + tools/dev_aagrp_bisect.py
        # for the minimized repro). Interpret mode stays allowed (it is
        # correct, and the dev tools A/B against it).
        raise ValueError(
            "AA_GRP=4 miscompiles on TPU hardware (strided-roll "
            "producer-fusion bug; minimized repro in "
            "tools/dev_aagrp_bisect.py) — use 8 or 16")
    if inner is None:
        inner = _default_inner(compute_dtype)
    if tile is None:
        tile = _default_tile(compute_dtype, inner)
    hilo = compute_dtype == "bf16x2w"
    x2 = compute_dtype == "f32x2"
    assert not (hilo and inner not in ("im2col", "im2colp")), \
        "bf16x2w needs an im2col inner"
    assert not (x2 and inner != "im2col"), "f32x2 needs the im2col inner"
    cdtype = (jnp.bfloat16 if compute_dtype in ("bf16", "bf16x2w", "f32x2")
              else jnp.float32)
    g = _g_stack(num_taps, cutoff_mhz)
    width = g.shape[0]

    # frame prep — identical to channelizer.channelize()
    L = num_taps
    x = jnp.stack([i_wb.astype(jnp.float32), q_wb.astype(jnp.float32)])
    left = L if not has_context else 1
    n_all = left + x.shape[1]
    right = (-n_all) % D
    x = jnp.pad(x, ((0, 0), (left, right)))
    j_frames = x.shape[1] // D
    k_out = j_frames - (width - 1)                  # == channelize K
    frames = x.reshape(2, j_frames, D)
    f_t = jnp.swapaxes(frames, 1, 2).reshape(2 * D, j_frames)  # (40, J)

    T = tile
    assert T % 128 == 0, "tile must be lane-aligned (DMA offsets i*T)"
    n_tiles = -(-k_out // T)
    j_pad = (n_tiles - 1) * T + _fcols(T, width, sps, lag)
    f_t = jnp.pad(f_t, ((0, 0), (0, j_pad - j_frames)))
    if x2:
        # exact bf16 hi/lo operand split, stacked on the row axis: rows
        # 0..39 = bf16(f), rows 40..79 = bf16(f - hi). Built in XLA
        # (cheap elementwise) so the kernel DMAs the pair directly.
        f_hi = f_t.astype(jnp.bfloat16)
        f_lo = (f_t - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        f_t = jnp.concatenate([f_hi, f_lo], axis=0)      # (80, j_pad)
    elif cdtype == jnp.bfloat16:
        f_t = f_t.astype(cdtype)

    if aa_rows.ndim == 1:
        aa_rows = jnp.broadcast_to(aa_rows, (M, AA_BITS))
    tsign = ((aa_rows.astype(jnp.float32) * 2 - 1)
             * aa_mask.astype(jnp.float32)[None, :])          # (40, 32)
    w4 = _aa_w4(tsign)
    n_mask = jnp.sum(aa_mask.astype(jnp.float32)).reshape(1, 1)

    # per-inner kernel, weight operands, weight specs and scratch; the
    # frames operand / output plumbing / lattice trim are shared below
    fcols = _fcols(T, width, sps, lag)
    vm = pltpu.VMEM
    if inner == "polyx":
        assert compute_dtype == "f32", "polyx inner is the exact-f32 form"
        stack = POLYX_STACK
        if "px" in dev_skip:       # dev-only A/B knob: stack override
            stack = int(dev_skip.split("px")[1].split(",")[0])
        perm, kcoefx, w4x, n_slices = _polyx_tables(num_taps, stack,
                                                     cutoff_mhz)
        fp = f_t[jnp.asarray(perm)]                           # (80, j_pad)
        fp = jnp.pad(fp, ((0, 0), (0, stack - 1)))
        half = 2 * D
        f4 = jnp.concatenate(
            [fp[(0 if g % 2 == 0 else half):(half if g % 2 == 0 else 2 * half),
                g : g + j_pad] for g in range(stack)], axis=0)
        frames = f4                                           # (stack*40, j_pad)
        kern = partial(_kernel_polyx, tile=T, n_slices=n_slices, stack=stack,
                       sps=sps, lag=lag, fcols=fcols, dev_skip=dev_skip)
        weights = (jnp.asarray(kcoefx), jnp.asarray(w4x))
        w_specs = [
            pl.BlockSpec(kcoefx.shape, lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(w4x.shape, lambda i: (0, 0), memory_space=vm),
        ]
        scratch = [
            vm((stack * 2 * D, fcols), jnp.float32),
            vm((stack * 2 * D, _ycols(T, sps, lag)), jnp.float32),
        ]
    elif inner in ("poly", "polyroll"):
        # "f32": everything exact. "bf16": operands only — the taps
        # stay EXACT f32 (the VPU never quantizes weights), so unlike
        # im2col-bf16 the filter response is exact; operand rounding is
        # noise-like (and exact for int8 SDR wire formats). bf16x2w has
        # no meaning here: there is no weight pair to split. "polyroll"
        # manufactures the branch-conv shifts with strided rolls
        # (f32-only: pltpu.roll is unimplemented for packed bf16).
        assert compute_dtype in ("f32", "bf16"), \
            "poly inner: f32 or bf16 (operand-only) — weights are exact"
        assert not (inner == "polyroll" and compute_dtype != "f32"), \
            "polyroll inner is f32-only (no packed-bf16 rolls)"
        perm, kcoef, wdft = _poly_tables(num_taps, cutoff_mhz)
        frames = f_t[jnp.asarray(perm)]                       # (80, j_pad)
        kern = partial(_kernel_poly, tile=T, width=width, sps=sps, lag=lag,
                       roll_shifts=inner == "polyroll", dev_skip=dev_skip)
        weights = (jnp.asarray(kcoef), jnp.asarray(wdft))
        w_specs = [
            pl.BlockSpec((2 * M, kcoef.shape[1]), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((2 * M, 2 * M), lambda i: (0, 0), memory_space=vm),
        ]
        scratch = [
            vm((2 * 2 * D, fcols), cdtype),
            vm((2 * D, _ycols(T, sps, lag)), jnp.float32),
            vm((2 * D, _ycols(T, sps, lag)), jnp.float32),
        ]
    else:
        pair = inner == "im2colp"
        if pair:
            # pair-stacked frames [f; f<<1]: one im2col copy per TWO
            # shifts (the polyx trick on the MXU path); fcols covers the
            # padded 70-shift axis
            fcols = _fcols(T, width, sps, lag, pair=True)
            j_pad2 = (n_tiles - 1) * T + fcols
            fpad = jnp.pad(f_t, ((0, 0), (0, max(0, j_pad2 + 1 - f_t.shape[1]))))
            frames = jnp.concatenate([fpad[:, :j_pad2],
                                      fpad[:, 1 : j_pad2 + 1]], axis=0)
            fb_rows = 4 * D
        else:
            frames = f_t
            fb_rows = 4 * D if x2 else 2 * D
        if inner in ("im2col", "im2colp"):
            gk = jnp.asarray(
                _g_chunks_pair(num_taps, cutoff_mhz, hilo=hilo) if pair
                else _g_chunks_x2(num_taps, cutoff_mhz) if x2
                else _g_chunks_hilo(num_taps, cutoff_mhz) if hilo
                else _g_chunks(num_taps, cutoff_mhz), cdtype)
            chunk = gk.shape[2] // fb_rows
            g_spec = pl.BlockSpec((gk.shape[0], gk.shape[1], chunk * fb_rows),
                                  lambda i: (0, 0, 0), memory_space=vm)
            x_scratch = vm((chunk * fb_rows, _ycols(T, sps, lag)), cdtype)
        else:  # "dots"
            gk = jnp.asarray(g, cdtype)
            g_spec = pl.BlockSpec((width, 2 * M, 2 * D),
                                  lambda i: (0, 0, 0), memory_space=vm)
            x_scratch = vm((8, 128), cdtype)  # unused placeholder
        kern = partial(_kernel, tile=T, width=width, sps=sps, lag=lag,
                       inner="im2col" if pair else inner, fb_rows=fb_rows,
                       shift_step=2 if pair else 1, dev_skip=dev_skip)
        weights = (gk,)
        w_specs = [g_spec]
        scratch = [vm((fb_rows, fcols), cdtype), x_scratch]

    bits, hit, mag = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            # frames stay in HBM (21-42 MB per 131k block; tiles are
            # DMA'd by the kernel)
            pl.BlockSpec(memory_space=pl.ANY
                         if interpret else pltpu.HBM),
            *w_specs,
            pl.BlockSpec(w4.shape, lambda i: (0, 0, 0), memory_space=vm),
            pl.BlockSpec((M, AA_BITS), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, T), lambda i: (0, i), memory_space=vm)
            for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, n_tiles * T), jnp.int8),
            jax.ShapeDtypeStruct((M, n_tiles * T), jnp.int8),
            jax.ShapeDtypeStruct((M, n_tiles * T), jnp.float32),
        ],
        scratch_shapes=[*scratch, pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(frames, *weights, w4, tsign, n_mask)

    n_bits = k_out - lag
    n_hit = n_bits - (AA_BITS - 1) * sps
    return (bits[:, :n_bits], hit[:, :n_hit].astype(bool), mag[:, :n_hit])


@partial(jax.jit, static_argnames=("sps", "lag", "max_candidates", "num_taps",
                                   "has_context", "tile", "compute_dtype",
                                   "inner", "decode", "interpret",
                                   "cutoff_mhz", "dev_skip"))
def wideband_scan_fused(i_wb, q_wb, aa_rows, aa_mask, whiten_rows, crc_inits,
                        adv_flags, sps: int = 4, lag: int = 4,
                        max_candidates: int = 8, num_taps: int = DEFAULT_TAPS,
                        has_context: bool = False, tile: int | None = None,
                        compute_dtype: str = "f32", inner: str | None = None,
                        decode: str = "pallas", interpret: bool = False,
                        cutoff_mhz: float = 1.0, dev_skip: str = ""):
    """Drop-in for sniffer.wideband_scan with the Pallas front end.

    Same per-channel candidate dict. decode="pallas" also runs the
    per-candidate dewhiten/CRC decode on-chip (rx.pallas_decode) — the
    XLA strided window gathers are the single most expensive stage of
    the whole pass (one DMA per candidate window); decode="xla" keeps
    the rx.pipeline path (used where Pallas is unavailable).
    """
    from ..rx.pipeline import decode_from_lattice, earliest_hits

    bits, hit, mag = fused_frontend(
        i_wb, q_wb, aa_rows, aa_mask, num_taps=num_taps,
        has_context=has_context, sps=sps, lag=lag, tile=tile,
        compute_dtype=compute_dtype, inner=inner, interpret=interpret,
        cutoff_mhz=cutoff_mhz, dev_skip=dev_skip)

    if decode == "pallas":
        from ..rx.pallas_decode import decode_candidates_pallas

        pos, valid, num_hits = jax.vmap(
            lambda h: earliest_hits(h, max_candidates, 0))(hit)
        pkt_bytes, plen, crc_match, len_ok = decode_candidates_pallas(
            bits, pos, whiten_rows, crc_inits, adv_flags, sps=sps,
            interpret=interpret)
        mag_mean = jnp.take_along_axis(
            mag, jnp.clip(pos, 0, mag.shape[1] - 1), axis=1)
        return {
            "pos": pos,
            "valid": valid,
            "payload_len": plen,
            "len_ok": len_ok,
            "crc_ok": crc_match & len_ok & valid,
            "pdu_bytes": pkt_bytes,
            "mag_mean": mag_mean,
            "num_hits": num_hits,
        }

    def one(h, b, mg, w, c, a):
        return decode_from_lattice(h, b, mg, w, c, a, sps=sps,
                                   max_candidates=max_candidates)

    return jax.vmap(one)(hit, bits, mag, whiten_rows, crc_inits, adv_flags)
