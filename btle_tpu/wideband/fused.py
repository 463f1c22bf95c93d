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
    1. DMA the (40, T+192) frame tile from HBM              [~0.4 us]
    2. filterbank: y[:, k] = sum_s G_s @ F[:, k+s]          [MXU]
       where G_s folds the polyphase taps AND the 40-point DFT
       (channelizer._fused_kernel), rows 0..39 = y_i, 40..79 = y_q
    3. phase-difference decisions d > 0                     [VPU]
    4. 32-tap per-channel access-address correlation        [VPU]
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

from .channelizer import D, DEFAULT_TAPS, M, _fused_kernel

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


@lru_cache(maxsize=None)
def _g_stack(num_taps: int) -> np.ndarray:
    """(65, 80, 40) filterbank+DFT weights: y[o, k] = sum_s G[s] @ F[:, k+s].

    From channelizer._fused_kernel's conv weights w[o, i, s] (OIW layout):
    G[s][o, i] = w[o, i, s]. Input rows i: 0..19 = I decimated streams,
    20..39 = Q; output rows o: 0..39 = y_i bins, 40..79 = y_q bins.
    """
    w = _fused_kernel(num_taps)          # (80, 40, width)
    return np.ascontiguousarray(np.transpose(w, (2, 0, 1)))


@lru_cache(maxsize=None)
def _g_chunks(num_taps: int) -> np.ndarray:
    """(N_CHUNKS, 80, chunk*40) im2col weights.

    Chunk c's matmul contracts over chunk*40 = 520 rows of the im2col
    buffer X[j*40+i, k] = F[i, k + c*chunk + j] — a 520-deep contraction
    keeps the MXU ~4x better utilized than the 40-deep per-shift dots
    (K pads to the 128 tile either way).
    """
    g = _g_stack(num_taps)               # (width, 80, 40)
    width = g.shape[0]
    chunk = -(-width // N_CHUNKS)
    gp = np.zeros((N_CHUNKS * chunk, 2 * M, 2 * D), g.dtype)
    gp[:width] = g
    # gc[c][o, j*40 + i] = g[c*chunk + j][o, i]
    gc = gp.reshape(N_CHUNKS, chunk, 2 * M, 2 * D)
    gc = np.transpose(gc, (0, 2, 1, 3)).reshape(N_CHUNKS, 2 * M, chunk * 2 * D)
    return np.ascontiguousarray(gc)


@lru_cache(maxsize=None)
def _g_chunks_hilo(num_taps: int) -> np.ndarray:
    """(2*N_CHUNKS, 80, chunk*40) bf16 hi/lo im2col weight pair.

    gc = hi + lo exactly, with both halves bf16-representable: two
    DEFAULT-precision MXU passes then evaluate the filterbank with
    ~f32-faithful WEIGHTS (~-96 dB response error) while operands stay
    bf16 (1 pass each). Chunk order: all hi chunks, then all lo chunks.
    """
    import ml_dtypes

    gc = _g_chunks(num_taps).astype(np.float32)
    hi = gc.astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (gc - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    return np.ascontiguousarray(np.concatenate([hi, lo], axis=0))


def _ycols(tile: int, sps: int, lag: int) -> int:
    """y columns needed per tile: the AA correlation span plus demod lag,
    or the RSSI window (32*sps), whichever reaches further."""
    return tile + max((AA_BITS - 1) * sps + lag, AA_BITS * sps - 1)


def _fcols(tile: int, width: int, sps: int, lag: int) -> int:
    """Frame columns DMA'd per tile, rounded up to the 128-lane tiling
    (Mosaic requires DMA slice shapes aligned to the lane tile). Covers
    the im2col chunk padding (shifts up to N_CHUNKS*chunk - 1)."""
    width_pad = N_CHUNKS * (-(-width // N_CHUNKS))
    need = _ycols(tile, sps, lag) + width_pad - 1
    return -(-need // 128) * 128


def _kernel(f_hbm, g_ref, tsign_ref, nmask_ref, bits_ref, hit_ref, mag_ref,
            fbuf, xbuf, sem, *, tile: int, width: int, sps: int,
            lag: int, inner: str, dev_skip: str = ""):
    T = tile
    ycols = _ycols(T, sps, lag)
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(i * T, _fcols(T, width, sps, lag))], fbuf, sem)
    cp.start()
    cp.wait()

    # filterbank + DFT on the MXU
    if inner == "im2col":
        # chunked im2col: contract (2M, chunk*40) x (chunk*40, ycols) —
        # ~4x better MXU utilization than per-shift 40-deep dots.
        # hilo mode: g_ref holds a bf16 hi/lo weight pair (two
        # DEFAULT-precision passes per chunk -> exact-ish weights).
        hilo = g_ref.shape[0] == 2 * N_CHUNKS
        chunk = g_ref.shape[2] // (2 * D)
        prec = (jax.lax.Precision.DEFAULT if hilo else _FILTER_PRECISION)
        y = jnp.zeros((2 * M, ycols), jnp.float32)
        for c in range(N_CHUNKS):
            for j in range(chunk):
                s = c * chunk + j
                xbuf[j * 2 * D : (j + 1) * 2 * D, :] = fbuf[:, s : s + ycols]
            y = y + jax.lax.dot_general(
                g_ref[c], xbuf[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )
            if hilo:
                y = y + jax.lax.dot_general(
                    g_ref[N_CHUNKS + c], xbuf[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )
    else:
        # per-shift accumulating dots (simplest correct form)
        F = fbuf[:, : ycols + width - 1]
        y = jnp.zeros((2 * M, ycols), jnp.float32)
        for s in range(width):
            y = y + jax.lax.dot_general(
                g_ref[s], F[:, s : s + ycols],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_FILTER_PRECISION,
            )
    y_i, y_q = y[:M], y[M:]

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

    # per-channel AA correlation: 32 shifted FMAs of the +-1 lattice
    if "aa" in dev_skip:            # dev-only stage timing knob
        hit_ref[:] = bits[:, :T].astype(jnp.int8)
    else:
        s_lat = jnp.where(bits, 1.0, -1.0)
        acc = jnp.zeros((M, T), jnp.float32)
        for j in range(AA_BITS):
            acc = acc + s_lat[:, j * sps : j * sps + T] * tsign_ref[:, j : j + 1]
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


def _default_tile(compute_dtype: str) -> int:
    """Largest measured-fastest time tile that fits VMEM per mode: bf16
    operand storage halves the frame scratch, so the bf16 modes take a
    2048-frame tile (1003 vs 911 Msps at 1024 on v5e; 4096 regresses);
    f32 operands stay at 1024."""
    return 2048 if compute_dtype in ("bf16", "bf16x2w") else 1024


@partial(jax.jit, static_argnames=("num_taps", "has_context", "sps", "lag",
                                   "tile", "compute_dtype", "inner",
                                   "interpret", "dev_skip"))
def fused_frontend(i_wb, q_wb, aa_rows, aa_mask, num_taps: int = DEFAULT_TAPS,
                   has_context: bool = False, sps: int = 4, lag: int = 4,
                   tile: int | None = None, compute_dtype: str = "f32",
                   inner: str = "im2col", interpret: bool = False,
                   dev_skip: str = ""):
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
    if tile is None:
        tile = _default_tile(compute_dtype)
    hilo = compute_dtype == "bf16x2w"
    assert not (hilo and inner != "im2col"), "bf16x2w needs the im2col inner"
    cdtype = (jnp.bfloat16 if compute_dtype in ("bf16", "bf16x2w")
              else jnp.float32)
    g = _g_stack(num_taps)
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
    if cdtype == jnp.bfloat16:
        f_t = f_t.astype(cdtype)

    if aa_rows.ndim == 1:
        aa_rows = jnp.broadcast_to(aa_rows, (M, AA_BITS))
    tsign = ((aa_rows.astype(jnp.float32) * 2 - 1)
             * aa_mask.astype(jnp.float32)[None, :])          # (40, 32)
    n_mask = jnp.sum(aa_mask.astype(jnp.float32)).reshape(1, 1)

    if inner == "im2col":
        gk = jnp.asarray(_g_chunks_hilo(num_taps) if hilo
                         else _g_chunks(num_taps), cdtype)
        chunk = gk.shape[2] // (2 * D)
        g_spec = pl.BlockSpec((gk.shape[0], 2 * M, chunk * 2 * D),
                              lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        x_scratch = pltpu.VMEM((chunk * 2 * D, _ycols(T, sps, lag)), cdtype)
    else:
        gk = jnp.asarray(g, cdtype)
        g_spec = pl.BlockSpec((width, 2 * M, 2 * D), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
        x_scratch = pltpu.VMEM((8, 128), cdtype)  # unused placeholder
    kern = partial(_kernel, tile=T, width=width, sps=sps, lag=lag,
                   inner=inner, dev_skip=dev_skip)
    bits, hit, mag = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            # frames stay in HBM (21 MB per 131k block; tiles are DMA'd)
            pl.BlockSpec(memory_space=pltpu.ANY
                         if interpret else pltpu.HBM),
            g_spec,
            pl.BlockSpec((M, AA_BITS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, T), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, n_tiles * T), jnp.int8),
            jax.ShapeDtypeStruct((M, n_tiles * T), jnp.int8),
            jax.ShapeDtypeStruct((M, n_tiles * T), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * D, _fcols(T, width, sps, lag)), cdtype),
            x_scratch,
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(f_t, gk, tsign, n_mask)

    n_bits = k_out - lag
    n_hit = n_bits - (AA_BITS - 1) * sps
    return (bits[:, :n_bits], hit[:, :n_hit].astype(bool), mag[:, :n_hit])


@partial(jax.jit, static_argnames=("sps", "lag", "max_candidates", "num_taps",
                                   "has_context", "tile", "compute_dtype",
                                   "inner", "decode", "interpret"))
def wideband_scan_fused(i_wb, q_wb, aa_rows, aa_mask, whiten_rows, crc_inits,
                        adv_flags, sps: int = 4, lag: int = 4,
                        max_candidates: int = 8, num_taps: int = DEFAULT_TAPS,
                        has_context: bool = False, tile: int | None = None,
                        compute_dtype: str = "f32", inner: str = "im2col",
                        decode: str = "pallas", interpret: bool = False):
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
        compute_dtype=compute_dtype, inner=inner, interpret=interpret)

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
