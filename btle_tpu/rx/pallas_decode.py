"""Pallas candidate-decode kernel: dewhiten + byte-pack + CRC on-chip.

The XLA candidate decode (rx.pipeline._decode_candidate vmapped over 40
channels x C slots) spends ~5 ms/131k-block in the 1,280 strided
336-bit window gathers — TPU executes them as one DMA per window. This
kernel does the same decode as one grid step per channel with the
windows extracted as dynamic *register* slices:

  - the bit lattice is phase-split in XLA: bits4[m, p, kq] = bits[m,
    sps*kq + p], so a candidate window (stride sps on the full-rate
    lattice) is 336 CONTIGUOUS lanes of one sublane row;
  - per candidate: one 128-aligned wide vector load of all sps phase
    rows (Mosaic requires tile-aligned dynamic lane offsets), a dynamic
    lane rotate to the in-tile offset, a one-hot sublane reduction for
    the sampling phase — registers only, no DMA;
  - dewhitening is an XOR with the channel's whitening row;
  - byte packing, all 42 CRC prefix states (GF(2) matmul form,
    spec.crc24.linear_crc_matrices) and the bit-weight packing are
    (C,336)x(336,1008)-class MXU matmuls;
  - the data-dependent length lookup is a one-hot contraction.

Outputs are bit-identical to _decode_candidate for every candidate
whose window lies inside the lattice (the caller pads the lattice tail
with zeros; _decode_candidate instead clamps gathers to the last
element, so candidates INSIDE the final window-length of the lattice
tail may differ — those positions sit in the stream halo and are never
consumed; see tests).

Used by wideband.fused.wideband_scan_fused (decode="pallas").
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..spec.constants import MAX_PDU_CRC_BITS, MAX_PDU_CRC_BYTE
from ..spec.crc24 import linear_crc_matrices

AA_BITS = 32
_WIDE = 512  # aligned window load: 336 bits + up to 127 rotate + slack


@lru_cache(maxsize=None)
def _weights():
    """(W8, W24, V, L6): bit->byte / state->int / CRC parity matrices."""
    nb = MAX_PDU_CRC_BYTE
    w8 = np.zeros((nb * 8, nb), np.float32)
    for i in range(nb * 8):
        w8[i, i // 8] = float(1 << (i % 8))
    w24 = np.zeros((nb * 24, nb), np.float32)
    for i in range(nb * 24):
        w24[i, i // 24] = float(1 << (i % 24))
    v, minit = linear_crc_matrices(nb)
    l6 = np.zeros((nb * 8, 2), np.float32)
    for j in range(6):
        l6[8 + j, 0] = float(1 << j)   # 6-bit ADV length
    for j in range(5):
        l6[8 + j, 1] = float(1 << j)   # 5-bit data-channel length
    return w8, w24, v.astype(np.float32), minit.astype(np.float32), l6


def _kernel(pos_ref, adv_ref, bits4_ref, whiten_ref, initc_ref, w8_ref,
            w24_ref, v_ref, l6_ref, bytes_ref, plen_ref, match_ref, lenok_ref,
            wbuf, *, c_slots: int, sps: int):
    nb = MAX_PDU_CRC_BYTE
    nbits = MAX_PDU_CRC_BITS
    ch = pl.program_id(0)
    # Per-candidate window extraction. Mosaic only allows dynamic lane
    # offsets that are tile-aligned, and no dynamic sublane offsets at
    # all — so: one 128-aligned wide load of all sps phase rows, a
    # dynamic lane rotate to the in-tile offset, and a one-hot sublane
    # reduction to pick the sampling phase.
    wide = _WIDE
    for j in range(c_slots):
        p = pos_ref[ch, j]
        phase = jax.lax.rem(p, sps)
        kq_plus = jax.lax.div(p, sps) + AA_BITS
        base = pl.multiple_of((kq_plus // 128) * 128, 128)
        r = kq_plus - base                              # 0..127
        wv = bits4_ref[0, :, pl.ds(base, wide)]         # (sps, wide)
        wv = pltpu.roll(wv, wide - r, 1)                # lane left-shift by r
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (sps, 1), 0) == phase)
        picked = jnp.sum(wv * onehot.astype(jnp.int32), axis=0, keepdims=True)
        wbuf[pl.ds(j, 1), :] = picked[:, :nbits]
    whiten_row = whiten_ref[pl.ds(ch, 1), :].astype(jnp.int32)    # (1, 336)
    dew_i = jnp.bitwise_xor(wbuf[:], whiten_row)
    dew = dew_i.astype(jnp.float32)                     # (C, 336) of 0/1

    pkt_bytes = jnp.dot(dew, w8_ref[:],
                        preferred_element_type=jnp.float32)       # (C, 42)
    contrib = jnp.dot(dew, v_ref[:],
                      preferred_element_type=jnp.float32)         # (C, 1008)
    state_bits = (contrib + initc_ref[pl.ds(ch, 1), :]).astype(jnp.int32) & 1
    states = jnp.dot(state_bits.astype(jnp.float32), w24_ref[:],
                     preferred_element_type=jnp.float32)          # (C, 42)

    # everything below stays rank-2 (Mosaic rejects rank-1 vectors):
    # per-candidate scalars live as (C, 1) columns
    lens = jnp.dot(dew, l6_ref[:], preferred_element_type=jnp.float32)
    adv = adv_ref[ch, 0] != 0
    plen = jnp.where(adv, lens[:, 0:1], lens[:, 1:2]).astype(jnp.int32)
    # int32 select: Mosaic cannot legalize selects over i1 vectors
    len_ok = jnp.where(adv,
                       ((plen >= 6) & (plen <= 37)).astype(jnp.int32),
                       (plen <= 31).astype(jnp.int32))
    plen_c = jnp.clip(plen, 0, 37)                      # (C, 1)

    # data-dependent byte/state lookups as one-hot contractions
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (c_slots, nb), 1)
    crc_state = jnp.sum(jnp.where(k_idx == plen_c + 1, states, 0.0),
                        axis=1, keepdims=True)
    b0 = jnp.sum(jnp.where(k_idx == plen_c + 2, pkt_bytes, 0.0),
                 axis=1, keepdims=True)
    b1 = jnp.sum(jnp.where(k_idx == plen_c + 3, pkt_bytes, 0.0),
                 axis=1, keepdims=True)
    b2 = jnp.sum(jnp.where(k_idx == plen_c + 4, pkt_bytes, 0.0),
                 axis=1, keepdims=True)
    crc_rcv = b0 + b1 * 256.0 + b2 * 65536.0            # (C, 1)

    bytes_ref[ch] = pkt_bytes.astype(jnp.int32)
    plen_ref[ch] = plen
    match_ref[ch] = (crc_state == crc_rcv).astype(jnp.int8)
    lenok_ref[ch] = len_ok.astype(jnp.int8)


@partial(jax.jit, static_argnames=("sps", "interpret"))
def decode_candidates_pallas(bits, pos, whiten_rows, crc_inits, adv_flags,
                             sps: int = 4, interpret: bool = False):
    """Decode candidate windows for all channels on-chip.

    bits: (M, Kb) int8 full-rate lattices;  pos: (M, C) int32 positions
    whiten_rows: (M, 336);  crc_inits: (M,) table-form init;  adv_flags (M,)
    Returns (pkt_bytes (M,C,42) i32, plen (M,C) i32, crc_match (M,C) bool,
    len_ok (M,C) bool) — same semantics as rx.pipeline._decode_candidate.
    """
    m, kb = bits.shape
    c_slots = pos.shape[1]
    nbits = MAX_PDU_CRC_BITS

    # phase-split the lattice: window stride sps -> contiguous lanes.
    # Pad so every in-range pos has a full window of real bits and every
    # garbage pos (clamped below) reads zeros.
    kq = -(-kb // sps)
    pad = kq * sps - kb
    bits4 = jnp.pad(bits, ((0, 0), (0, pad))).reshape(m, kq, sps)
    bits4 = jnp.swapaxes(bits4, 1, 2)                   # (M, sps, Kq)
    # lane padding: the widest aligned load starts at
    # floor((kq-1+32)/128)*128 and spans _WIDE lanes
    kq_pad = (-(-(kq + AA_BITS) // 128)) * 128 + _WIDE
    bits4 = jnp.pad(bits4, ((0, 0), (0, 0), (0, kq_pad - kq)))
    bits4 = bits4.astype(jnp.int32)  # int8 sublanes pack 4-wide; int32
    pos = jnp.clip(pos, 0, kb - 1).astype(jnp.int32)

    w8, w24, v, minit, l6 = _weights()
    init_bits = ((crc_inits[:, None] >> jnp.arange(24)[None, :]) & 1)
    init_contrib = jnp.dot(init_bits.astype(jnp.float32), jnp.asarray(minit),
                           preferred_element_type=jnp.float32)    # (M, 1008)

    nb = MAX_PDU_CRC_BYTE
    kern = partial(_kernel, c_slots=c_slots, sps=sps)
    pkt_bytes, plen, match, len_ok = pl.pallas_call(
        kern,
        grid=(m,),
        in_specs=[
            # pos/adv/whiten/init live whole in SMEM/VMEM (tiny), indexed
            # by program id; bits4 is pipelined one channel per grid step
            pl.BlockSpec((m, c_slots), lambda c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sps, kq_pad), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nbits), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 24 * nb), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbits, nb), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24 * nb, nb), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbits, 24 * nb), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbits, 2), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # whole-array outputs: each grid step writes its channel row;
            # per-candidate scalars are (C, 1) columns (rank-2 in-kernel)
            pl.BlockSpec((m, c_slots, nb), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c_slots, 1), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c_slots, 1), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, c_slots, 1), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, c_slots, nb), jnp.int32),
            jax.ShapeDtypeStruct((m, c_slots, 1), jnp.int32),
            jax.ShapeDtypeStruct((m, c_slots, 1), jnp.int8),
            jax.ShapeDtypeStruct((m, c_slots, 1), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_slots, nbits), jnp.int32),
        ],
        interpret=interpret,
    )(pos, adv_flags.astype(jnp.int32)[:, None], bits4,
      whiten_rows.astype(jnp.int32), init_contrib,
      jnp.asarray(w8), jnp.asarray(w24), jnp.asarray(v), jnp.asarray(l6))

    return (pkt_bytes, plen[..., 0], match[..., 0].astype(bool),
            len_ok[..., 0].astype(bool))
