"""Fused Pallas TPU kernel for the narrowband scan hot path.

One VMEM-resident pass computes:
  d[n]     = i[n]*q[n+lag] - i[n+lag]*q[n]     (phase-difference decision)
  bits[n]  = d[n] > 0
  corr[n]  = sum_j t[j] * sign(d[n + j*sps])    (32-tap AA correlation)

The XLA path (phy.demodulator) materializes the +-1 lattice in HBM and
runs a dilated convolution over it; this kernel keeps the decisions in
VMEM and forms the correlation with 32 shifted adds, so the IQ block is
read from HBM exactly once and nothing intermediate spills.

Mosaic wants 2D lane-aligned vectors, so the sample stream lives as an
(R, 128) tile and flat shifts decompose into a sublane roll, a lane roll,
and a lane-index select (``_flat_shift_left``).

Outputs are bit-identical to rx.pipeline.scan_block on the valid region.

Measured on TPU v5e: parity with the XLA path at 64k-sample blocks
(~0.9 ms; both dominated by dispatch) — XLA's own fusion of the dilated
convolution already runs this memory-bound pass near the HBM roofline
(16.7 Gsps at 1M-sample blocks), so the kernel is kept as a tested
alternative (``scan_block_fused``) rather than the default. Blocks must
fit VMEM (<= ~256k samples); the production scan uses the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AA_BITS = 32
_C = 128  # lane width


def _flat_shift_left(x, k: int):
    """out.flat[m] = x.flat[m + k] for m < size-k (wrap beyond), x: (R, C)."""
    if k == 0:
        return x
    r, c = x.shape
    k_r, k_c = k // c, k % c
    a = pltpu.roll(x, (r - k_r) % r, 0)
    if k_c == 0:
        return a
    b = pltpu.roll(a, r - 1, 0)
    ar = pltpu.roll(a, c - k_c, 1)
    br = pltpu.roll(b, c - k_c, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    return jnp.where(col < c - k_c, ar, br)


def _kernel(i_ref, q_ref, t_ref, hit_ref, bits_ref, *, sps, lag):
    i = i_ref[:]
    q = q_ref[:]
    i_s = _flat_shift_left(i, lag)
    q_s = _flat_shift_left(q, lag)
    d = i * q_s - i_s * q
    pos = d > 0
    bits_ref[:] = jnp.where(pos, 1.0, 0.0)
    s = jnp.where(pos, 1.0, -1.0)
    acc = s * t_ref[0, 0]
    for j in range(1, AA_BITS):
        acc = acc + _flat_shift_left(s, j * sps) * t_ref[j, 0]
    hit_ref[:] = acc


@partial(jax.jit, static_argnames=("sps", "lag"))
def scan_block_fused(i, q, aa_bits, aa_mask, sps: int, lag: int):
    """(hit_mask, bit_lattice), matching rx.pipeline.scan_block."""
    n = i.shape[0]
    span = (AA_BITS - 1) * sps
    n_bits = n - lag
    n_out = n_bits - span
    # pad so the wrap region of the largest shift stays out of the valid zone
    n_pad = -(-(n + span + lag) // (8 * _C)) * (8 * _C)
    rows = n_pad // _C

    def prep(x):
        return jnp.pad(x.astype(jnp.float32), (0, n_pad - n)).reshape(rows, _C)

    t = ((aa_bits.astype(jnp.float32) * 2 - 1) * aa_mask.astype(jnp.float32))
    n_mask = jnp.sum(aa_mask.astype(jnp.float32))

    corr, bits = pl.pallas_call(
        partial(_kernel, sps=sps, lag=lag),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _C), jnp.float32),
            jax.ShapeDtypeStruct((rows, _C), jnp.float32),
        ],
    )(prep(i), prep(q), t.reshape(AA_BITS, 1))

    corr = corr.reshape(-1)[:n_out]
    bits = bits.reshape(-1)[:n_bits]
    return corr == n_mask, (bits > 0.5).astype(jnp.int8)
