"""Phase-difference GFSK demodulation + access-address correlation (JAX).

The reference family contains two demodulator variants that differ only in
the lag of the conjugate product:

* C tools: lag 1 sample — adjacent full-rate samples
  (demod_byte/search_unique_bits, btle_rx.c:1489-1562).
* python golden model / Verilog chip: lag 1 SYMBOL after per-phase
  decimation (btlelib.py:395-400, verilog/gfsk_demodulation.v) — which on
  the full-rate lattice is exactly a lag of ``sps`` samples.

So one dense kernel serves both: d[n] = i[n]*q[n+lag] - i[n+lag]*q[n],
bit[n] = d[n] > 0. Phase p / symbol k of the per-phase view is bit[p+k*sps].

Access-address correlation is a 32-tap filter over the bit lattice with tap
spacing ``sps`` (one symbol). We run it as a dilated convolution in f32
(values are ±1/0 so f32 accumulation is exact) — XLA maps it onto the
MXU/VPU without any per-position Python loop, replacing the C tool's
sample-serial circular-buffer scan (btle_rx.c:1510-1562).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def phase_diff(i: jnp.ndarray, q: jnp.ndarray, lag: int) -> jnp.ndarray:
    """d[n] = i[n]*q[n+lag] - i[n+lag]*q[n], length N-lag.

    Integer inputs use exact int32 arithmetic (bit parity with the
    reference's int math); float inputs (channelizer output) stay f32.
    """
    if jnp.issubdtype(i.dtype, jnp.floating):
        i = i.astype(jnp.float32)
        q = q.astype(jnp.float32)
    else:
        i = i.astype(jnp.int32)
        q = q.astype(jnp.int32)
    return i[:-lag] * q[lag:] - i[lag:] * q[:-lag]


def decisions(i: jnp.ndarray, q: jnp.ndarray, lag: int) -> jnp.ndarray:
    """Hard bit decisions on the full-rate lattice (int8 of 0/1)."""
    return (phase_diff(i, q, lag) > 0).astype(jnp.int8)


def aa_match_counts(bits: jnp.ndarray, aa_bits: jnp.ndarray, aa_mask: jnp.ndarray, sps: int) -> jnp.ndarray:
    """Per-position count of matching (unmasked) access-address bits.

    bits: (M,) 0/1 lattice. Returns (M - 31*sps,) int32 where entry n is
    #{j : mask[j] and bits[n+j*sps] == aa[j]}.

    Implemented as one dilated conv: with s=2b-1, t=(2a-1)*mask,
    sum(s*t) = matches - mismatches over masked taps, so
    matches = (corr + n_mask) / 2.
    """
    s = (bits.astype(jnp.float32) * 2 - 1)[None, None, :]
    t = ((aa_bits.astype(jnp.float32) * 2 - 1) * aa_mask.astype(jnp.float32))
    # XLA convolution is cross-correlation (no kernel flip), which is
    # exactly the sliding match we want: out[n] = sum_j s[n+j*sps]*t[j].
    rhs = t[None, None, :]
    corr = jax.lax.conv_general_dilated(
        s, rhs, window_strides=(1,), padding="VALID",
        rhs_dilation=(sps,), preferred_element_type=jnp.float32,
    )[0, 0]
    n_mask = jnp.sum(aa_mask.astype(jnp.float32))
    return ((corr + n_mask) * 0.5).astype(jnp.int32)


@partial(jax.jit, static_argnames=("sps", "lag"))
def aa_hits(i, q, aa_bits, aa_mask, sps: int, lag: int):
    """Full-rate hit mask: position n is a hit iff all unmasked AA bits
    match starting at lattice position n with symbol stride sps."""
    bits = decisions(i, q, lag)
    counts = aa_match_counts(bits, aa_bits, aa_mask, sps)
    n_mask = jnp.sum(aa_mask.astype(jnp.int32))
    return counts == n_mask, bits
