"""GFSK modulators as batched JAX kernels.

Two bit-exact fixed-point flavors (see btle_tpu.golden.model for the
reference semantics and citations):

* ``python`` flavor — btlelib.gfsk_modulation_fixed_point semantics
  (btlelib.py:146-189): sample-repeat NRZ upsample, int FIR, >>1, phase
  accumulator over a 2048-entry table (at sps=8).
* ``c`` flavor — gen_sample_from_phy_bit semantics (btle_tx.c:1022-1085):
  zero-stuffed impulse train, 9-tap FIR accumulated straight into a
  mod-1024 phase accumulator (at sps=4).

Everything is integer arithmetic (int32) so results are exact; the only
float op is none. Batch with ``jax.vmap``; all shapes static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .tables import c_mod_tables, golden_mod_tables


def _conv_full_i32(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """'full' integer convolution via float64-free conv_general_dilated."""
    t = len(taps)
    lhs = x.astype(jnp.int32)[None, None, :]
    rhs = taps.astype(jnp.int32)[::-1][None, None, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding=[(t - 1, t - 1)],
        preferred_element_type=jnp.int32,
    )
    return out[0, 0]


@partial(jax.jit, static_argnames=("sps",))
def modulate_python(bits: jnp.ndarray, sps: int = 8):
    """python-flavor modulator. bits: (L,) of 0/1 -> (i8, q8) of length
    L*sps + 2*sps, bit-exact vs golden.gfsk_modulate_python."""
    taps_np, cos_np, sin_np, mask = golden_mod_tables(sps)
    taps = jnp.asarray(taps_np)
    cos_t = jnp.asarray(cos_np)
    sin_t = jnp.asarray(sin_np)

    nrz = bits.astype(jnp.int32) * 2 - 1
    up = jnp.repeat(nrz, sps)
    t = len(taps_np)
    x = jnp.concatenate([jnp.full(t, -1, jnp.int32), up])
    y = _conv_full_i32(x, taps)
    y = y[t : t + up.shape[0] + t - 1]
    y = jnp.right_shift(y, 1)
    acc = jnp.bitwise_and(jnp.cumsum(y), mask)
    return cos_t[acc], sin_t[acc]


@partial(jax.jit, static_argnames=("sps",))
def modulate_c(bits: jnp.ndarray, sps: int = 4):
    """C-flavor modulator. bits: (L,) of 0/1 -> (i8, q8) of length
    L*sps + 4*sps, bit-exact vs gen_sample_from_phy_bit."""
    taps_np, cos_np, sin_np, mask = c_mod_tables(sps)
    cos_t = jnp.asarray(cos_np)
    sin_t = jnp.asarray(sin_np)
    lg = 4 * sps
    L = bits.shape[0]
    num_sample = L * sps + lg

    # impulse train with lg-1 leading and lg-1 trailing zeros
    x = jnp.zeros(num_sample + lg - 2, jnp.int32)
    x = x.at[jnp.arange(L) * sps + (lg - 1)].set(bits.astype(jnp.int32) * 2 - 1)

    # effective taps: gauss_coef_int8[4..12] applied at window offset 3
    w = jnp.asarray(taps_np[4:13][::-1].copy())  # symmetric anyway
    lhs = x[None, None, :]
    rhs = w[::-1][None, None, :]
    corr = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        preferred_element_type=jnp.int32,
    )[0, 0]
    a = corr[3 : 3 + num_sample - 1]
    acc = jnp.bitwise_and(jnp.cumsum(a), mask)
    idx = jnp.concatenate([jnp.zeros(1, jnp.int32), acc])
    return cos_t[idx], sin_t[idx]


def modulate_batch(bits: jnp.ndarray, flavor: str = "python", sps: int | None = None):
    """(B, L) bit batch -> (B, num_sample) int8 i and q.

    Fixed L per batch; variable-length packets are handled by the caller
    padding bits with zeros and tracking true lengths (output sample count
    for a packet of ``l`` bits is l*sps + span*sps).
    """
    if flavor == "python":
        fn = partial(modulate_python, sps=sps or 8)
    elif flavor == "c":
        fn = partial(modulate_c, sps=sps or 4)
    else:
        raise ValueError(flavor)
    return jax.vmap(fn)(bits)


def num_samples(num_bits: int, flavor: str = "python", sps: int | None = None) -> int:
    if flavor == "python":
        sps = sps or 8
        return num_bits * sps + 2 * sps
    sps = sps or 4
    return num_bits * sps + 4 * sps
