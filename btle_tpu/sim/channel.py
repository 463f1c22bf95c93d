"""Channel impairment models as batched JAX ops.

Semantics follow the reference simulators (btlelib.py:823-873):
  * ppm model — joint sampling-clock stretch (linear resample) and carrier
    frequency offset exp(j*2*pi*ppm*2450MHz*t),
  * AWGN with SNR referenced to the int8 peak power 127^2.
Both are pure functions of fixed-shape arrays, vmappable over packet
batches and SNR grids.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CENTER_FREQ_HZ = 2450e6


@partial(jax.jit, static_argnames=("sps",))
def apply_ppm(i, q, ppm, sps: int):
    """Resample by (1+ppm*1e-6) and rotate by the induced CFO."""
    i = i.astype(jnp.float32)
    q = q.astype(jnp.float32)
    n = i.shape[0]
    err = ppm * 1e-6
    idx = jnp.arange(n, dtype=jnp.float32)
    pos = idx * (1.0 + err)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    frac = jnp.clip(pos - i0.astype(jnp.float32), 0.0, 1.0)
    ir = i[i0] * (1 - frac) + i[i1] * frac
    qr = q[i0] * (1 - frac) + q[i1] * frac

    fo = err * CENTER_FREQ_HZ
    ts = (1.0 / sps) * 1e-6 * (1.0 + err)
    phase = 2.0 * jnp.pi * fo * ts * idx
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    return ir * c - qr * s, ir * s + qr * c


@jax.jit
def awgn(key, i, q, snr_db):
    """AWGN at int8-peak-referenced SNR (btlelib.py:859-873)."""
    sigma = 127.0 / jnp.power(10.0, snr_db / 20.0) / jnp.sqrt(2.0)
    k1, k2 = jax.random.split(key)
    ni = jax.random.normal(k1, i.shape, jnp.float32) * sigma
    nq = jax.random.normal(k2, q.shape, jnp.float32) * sigma
    return i.astype(jnp.float32) + ni, q.astype(jnp.float32) + nq


def quantize_int16(i, q):
    """Round to int16 the way captures are fed to the receiver."""
    return (
        jnp.clip(jnp.round(i), -32768, 32767).astype(jnp.int16),
        jnp.clip(jnp.round(q), -32768, 32767).astype(jnp.int16),
    )
