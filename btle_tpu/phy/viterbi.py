"""Viterbi decoder for the LE Coded PHY FEC (rate 1/2, K=4, 8 states).

TPU-native formulation: the whole trellis is one `lax.scan` over time
with an (8,) path-metric carry and dense (8,)-wide add-compare-select
per step — no data-dependent control flow, static max-length shapes
with a validity mask, vmappable over candidate windows. With the state
defined as the last three input bits (newest in bit 0), the transition
``s' = ((s << 1) | x) & 7`` makes the consumed input equal ``s' & 1``,
so the traceback only needs the winning-predecessor bit per (step,
state): a second reversed scan.

Soft inputs: per-position metrics (la, lb) for the (a, b) FEC bit pair,
positive = bit 1 — pattern_demap_soft feeds these directly; hard bits
enter as +-1. TERM bits guarantee end state 0 (exact termination).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..spec.coded import FEC_G0, FEC_G1, FEC_K

N_STATES = 1 << (FEC_K - 1)


def _output_tables():
    """A[s, x], B[s, x] in {+1,-1}: encoder outputs for input x at state s
    (sign convention: +1 = FEC bit 1)."""
    a = np.zeros((N_STATES, 2), np.float32)
    b = np.zeros((N_STATES, 2), np.float32)
    for s in range(N_STATES):
        for x in range(2):
            reg = (x, s & 1, (s >> 1) & 1, (s >> 2) & 1)
            a[s, x] = 2 * (sum(g & r for g, r in zip(FEC_G0, reg)) & 1) - 1
            b[s, x] = 2 * (sum(g & r for g, r in zip(FEC_G1, reg)) & 1) - 1
    return a, b


_A, _B = _output_tables()
# predecessors of next-state ns: s in {ns>>1, (ns>>1)|4}, input x = ns&1
_PRED0 = np.arange(N_STATES) >> 1
_PRED1 = (np.arange(N_STATES) >> 1) | (N_STATES >> 1)
_XIN = np.arange(N_STATES) & 1


@partial(jax.jit, static_argnames=())
def viterbi_decode(la, lb, n_valid):
    """Soft-decision Viterbi over a masked max-length trellis.

    la, lb: (N,) float metrics for the a/b FEC bits (positive = 1).
    n_valid: number of real steps (the rest are mask). Returns
    (bits (N,) int8, path_metric scalar) — bits beyond n_valid are 0;
    the path ends in state 0 (TERM-flushed).
    """
    la = jnp.asarray(la, jnp.float32)
    lb = jnp.asarray(lb, jnp.float32)
    n = la.shape[0]
    steps = jnp.arange(n)
    valid = steps < n_valid

    A = jnp.asarray(_A)
    B = jnp.asarray(_B)
    p0 = jnp.asarray(_PRED0)
    p1 = jnp.asarray(_PRED1)
    xin = jnp.asarray(_XIN)

    neg = jnp.float32(-1e30)
    pm0 = jnp.full((N_STATES,), neg).at[0].set(0.0)

    def fwd(pm, inp):
        la_i, lb_i, v = inp
        # branch metric INTO ns from predecessor p (input xin[ns])
        bm0 = A[p0, xin] * la_i + B[p0, xin] * lb_i
        bm1 = A[p1, xin] * la_i + B[p1, xin] * lb_i
        c0 = pm[p0] + bm0
        c1 = pm[p1] + bm1
        take1 = c1 > c0
        new_pm = jnp.where(take1, c1, c0)
        pm_next = jnp.where(v, new_pm, pm)
        dec = jnp.where(v, take1, False)
        return pm_next, dec

    # unroll amortizes the per-step scan overhead across the 363-step
    # trellis (the sequential dependency itself is irreducible)
    pm_end, decs = jax.lax.scan(fwd, pm0, (la, lb, valid), unroll=8)

    def back(state, inp):
        dec_i, v = inp
        bit = (state & 1).astype(jnp.int8)
        pred = jnp.where(dec_i[state], (state >> 1) | (N_STATES >> 1),
                         state >> 1)
        nstate = jnp.where(v, pred, state)
        return nstate, jnp.where(v, bit, jnp.int8(0))

    _, bits_rev = jax.lax.scan(back, jnp.int32(0), (decs, valid),
                               reverse=True, unroll=8)
    return bits_rev, pm_end[0]


def _radix2_tables():
    """Transition tables for the two-steps-per-scan-iteration trellis.

    For next-state ns (after TWO inputs) there are 4 predecessor paths
    j in 0..3: PRED2[ns, j] = s_k, and the consumed inputs are fixed by
    ns (x2 = ns&1, x1 = (ns>>1)&1). Output-sign tables for the four
    branch symbols (a1 b1 a2 b2) are precomputed per (ns, j)."""
    pred = np.zeros((N_STATES, 4), np.int32)
    a1 = np.zeros((N_STATES, 4), np.float32)
    b1 = np.zeros((N_STATES, 4), np.float32)
    a2 = np.zeros((N_STATES, 4), np.float32)
    b2 = np.zeros((N_STATES, 4), np.float32)
    for ns in range(N_STATES):
        x2 = ns & 1
        x1 = (ns >> 1) & 1
        j = 0
        for s_k in range(N_STATES):
            s_mid = ((s_k << 1) | x1) & (N_STATES - 1)
            if ((s_mid << 1) | x2) & (N_STATES - 1) != ns:
                continue
            pred[ns, j] = s_k
            a1[ns, j] = _A[s_k, x1]
            b1[ns, j] = _B[s_k, x1]
            a2[ns, j] = _A[s_mid, x2]
            b2[ns, j] = _B[s_mid, x2]
            j += 1
        assert j == 4
    return pred, a1, b1, a2, b2


_P2, _A1, _B1, _A2, _B2 = _radix2_tables()


@partial(jax.jit, static_argnames=("n_steps",))
def viterbi_decode_r2(la, lb, n_steps: int):
    """Radix-2 Viterbi over an UNMASKED trellis of exactly ``n_steps``
    inputs (n_steps even): two trellis steps per scan iteration halve
    the irreducibly sequential chain. Produces the SAME maximum-
    likelihood path as viterbi_decode (ties may resolve differently —
    measure-zero for float metrics).
    """
    assert n_steps % 2 == 0, "radix-2 path needs an even step count"
    la = jnp.asarray(la, jnp.float32)[:n_steps].reshape(-1, 2)
    lb = jnp.asarray(lb, jnp.float32)[:n_steps].reshape(-1, 2)

    p2 = jnp.asarray(_P2)
    A1, B1 = jnp.asarray(_A1), jnp.asarray(_B1)
    A2, B2 = jnp.asarray(_A2), jnp.asarray(_B2)

    neg = jnp.float32(-1e30)
    pm0 = jnp.full((N_STATES,), neg).at[0].set(0.0)

    def fwd(pm, inp):
        la_p, lb_p = inp
        bm = (A1 * la_p[0] + B1 * lb_p[0]
              + A2 * la_p[1] + B2 * lb_p[1])        # (8, 4)
        cand = pm[p2] + bm
        j = jnp.argmax(cand, axis=1)
        return jnp.max(cand, axis=1), j.astype(jnp.int8)

    pm_end, decs = jax.lax.scan(fwd, pm0, (la, lb), unroll=4)

    def back(state, dec_p):
        j = dec_p[state]
        bits2 = jnp.stack([((state >> 1) & 1).astype(jnp.int8),
                           (state & 1).astype(jnp.int8)])   # (x1, x2)
        return p2[state, j], bits2

    _, bits_rev = jax.lax.scan(back, jnp.int32(0), decs, reverse=True)
    return bits_rev.reshape(-1), pm_end[0]


def fec_decode_bits(fec_bits, n_valid=None):
    """Hard-decision convenience: interleaved [a0 b0 a1 b1 ...] 0/1 ->
    decoded input bits (incl. the TERM zeros)."""
    fec_bits = np.asarray(fec_bits)
    la = fec_bits[0::2].astype(np.float32) * 2 - 1
    lb = fec_bits[1::2].astype(np.float32) * 2 - 1
    nv = len(la) if n_valid is None else n_valid
    bits, _ = viterbi_decode(jnp.asarray(la), jnp.asarray(lb), nv)
    return np.asarray(bits)
