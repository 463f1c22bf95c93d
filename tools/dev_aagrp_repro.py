"""Minimized repro for the AA_GRP=4 hardware miscompile.

The production kernel's AA correlation manufactures AA_GRP shifted
copies of the decision lattice with ONE strided pltpu.roll over a
broadcast, then reduces them with a block-diagonal MXU matmul
(wideband/fused.py::_demod_tail). On the physical chip the AA_GRP=4
configuration decodes ZERO packets while interpret mode is correct;
AA_GRP=8 is correct everywhere (KNOBMATRIX.json pins this).

This tool isolates exactly that op pair in a standalone Pallas kernel —
same shapes, dtypes and roll/matmul parameters, no filterbank around
it — and diffs hardware output against the numpy ground truth for
GRP in {4, 8, 16}:

  * the rolled stack itself   (kernel "roll": is the strided rotate wrong?)
  * the per-group matmul acc  (kernel "corr": or the reduce over it?)

Exit 0 = every compiled result matches numpy (the miscompile needs the
full-kernel context; the pin stays empirical). A mismatch here is the
true minimized repro: the printout names the first bad (row, col).

Usage: python tools/dev_aagrp_repro.py   (TPU; falls back to interpret)
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

M = 40
AA_BITS = 32
SPS = 4
T = 2048


def make_inputs(grp: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    nb = T + (AA_BITS - 1) * SPS
    nbp = -(-nb // 128) * 128
    s = np.where(rng.integers(0, 2, (M, nbp)) > 0, 1.0, -1.0)
    s[:, nb:] = 0.0
    n_grp = AA_BITS // grp
    # block-diagonal weights, same layout as fused._aa_w4
    tsign = np.where(rng.integers(0, 2, (M, AA_BITS)) > 0, 1.0, -1.0)
    w4 = np.zeros((n_grp, M, grp * M), np.float32)
    for g in range(n_grp):
        for c in range(M):
            for r in range(grp):
                w4[g, c, r * M + c] = tsign[c, g * grp + grp - 1 - r]
    return s.astype(np.float32), w4, tsign


def truth(s, tsign, grp):
    """acc[c, t] = sum_j tsign[c, j] * s[c, t + j*sps] (the AA corr)."""
    acc = np.zeros((M, T), np.float64)
    for j in range(AA_BITS):
        acc += tsign[:, j : j + 1] * s[:, j * SPS : j * SPS + T]
    return acc.astype(np.float32)


def truth_roll(s, grp, g: int):
    """x[r*M + c, t] = s[c, (t + sps*(g*grp + grp-1-r)) % nbp]."""
    nbp = s.shape[1]
    x = np.zeros((grp * M, nbp), np.float32)
    for r in range(grp):
        k = SPS * (g * grp + grp - 1 - r)
        x[r * M : (r + 1) * M] = np.roll(s, -k, axis=1)
    return x


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    backend = jax.default_backend()
    on_hw = backend in ("tpu", "axon")
    print(f"backend: {backend} (hardware compile: {on_hw})", flush=True)

    failures = 0
    for grp in (4, 8, 16):
        s, w4, tsign = make_inputs(grp)
        n_grp = AA_BITS // grp
        nbp = s.shape[1]

        def corr_kernel(s_ref, w4_ref, acc_ref, *, grp, n_grp, nbp):
            acc = jnp.zeros((M, T), jnp.float32)
            sl = s_ref[:]
            for g in range(n_grp):
                xb = jnp.broadcast_to(sl[None], (grp, M, nbp))
                x = pltpu.roll(xb, nbp - SPS * (grp * g + grp - 1), 2,
                               stride=SPS, stride_axis=0).reshape(grp * M, nbp)
                acc = acc + jax.lax.dot_general(
                    w4_ref[g], x[:, :T],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[:] = acc

        def roll_kernel(s_ref, x_ref, *, grp, nbp):
            xb = jnp.broadcast_to(s_ref[:][None], (grp, M, nbp))
            x_ref[:] = pltpu.roll(xb, nbp - SPS * (grp - 1), 2,
                                  stride=SPS, stride_axis=0
                                  ).reshape(grp * M, nbp)

        for name, fn, out_shape, args, want in (
            ("roll", partial(roll_kernel, grp=grp, nbp=nbp),
             jax.ShapeDtypeStruct((grp * M, nbp), jnp.float32),
             (s,), truth_roll(s, grp, 0)),
            ("corr", partial(corr_kernel, grp=grp, n_grp=n_grp, nbp=nbp),
             jax.ShapeDtypeStruct((M, T), jnp.float32),
             (s, w4), truth(s, tsign, grp)),
        ):
            try:
                got = np.asarray(pl.pallas_call(
                    fn, out_shape=out_shape,
                    interpret=not on_hw)(*[jnp.asarray(a) for a in args]))
            except Exception as e:
                print(f"GRP={grp:2d} {name}: COMPILE/RUN ERROR "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                failures += 1
                continue
            if np.array_equal(got, want):
                print(f"GRP={grp:2d} {name}: exact match", flush=True)
            else:
                bad = np.argwhere(got != want)
                r, c = bad[0]
                print(f"GRP={grp:2d} {name}: {len(bad)} mismatches, "
                      f"first at ({r},{c}): got {got[r, c]} want "
                      f"{want[r, c]}  <-- MINIMIZED REPRO", flush=True)
                failures += 1

    print("RESULT:", "all-match (miscompile needs full-kernel context)"
          if failures == 0 else f"{failures} mismatching kernels", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
