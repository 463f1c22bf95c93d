"""Bisect the AA_GRP=4 hardware miscompile toward a minimized repro.

History: the fused wideband kernel decodes ZERO packets on the physical
chip when the AA correlation uses AA_GRP=4 (8 strided-roll groups of 4
shifts) while interpret mode is correct; AA_GRP=8/16 are correct
everywhere. tools/dev_aagrp_repro.py isolated the bare roll+matmul pair
and found it EXACT on hardware — so the divergence needs more of the
real kernel's context. This tool adds that context back one layer at a
time, each variant a standalone Pallas kernel diffed against numpy:

  tail      the REAL _demod_tail (imported from wideband.fused) on a
            synthetic y lattice: bits decision + pad-concat + rolls +
            matmuls + hit compare + RSSI, exactly as deployed
  tail-nopad   same but nb already 128-aligned (no concat pad)
  tail-f32  s_lat loaded as f32 input (skips the bool->+-1 where)
  grid      the "tail" kernel under a 2-tile grid with the production
            out_specs (block-indexed VMEM writes)

Run on the attached TPU (each variant also runs GRP=8 as control):
    python tools/dev_aagrp_bisect.py
The first variant where GRP=4 diverges while GRP=8 matches is the
minimized repro; if all match, the divergence needs the filterbank
stage above the tail (next bisection layer: prepend a dummy matmul
producing y in-kernel).
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

M = 40
AA_BITS = 32
SPS = 4
LAG = 4
T = 2048


def numpy_tail(y_i, y_q, tsign, lag=LAG, sps=SPS):
    """Ground truth for _demod_tail's bits/hit outputs (even lag)."""
    nb = T + (AA_BITS - 1) * sps
    d = (y_i[:, :nb] * y_q[:, lag : nb + lag]
         - y_i[:, lag : nb + lag] * y_q[:, :nb])
    bits = (d > 0)
    s = np.where(bits, 1.0, -1.0)
    acc = np.zeros((M, T), np.float64)
    for j in range(AA_BITS):
        acc += tsign[:, j : j + 1] * s[:, j * sps : j * sps + T]
    hit = acc == AA_BITS
    return bits[:, :T].astype(np.int8), hit.astype(np.int8)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from btle_tpu.wideband import fused

    backend = jax.default_backend()
    on_hw = backend in ("tpu", "axon")
    print(f"backend: {backend} (hardware compile: {on_hw})", flush=True)

    rng = np.random.default_rng(3)
    ycols = fused._ycols(T, SPS, LAG)
    y_i = rng.normal(size=(M, ycols)).astype(np.float32)
    y_q = rng.normal(size=(M, ycols)).astype(np.float32)
    aa_rows = rng.integers(0, 2, (M, AA_BITS)).astype(np.float32)
    tsign = aa_rows * 2 - 1
    want_bits, want_hit = numpy_tail(y_i, y_q, tsign)

    def run_tail(grp: int, n_tiles: int = 1, pad: bool = True,
                 preload_slat: bool = False):
        grp0 = fused.AA_GRP
        fused.AA_GRP = grp
        jax.clear_caches()
        try:
            import jax.numpy as jnp

            w4 = np.asarray(fused._aa_w4(jnp.asarray(tsign)))
            nmask = np.full((1, 1), float(AA_BITS), np.float32)

            def kern(yi_ref, yq_ref, w4_ref, ts_ref, nm_ref, bits_ref,
                     hit_ref, mag_ref):
                fused._demod_tail(
                    yi_ref[:], yq_ref[:], w4_ref, ts_ref, nm_ref,
                    bits_ref, hit_ref, mag_ref, tile=T, sps=SPS, lag=LAG)

            outs = pl.pallas_call(
                kern,
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((M, ycols), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, ycols), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(w4.shape, lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((M, AA_BITS), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=[
                    pl.BlockSpec((M, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
                    for _ in range(3)
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((M, n_tiles * T), jnp.int8),
                    jax.ShapeDtypeStruct((M, n_tiles * T), jnp.int8),
                    jax.ShapeDtypeStruct((M, n_tiles * T), jnp.float32),
                ],
                interpret=not on_hw,
            )(jnp.asarray(y_i), jnp.asarray(y_q), jnp.asarray(w4),
              jnp.asarray(tsign), jnp.asarray(nmask))
            return [np.asarray(o) for o in outs]
        finally:
            fused.AA_GRP = grp0
            jax.clear_caches()

    failures = 0
    for name, kwargs in (("tail", {}), ("grid2", {"n_tiles": 2})):
        for grp in (8, 4):
            try:
                bits, hit, mag = run_tail(grp, **kwargs)
            except Exception as e:
                print(f"{name} GRP={grp}: ERROR {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                failures += 1
                continue
            nt = kwargs.get("n_tiles", 1)
            wb = np.tile(want_bits, (1, nt))
            wh = np.tile(want_hit, (1, nt))
            ok_b = np.array_equal(bits, wb)
            ok_h = np.array_equal(hit, wh)
            if ok_b and ok_h:
                print(f"{name} GRP={grp}: exact match", flush=True)
            else:
                nb_ = int((bits != wb).sum())
                nh_ = int((hit != wh).sum())
                print(f"{name} GRP={grp}: MISMATCH bits={nb_} hit={nh_}"
                      f"  <-- {'MINIMIZED REPRO' if grp == 4 else 'CONTROL FAILED'}",
                      flush=True)
                failures += grp == 4
    print("RESULT:", "no divergence at this layer" if failures == 0
          else f"{failures} diverging variants", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
