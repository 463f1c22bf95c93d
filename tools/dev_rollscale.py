"""Dev probe: how does Mosaic unaligned-slice (lane roll) cost scale with
SUBLANE count?

The poly inner pays 65 unaligned lane slices of a (40, fcols) f32 frame
per tile — PERF.md pins these rolls, not FLOPs, as the exact-parity
mode's floor. If roll cost is per-OP (sublane-independent up to some
height), stacking pre-shifted frame copies host-side (F consecutive
shifts live as F row groups; ONE slice covers F shifts) divides the roll
count by F for the same FMA work. If roll cost scales with rows, the
trick is a wash. This measures the same total FMA work three ways:

  R=40,  N=65   one row group   (the current poly slice pattern)
  R=80,  N=33   F=2 stacking    (33 slices of doubled height)
  R=160, N=17   F=4 stacking    (17 slices of quadrupled height)

Each kernel: N unaligned slices f[:, s*STEP : +YCOLS] * per-row coef,
register-chained in groups of GRP slices, one VMEM store per group —
the poly inner's accumulate() shape. Value-forced timing (bench.py).
"""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

T = 2048
YCOLS = T + 128
N_TILES = 64
rng = np.random.default_rng(0)
N_BLOCKS = 4


def make_kernel(R, N, STEP, GRP):
    FCOLS = -(-(YCOLS + N * STEP) // 128) * 128

    def kern(f_hbm, kc_ref, out_ref, fbuf, acc_ref, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(f_hbm.at[:, pl.ds(i * T, FCOLS)], fbuf, sem)
        cp.start()
        cp.wait()
        f = fbuf[:]
        first = True
        for g0 in range(0, N, GRP):
            acc = None
            for j in range(g0, min(g0 + GRP, N)):
                s = j * STEP
                t = f[:, s : s + YCOLS] * kc_ref[:, j : j + 1]
                acc = t if acc is None else acc + t
            acc_ref[:] = acc if first else acc_ref[:] + acc
            first = False
        # fold row groups to 40 and write a tile so nothing is DCE'd
        a = acc_ref[:]
        h = R
        while h > 40:
            h //= 2
            a = a[:h] + a[h:2 * h]
        out_ref[:] = a[:, :T]

    kc = rng.normal(size=(R, N)).astype(np.float32)
    frames = [rng.normal(size=(R, N_TILES * T + FCOLS)).astype(np.float32)
              for _ in range(N_BLOCKS)]

    @jax.jit
    def step(fr):
        out = pl.pallas_call(
            kern,
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((R, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((40, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((40, N_TILES * T), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((R, FCOLS), jnp.float32),
                pltpu.VMEM((R, YCOLS), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(fr, jnp.asarray(kc))
        return out.astype(jnp.float32).sum()

    return step, [jnp.asarray(f) for f in frames]


@jax.jit
def fold(scalars):
    return sum(scalars)


def measure(name, step, frames, iters=96, trials=3):
    t0 = time.perf_counter()
    float(fold([step(f) for f in frames[:2]]))
    print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        scalars = [step(frames[k % len(frames)]) for k in range(iters)]
        float(fold(scalars))
        rates.append(iters / (time.perf_counter() - t0))
    med = sorted(rates)[len(rates) // 2]
    print(f"{name}: {1000.0/med:.3f} ms/block "
          f"[{', '.join(f'{1000.0/r:.3f}' for r in rates)}]", flush=True)
    return 1000.0 / med


for (R, N, STEP, GRP) in [(40, 65, 2, 8), (80, 33, 4, 8), (160, 17, 8, 4),
                          (160, 17, 8, 2)]:
    try:
        step, frames = make_kernel(R, N, STEP, GRP)
        measure(f"R{R}-N{N}-grp{GRP}", step, frames)
    except Exception as e:
        print(f"R{R}-N{N}-grp{GRP}: FAILED {type(e).__name__}: {e}",
              flush=True)
