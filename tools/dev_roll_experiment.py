"""Dev experiment: can pltpu.roll(stride=...) collapse the roll chains?

PERF.md round-2 finding: Mosaic lane rolls (~0.35 us per (40, 2304) roll,
width-independent) dominate the fused wideband kernel — the im2col inner
pays 65 slice-copies per tile and the AA correlation 32 shifted FMAs.
pltpu.roll supports stride/stride_axis: ONE op rotates row r by
shift + stride*r, i.e. one strided roll can manufacture a whole chunk of
shifted copies. This measures, on the live TPU:

  im2col-copy   current inner: 5 chunks x 13 slice-copies to scratch + dot
  im2col-sroll  5 chunks x (broadcast + one strided roll) + dot on value
  aa-fma        current AA corr: 32 shifted FMAs
  aa-sroll      4 groups x (broadcast + strided roll stride=4) + reduce

Each variant runs as a standalone Pallas kernel over the production tile
geometry (T=2048, bf16 frames for im2col, f32 lattice for AA), value-
forced timing per bench.py. Correctness: each variant's y/acc checksum
must match its baseline's.
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
DT = jnp.float32 if os.environ.get("ROLL_DT", "f32") == "f32" else jnp.bfloat16

M, D = 40, 20
T = 2048
YCOLS = T + 128          # _ycols(2048, 4, 4)
FCOLS = 2304             # _fcols(2048, 65, 4, 4)
WIDTH = 65
N_CHUNKS = 5
CHUNK = 13
N_TILES = 64             # one 131k block worth

rng = np.random.default_rng(0)
N_BLOCKS = 4  # distinct input blocks rotated per dispatch
G = rng.normal(size=(N_CHUNKS, 2 * M, CHUNK * 2 * D)).astype(np.float32)
FRAMES = [rng.normal(size=(2 * D, N_TILES * T + FCOLS)).astype(np.float32)
          for _ in range(N_BLOCKS)]
TSIGN = rng.choice([-1.0, 1.0], size=(M, 32)).astype(np.float32)
# fixed across variants (a fresh rng draw per make_aa call would make
# the checksums incomparable)
LAT = [rng.choice([-1.0, 1.0],
                  size=(M, N_TILES * T + 128)).astype(np.float32)
       for _ in range(N_BLOCKS)]


# ---------------------------------------------------------------- im2col
def _im2col_kernel(f_hbm, g_ref, y_ref, fbuf, xbuf, sem, *, variant):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(f_hbm.at[:, pl.ds(i * T, FCOLS)], fbuf, sem)
    cp.start()
    cp.wait()
    y = jnp.zeros((2 * M, YCOLS), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    if variant == "copy":
        for c in range(N_CHUNKS):
            for j in range(CHUNK):
                s = c * CHUNK + j
                xbuf[j * 2 * D:(j + 1) * 2 * D, :] = fbuf[:, s:s + YCOLS]
            y = y + jax.lax.dot_general(
                g_ref[c], xbuf[:], dimension_numbers=dn,
                preferred_element_type=jnp.float32)
    else:  # strided roll ("sroll" native dtype; "sroll32" rolls in f32:
        # tpu.dynamic_rotate with stride is unimplemented for packed bf16)
        f = fbuf[:]                                     # (40, FCOLS)
        if variant == "sroll32":
            f = f.astype(jnp.float32)
        for c in range(N_CHUNKS):
            xb = jnp.broadcast_to(f[None], (CHUNK, 2 * D, FCOLS))
            # row r needs left-shift by (c*CHUNK + r): rotate right by
            # FCOLS - c*CHUNK - r -> shift0 = FCOLS - c*CHUNK - (CHUNK-1),
            # stride=+1 with rows REVERSED (row r <- shift CHUNK-1-r);
            # weight rows are re-permuted to match outside the kernel.
            x = pltpu.roll(xb, FCOLS - c * CHUNK - (CHUNK - 1), 2,
                           stride=1, stride_axis=0)
            x = x.reshape(CHUNK * 2 * D, FCOLS)[:, :YCOLS]
            if variant == "sroll32" and DT != jnp.float32:
                x = x.astype(DT)
            y = y + jax.lax.dot_general(
                g_ref[c], x, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
    y_ref[:] = y[:, :T]


def make_im2col(variant):
    g = G
    if variant.startswith("sroll"):
        # reverse the j order inside each chunk: column block j <- CHUNK-1-j
        gr = g.reshape(N_CHUNKS, 2 * M, CHUNK, 2 * D)[:, :, ::-1, :]
        g = np.ascontiguousarray(gr.reshape(N_CHUNKS, 2 * M, CHUNK * 2 * D))
    gk = jnp.asarray(g, DT)
    frames = [jnp.asarray(f, DT) for f in FRAMES]
    vm = pltpu.VMEM

    @jax.jit
    def step(fr):
        y = pl.pallas_call(
            partial(_im2col_kernel, variant=variant),
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec((N_CHUNKS, 2 * M, CHUNK * 2 * D),
                             lambda i: (0, 0, 0), memory_space=vm),
            ],
            out_specs=pl.BlockSpec((2 * M, T), lambda i: (0, i),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((2 * M, N_TILES * T), jnp.float32),
            scratch_shapes=[vm((2 * D, FCOLS), DT),
                            vm((CHUNK * 2 * D, YCOLS), DT),
                            pltpu.SemaphoreType.DMA(())],
        )(fr, gk)
        return y.sum(), y[:, :64].astype(jnp.float64).sum()

    return step, frames


# ------------------------------------------------------------------- AA
def _aa_kernel(s_hbm, w_ref, acc_ref, sbuf, sem, *, variant):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(s_hbm.at[:, pl.ds(i * T, T + 128)], sbuf, sem)
    cp.start()
    cp.wait()
    s = sbuf[:]
    if variant == "fma":
        acc = jnp.zeros((M, T), jnp.float32)
        for j in range(32):
            acc = acc + s[:, j * 4:j * 4 + T] * w_ref[:, j:j + 1]
    elif variant == "mxu":
        # 4 strided rolls manufacture 8 shifts each; the per-channel
        # weighted reduce is ONE block-diagonal (M, 8*M) MXU matmul per
        # group, with the weights built OUTSIDE the kernel (w_ref here
        # is W4 (4, M, GRP*M): W4[g][ch, r*M+ch'] = delta(ch,ch') *
        # w[ch, shift(g, r)], row r of the rolled value holding shift
        # index g0 + (GRP-1-r), g0 = 8g; the g0=0 group's last row is a
        # full-size rotate, which hardware handles, probed OK).
        GRP = 8
        sz = T + 128
        acc = jnp.zeros((M, T), jnp.float32)
        for g in range(4):
            g0 = GRP * g
            xb = jnp.broadcast_to(s[None], (GRP, M, sz))
            x = pltpu.roll(xb, sz - 4 * (g0 + GRP - 1), 2,
                           stride=4, stride_axis=0).reshape(GRP * M, sz)
            acc = acc + jax.lax.dot_general(
                w_ref[g], x[:, :T],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((M, T), jnp.float32)
        GRP = 8
        sz = T + 128
        for g0 in range(0, 32, GRP):
            xb = jnp.broadcast_to(s[None], (GRP, M, sz))
            # row r: left shift by 4*(g0 + r); reversed rows, stride +4
            x = pltpu.roll(xb, sz - 4 * (g0 + GRP - 1), 2,
                           stride=4, stride_axis=0)
            # w is host-pre-reversed within each group (rev is not
            # lowerable in Mosaic): column r of group g0 holds shift
            # index g0 + GRP-1-r, matching the reversed roll rows.
            wg = w_ref[:, g0:g0 + GRP]                    # (M, GRP)
            wg = jnp.transpose(wg)[:, :, None]            # (GRP, M, 1)
            acc = acc + jnp.sum(x[:, :, :T] * wg, axis=0)
    acc_ref[:] = acc


def make_aa(variant):
    lat = [jnp.asarray(v) for v in LAT]
    w = TSIGN
    GRP = 8
    if variant == "sroll":
        wr = w.reshape(M, 32 // GRP, GRP)[:, :, ::-1].reshape(M, 32)
        w = np.ascontiguousarray(wr)
    elif variant == "mxu":
        w4 = np.zeros((4, M, GRP * M), np.float32)
        for g in range(4):
            for r in range(GRP):
                j = GRP * g + GRP - 1 - r
                w4[g, np.arange(M), r * M + np.arange(M)] = TSIGN[:, j]
        w = w4
    w = jnp.asarray(w)
    vm = pltpu.VMEM

    @jax.jit
    def step(s):
        acc = pl.pallas_call(
            partial(_aa_kernel, variant=variant),
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                             memory_space=vm),
            ],
            out_specs=pl.BlockSpec((M, T), lambda i: (0, i),
                                   memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((M, N_TILES * T), jnp.float32),
            scratch_shapes=[vm((M, T + 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
        )(s, w)
        return acc.sum(), acc[:, :64].astype(jnp.float64).sum()

    return step, lat


@jax.jit
def fold(xs):
    return sum(xs)


def measure(name, step, args, iters=192, trials=9):
    # args: list of DISTINCT device-resident inputs rotated per dispatch
    # (identical repeated buffers measure suspiciously fast — CLAUDE.md)
    # and >=192 dispatches per fetch keep the ~27 ms fetch floor plus
    # the ~0.35 ms/dispatch overhead small relative to the block time;
    # only A/B ratios between variants are floor-immune either way.
    t0 = time.perf_counter()
    chk = float(step(args[0])[1])
    print(f"{name}: compile+warm {time.perf_counter() - t0:.1f}s "
          f"chk={chk:.6f}", flush=True)
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        scalars = [step(args[k % len(args)])[0] for k in range(iters)]
        float(fold(scalars))
        dt = time.perf_counter() - t0
        rates.append(dt / iters * 1e3)
    ms = sorted(rates)[len(rates) // 2]
    print(f"{name}: {ms:.3f} ms/block ({min(rates):.3f}-{max(rates):.3f})",
          flush=True)
    return chk, ms


which = sys.argv[1] if len(sys.argv) > 1 else "all"
results = {}
if which in ("all", "im2col"):
    variants = (("copy", "sroll") if DT == jnp.float32
                else ("copy", "sroll32"))
    for v in variants:
        step, fr = make_im2col(v)
        results[f"im2col-{v}"] = measure(f"im2col-{v}", step, fr)
if which in ("all", "aa"):
    for v in ("fma", "sroll", "mxu"):
        step, lat = make_aa(v)
        results[f"aa-{v}"] = measure(f"aa-{v}", step, lat)

for base, new in (("im2col-copy", "im2col-sroll"),
                  ("im2col-copy", "im2col-sroll32"), ("aa-fma", "aa-sroll"),
                  ("aa-fma", "aa-mxu")):
    if base in results and new in results:
        cb, mb = results[base]
        cn, mn = results[new]
        match = "MATCH" if abs(cb - cn) < 1e-3 * max(1.0, abs(cb)) else "DIFF!"
        print(f"{new}: {mb / mn:.2f}x vs {base} [checksum {match}]")
