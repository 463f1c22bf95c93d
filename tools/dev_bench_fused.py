"""Dev harness: stage-level timing of the wideband pass on the live TPU.

Usage: python tools/dev_bench_fused.py [all|xla|fused|frontend|selectcrc|bf16|tiles]
Value-forced timing (see bench.py header): each trial folds a batch of
dispatches to one scalar; a single host fetch forces every execution.
"""
import json, time, sys
import numpy as np
import os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

from functools import partial
from btle_tpu.spec import bits as B
from btle_tpu.spec import crc24 as C
from btle_tpu.spec import whitening as W
from btle_tpu.wideband.channelizer import DEFAULT_TAPS, bin_to_channel, channelize
DEFAULT_TAPS = int(os.environ.get("NUM_TAPS", DEFAULT_TAPS))
from btle_tpu.wideband.sniffer import wideband_scan, decode_channels
from btle_tpu.wideband.fused import wideband_scan_fused, fused_frontend

scan_len_ch = 131072
max_candidates = 32
halo_ch = 1473
n_wb = (scan_len_ch + halo_ch) * 20
LAG = 4

aa_bits = jnp.asarray(B.hex_to_bits("d6be898e"))
aa_mask = jnp.asarray(np.ones(32, np.int8))
whiten_rows = jnp.asarray(np.stack([W.whitening_bits(bin_to_channel(m), 336) for m in range(40)]))
crc_inits = jnp.asarray(np.full(40, C.lfsr_init_to_table_init("555555"), np.int32))
adv_flags = jnp.asarray(np.array([bin_to_channel(m) in (37,38,39) for m in range(40)]))

@partial(jax.jit, static_argnames=("n",))
def gen(k, n):
    ki, kq = jax.random.split(k)
    return (30.0*jax.random.normal(ki,(n,),jnp.float32), 30.0*jax.random.normal(kq,(n,),jnp.float32))

key = jax.random.PRNGKey(0)
blocks = []
for _ in range(8):
    key, sub = jax.random.split(key)
    blocks.append(jax.block_until_ready(gen(sub, n_wb)))

def checksum(out):
    return sum(leaf.astype(jnp.float32).sum() for leaf in jax.tree_util.tree_leaves(out))

@jax.jit
def fold(scalars):
    return sum(scalars)

def measure(step, name, iters=24, trials=5):
    t0=time.perf_counter()
    float(fold([step(*b) for b in blocks[:2]]))
    print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    rates=[]
    for _ in range(trials):
        t0=time.perf_counter()
        scalars=[step(*blocks[k%len(blocks)]) for k in range(iters)]
        float(fold(scalars))
        rates.append(iters/(time.perf_counter()-t0))
    med = sorted(rates)[len(rates)//2]
    msps = scan_len_ch*20*med/1e6
    allms = ", ".join(f"{1000.0/r:.2f}" for r in rates)
    print(f"{name}: ms/block [{allms}] median {1000.0/med:.2f} ms -> {msps:.0f} Msps ({msps/800:.2f}x)", flush=True)
    return msps

def step_of(fn, **kw):
    @jax.jit
    def step(i, q):
        return checksum(fn(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                           sps=4, lag=LAG, max_candidates=max_candidates, num_taps=DEFAULT_TAPS, **kw))
    return step

which = sys.argv[1] if len(sys.argv)>1 else "all"

if which in ("all","xla"):
    measure(step_of(wideband_scan), "xla-full")
if which in ("all","fused"):
    measure(step_of(wideband_scan_fused, tile=2048), "fused-full-t2048")
if which in ("all","frontend"):
    @jax.jit
    def fe(i, q):
        # tile=None -> per-dtype default (f32 tile 2048 OOMs scoped vmem)
        return checksum(fused_frontend(i, q, jnp.broadcast_to(aa_bits,(40,32)), aa_mask,
                                       num_taps=DEFAULT_TAPS, sps=4, lag=LAG))
    measure(fe, "frontend-only")
    @jax.jit
    def chan(i, q):
        return checksum(channelize(i, q, num_taps=DEFAULT_TAPS))
    measure(chan, "xla-channelize-only")
if which in ("all","selectcrc"):
    from btle_tpu.rx.pipeline import decode_from_lattice
    # device-resident lattices
    b0, h0, m0 = jax.block_until_ready(jax.jit(partial(fused_frontend, num_taps=DEFAULT_TAPS, sps=4, lag=LAG, tile=2048))(
        blocks[0][0], blocks[0][1], jnp.broadcast_to(aa_bits,(40,32)), aa_mask))
    @jax.jit
    def sel(i, q):
        # use traced lattices derived from stored ones + tiny input mix to defeat caching
        def one(h, b, mg, w, c, a):
            return decode_from_lattice(h, b, mg, w, c, a, sps=4, max_candidates=max_candidates)
        out = jax.vmap(one)(h0, b0, m0 + i[0], whiten_rows, crc_inits, adv_flags)
        return checksum(out)
    measure(sel, "selectcrc-only")
if which in ("all","tiles","bf16"):
    if which != "bf16":
        for tile in (4096, 8192):
            measure(step_of(wideband_scan_fused, tile=tile), f"fused-full-t{tile}")
    measure(step_of(wideband_scan_fused, tile=2048, compute_dtype="bf16"), "fused-bf16-t2048")

if which == "selparts":
    from btle_tpu.rx.pipeline import earliest_hits, _decode_candidate, AA_BITS
    from btle_tpu.spec.crc24 import CRC24_TABLE
    b0, h0, m0 = jax.block_until_ready(jax.jit(partial(fused_frontend, num_taps=DEFAULT_TAPS, sps=4, lag=LAG, tile=2048))(
        blocks[0][0], blocks[0][1], jnp.broadcast_to(aa_bits,(40,32)), aa_mask))
    @jax.jit
    def just_topk(i, q):
        h = h0 ^ (i[0] > 1e9)  # defeat caching, keep values
        def one(hrow):
            return earliest_hits(hrow, max_candidates, 0)
        pos, valid, n = jax.vmap(one)(h)
        return checksum((pos, valid, n))
    measure(just_topk, "earliest-hits-only")
    pos0 = jnp.zeros((40, max_candidates), jnp.int32) + jnp.arange(max_candidates, dtype=jnp.int32)[None,:]*3777
    @jax.jit
    def just_decode(i, q):
        table = jnp.asarray(CRC24_TABLE.astype(np.int32))
        def one(bits_row, w, c, a, posr):
            return jax.vmap(lambda p: _decode_candidate(p, bits_row, w, c, a, table, 4))(posr)
        pos = pos0 + (i[0] > 1e9).astype(jnp.int32)
        out = jax.vmap(one)(b0, whiten_rows, crc_inits, adv_flags, pos)
        return checksum(out)
    measure(just_decode, "decode-candidates-only")
    @jax.jit
    def just_mag(i, q):
        pos = pos0 + (i[0] > 1e9).astype(jnp.int32)
        def one(mg, p):
            return jnp.take(mg, jnp.clip(p, 0, mg.shape[0]-1))
        return checksum(jax.vmap(one)(m0, pos))
    measure(just_mag, "mag-take-only")

if which == "gather":
    from btle_tpu.rx.pipeline import MAX_PDU_CRC_BITS
    b0, h0, m0 = jax.block_until_ready(jax.jit(partial(fused_frontend, num_taps=DEFAULT_TAPS, sps=4, lag=LAG, tile=2048))(
        blocks[0][0], blocks[0][1], jnp.broadcast_to(aa_bits,(40,32)), aa_mask))
    pos0 = jnp.zeros((40, max_candidates), jnp.int32) + jnp.arange(max_candidates, dtype=jnp.int32)[None,:]*3777
    @jax.jit
    def just_gather(i, q):
        pos = pos0 + (i[0] > 1e9).astype(jnp.int32)
        def one(bits_row, posr):
            def g(p):
                idx = p + 32*4 + jnp.arange(MAX_PDU_CRC_BITS, dtype=jnp.int32)*4
                return jnp.take(bits_row, jnp.clip(idx, 0, bits_row.shape[0]-1))
            return jax.vmap(g)(posr)
        return checksum(jax.vmap(one)(b0, pos))
    measure(just_gather, "bit-gather-only")
    @jax.jit
    def just_gather_ds(i, q):
        pos = pos0 + (i[0] > 1e9).astype(jnp.int32)
        def one(bits_row, posr):
            def g(p):
                w = jax.lax.dynamic_slice(bits_row, (jnp.clip(p + 32*4, 0, bits_row.shape[0]-MAX_PDU_CRC_BITS*4),), (MAX_PDU_CRC_BITS*4,))
                return w[::4]
            return jax.vmap(g)(posr)
        return checksum(jax.vmap(one)(b0, pos))
    measure(just_gather_ds, "bit-window-dynslice")

if which == "split":
    def fe_of(**kw):
        @jax.jit
        def fe(i, q):
            return checksum(fused_frontend(i, q, jnp.broadcast_to(aa_bits,(40,32)), aa_mask,
                                           num_taps=DEFAULT_TAPS, sps=4, lag=LAG, **kw))
        return fe
    measure(fe_of(tile=2048, dev_skip="aamag"), "fe-matmul+demod-only")
    measure(fe_of(tile=2048, dev_skip="mag"), "fe-no-mag")
    measure(fe_of(tile=4096), "fe-t4096")
    measure(fe_of(tile=2048, compute_dtype="bf16"), "fe-bf16")

if which == "taps":
    def fe_of(**kw):
        @jax.jit
        def fe(i, q):
            return checksum(fused_frontend(i, q, jnp.broadcast_to(aa_bits,(40,32)), aa_mask,
                                           sps=4, lag=LAG, **kw))
        return fe
    for nt in (800, 1280):
        measure(fe_of(tile=2048, num_taps=nt), f"fe-taps{nt}")
        measure(fe_of(tile=2048, num_taps=nt, inner="dots"), f"fe-dots-taps{nt}")

if which == "tune":
    for kw, name in [
        (dict(tile=2048), "full-t2048"),
        (dict(tile=1024), "full-t1024"),
        (dict(tile=4096, inner="dots"), "full-t4096-dots"),
        (dict(tile=2048, compute_dtype="bf16"), "full-t2048-bf16"),
    ]:
        try:
            measure(step_of(wideband_scan_fused, **kw), name)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}", flush=True)
    # fetch amortization: same config, more dispatches per fetch
    s = step_of(wideband_scan_fused, tile=2048)
    measure(s, "full-t2048-iters96", iters=96, trials=3)

if which == "pipelined":
    s = step_of(wideband_scan_fused, tile=2048)
    t0=time.perf_counter()
    float(fold([s(*b) for b in blocks[:2]]))
    print(f"pipelined: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
    iters, nbatches = 24, 12
    prev = [s(*blocks[k % len(blocks)]) for k in range(iters)]
    t0 = time.perf_counter()
    done = 0
    for b in range(nbatches):
        cur = [s(*blocks[(b+k) % len(blocks)]) for k in range(iters)]
        float(fold(prev))   # forces the PREVIOUS batch while cur runs
        prev = cur
        done += iters
    float(fold(prev)); done += 0  # last batch outside the timed window? include:
    dt = time.perf_counter() - t0
    msps = scan_len_ch*20*done/dt/1e6
    print(f"pipelined: {done} blocks in {dt:.3f}s -> {1000*dt/done:.2f} ms/block, {msps:.0f} Msps ({msps/800:.2f}x)", flush=True)

if which == "tune2":
    # production-default candidate count + deep fetch amortization
    @jax.jit
    def step16(i, q):
        out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                  sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS, tile=2048)
        return checksum(out)
    measure(step16, "full-t2048-cand16-iters192", iters=192, trials=3)
    measure(step16, "full-t2048-cand16-iters96", iters=96, trials=3)

if which == "split2":
    # stage decomposition of the CURRENT production mode (bf16x2w t2048)
    def fe_of(**kw):
        @jax.jit
        def fe(i, q):
            return checksum(fused_frontend(i, q, jnp.broadcast_to(aa_bits,(40,32)), aa_mask,
                                           num_taps=DEFAULT_TAPS, sps=4, lag=LAG,
                                           compute_dtype="bf16x2w", tile=2048, **kw))
        return fe
    @jax.jit
    def full16(i, q):
        return checksum(wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                            sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                            tile=2048, compute_dtype="bf16x2w"))
    measure(full16, "x2w-full16-t2048", iters=192, trials=3)
    measure(fe_of(), "x2w-frontend-only", iters=192, trials=3)
    measure(fe_of(dev_skip="aamag"), "x2w-fe-matmul+demod", iters=192, trials=3)
    measure(fe_of(dev_skip="mag"), "x2w-fe-no-mag", iters=192, trials=3)

if which == "poly":
    # true-polyphase inner: exact f32, VPU branch conv + 80x80 DFT matmul
    def fe_of(**kw):
        @jax.jit
        def fe(i, q):
            return checksum(fused_frontend(i, q, jnp.broadcast_to(aa_bits,(40,32)), aa_mask,
                                           num_taps=DEFAULT_TAPS, sps=4, lag=LAG,
                                           inner="poly", **kw))
        return fe
    for tile, dt in ((2048, "f32"), (2048, "bf16"), (4096, "bf16")):
        @jax.jit
        def full16(i, q, _t=tile, _d=dt):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, inner="poly", compute_dtype=_d)
            return checksum(out)
        try:
            measure(full16, f"poly-{dt}-full16-t{tile}", iters=192, trials=3)
        except Exception as e:
            print(f"poly-{dt}-full16-t{tile}: FAILED {type(e).__name__}: {e}", flush=True)

if which == "r3a":
    # round-3a: stacked hi/lo single-dot (current code) at the bench
    # config, plus dispatch amortization via 262k blocks.
    @jax.jit
    def step16(i, q):
        out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                  sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                  tile=2048, compute_dtype="bf16x2w")
        return checksum(out)
    measure(step16, "x2w-stacked-t2048-131k", iters=192, trials=3)
    # 262k block: halves per-dispatch overhead per sample; 32 candidate
    # slots keep the per-air-time slot density of the 131k/16 config
    big_ch = 262144
    n_big = (big_ch + halo_ch) * 20
    bigs = []
    k2 = jax.random.PRNGKey(7)
    for _ in range(8):
        k2, sub = jax.random.split(k2)
        bigs.append(jax.block_until_ready(gen(sub, n_big)))
    def measure_big(step, name, iters=96, trials=3):
        t0=time.perf_counter()
        float(fold([step(*b) for b in bigs[:2]]))
        print(f"{name}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
        rates=[]
        for _ in range(trials):
            t0=time.perf_counter()
            scalars=[step(*bigs[k%len(bigs)]) for k in range(iters)]
            float(fold(scalars))
            rates.append(iters/(time.perf_counter()-t0))
        med = sorted(rates)[len(rates)//2]
        msps = big_ch*20*med/1e6
        allms = ", ".join(f"{1000.0/r:.2f}" for r in rates)
        print(f"{name}: ms/block [{allms}] median {1000.0/med:.2f} ms -> {msps:.0f} Msps ({msps/800:.2f}x)", flush=True)
    for tile in (2048, 3072):
        @jax.jit
        def stepb(i, q, _t=tile):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=32, num_taps=DEFAULT_TAPS,
                                      tile=_t, compute_dtype="bf16x2w")
            return checksum(out)
        measure_big(stepb, f"x2w-stacked-t{tile}-262k")

if which == "r3b":
    # round-3b: N distinct blocks per dispatch (per-dispatch overhead
    # ~0.35 ms on the tunnel; production streaming batches dispatches)
    def step_n(nblk):
        @jax.jit
        def step(*iq):
            tot = jnp.float32(0)
            for t in range(nblk):
                out = wideband_scan_fused(iq[2*t], iq[2*t+1], aa_bits, aa_mask,
                                          whiten_rows, crc_inits, adv_flags,
                                          sps=4, lag=LAG, max_candidates=16,
                                          num_taps=DEFAULT_TAPS, tile=2048,
                                          compute_dtype="bf16x2w")
                tot = tot + checksum(out)
            return tot
        return step
    for nblk in (2, 4):
        step = step_n(nblk)
        args = []
        for k in range(nblk):
            args.extend(blocks[k])
        t0=time.perf_counter()
        float(fold([step(*args), step(*args)]))
        print(f"batch{nblk}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)
        iters = 192 // nblk
        rates=[]
        for _ in range(3):
            t0=time.perf_counter()
            scalars=[]
            for k in range(iters):
                a=[]
                for t in range(nblk):
                    a.extend(blocks[(k*nblk+t)%len(blocks)])
                scalars.append(step(*a))
            float(fold(scalars))
            rates.append(iters*nblk/(time.perf_counter()-t0))
        med = sorted(rates)[len(rates)//2]
        msps = scan_len_ch*20*med/1e6
        allms = ", ".join(f"{1000.0/r:.2f}" for r in rates)
        print(f"batch{nblk}: ms/block [{allms}] median {1000.0/med:.2f} ms -> {msps:.0f} Msps ({msps/800:.2f}x)", flush=True)

if which == "r3c":
    # round-3c: strided-roll shift manufacture for the exact-f32 poly
    # inner (9 rolls replace 65 unaligned slices)
    for inner, tile in (("poly", 3072), ("poly", 4096)):
        @jax.jit
        def stepp(i, q, _in=inner, _t=tile):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, inner=_in, compute_dtype="f32")
            return checksum(out)
        try:
            measure(stepp, f"{inner}-f32-full16-t{tile}", iters=192, trials=3)
        except Exception as e:
            print(f"{inner}-f32-full16-t{tile}: FAILED {type(e).__name__}", flush=True)

if which == "r3d":
    # round-3d: poly register-chain group-size sweep (frontend only)
    def fe_of(**kw):
        @jax.jit
        def fe(i, q):
            return checksum(fused_frontend(i, q, jnp.broadcast_to(aa_bits,(40,32)), aa_mask,
                                           num_taps=DEFAULT_TAPS, sps=4, lag=LAG,
                                           inner="poly", tile=3072, **kw))
        return fe
    for pg in (8, 12, 16):
        try:
            measure(fe_of(dev_skip=f"pg{pg}"), f"poly-fe-t3072-pg{pg}", iters=192, trials=3)
        except Exception as e:
            print(f"poly-fe-t3072-pg{pg}: FAILED {type(e).__name__}", flush=True)

if which == "tune3":
    for tile in (1024, 2048, 3072, 4096):
        @jax.jit
        def stepw(i, q, _t=tile):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, compute_dtype="bf16x2w")
            return checksum(out)
        measure(stepw, f"bf16x2w-t{tile}", iters=192, trials=3)

if which == "x2":
    # round-5: the f32x2 parity candidate (dual bf16 hi/lo operand/weight
    # split, all-MXU). Sweep the VMEM-feasible tiles at the exact bench
    # config (16 cand slots, 192-dispatch folds) + the f32-poly anchor.
    for tile in (1024, 1536, 2048, 2560):
        @jax.jit
        def stepw(i, q, _t=tile):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, compute_dtype="f32x2")
            return checksum(out)
        try:
            measure(stepw, f"f32x2-t{tile}", iters=192, trials=3)
        except Exception as e:
            print(f"f32x2-t{tile}: FAILED {type(e).__name__}: {e}", flush=True)
    @jax.jit
    def stepp(i, q):
        out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                  sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                  compute_dtype="f32")
        return checksum(out)
    measure(stepp, "f32-poly-anchor", iters=192, trials=3)


if which == "polyx":
    # round-5: stacked-slice exact-f32 inner (17 rolls instead of 65).
    # Full pipeline at the bench config for the tile sweep; pgN variants
    # go through fused_frontend's dev_skip knob (frontend-only timing).
    for tile in (2560, 3072, 3584, 3840):
        @jax.jit
        def stepw(i, q, _t=tile):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, compute_dtype="f32", inner="polyx")
            return checksum(out)
        try:
            measure(stepw, f"polyx-t{tile}", iters=192, trials=3)
        except Exception as e:
            print(f"polyx-t{tile}: FAILED {type(e).__name__}: {e}", flush=True)
    for pg in (1, 4):
        @jax.jit
        def stepf(i, q, _pg=pg):
            out = fused_frontend(i, q, jnp.broadcast_to(aa_bits, (40, 32)), aa_mask,
                                 num_taps=DEFAULT_TAPS, sps=4, lag=LAG, tile=3584,
                                 compute_dtype="f32", inner="polyx", dev_skip=f"pg{_pg}")
            return checksum(out)
        try:
            measure(stepf, f"polyx-fe-t3584-pg{pg}", iters=192, trials=3)
        except Exception as e:
            print(f"polyx-fe-t3584-pg{pg}: FAILED {type(e).__name__}: {e}", flush=True)
    @jax.jit
    def stepf2(i, q):
        out = fused_frontend(i, q, jnp.broadcast_to(aa_bits, (40, 32)), aa_mask,
                             num_taps=DEFAULT_TAPS, sps=4, lag=LAG, tile=3584,
                             compute_dtype="f32", inner="polyx")
        return checksum(out)
    measure(stepf2, "polyx-fe-t3584-pg2", iters=192, trials=3)


if which == "polyx2":
    # round-5: stack-2 polyx sweep (33 slices of (80,.)) + pg knobs
    for tile in (3072, 3584, 3840, 4096):
        @jax.jit
        def stepw(i, q, _t=tile):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, compute_dtype="f32", inner="polyx")
            return checksum(out)
        try:
            measure(stepw, f"polyx2-t{tile}", iters=192, trials=3)
        except Exception as e:
            print(f"polyx2-t{tile}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)



if which == "polyx3":
    # round-5: stack-2 polyx after the group fix (chain = POLY_GROUP//stack)
    for tile, pg in ((3072, None), (3584, 3), (3584, 2), (3840, 3), (4096, 2)):
        tag = f"polyx3-t{tile}" + (f"-pg{pg}" if pg else "")
        @jax.jit
        def stepw(i, q, _t=tile, _pg=pg):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, compute_dtype="f32", inner="polyx",
                                      dev_skip="" if _pg is None else f"pg{_pg}")
            return checksum(out)
        try:
            measure(stepw, tag, iters=192, trials=3)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


if which == "polyx4":
    for tile in (3328, 3456):
        @jax.jit
        def stepw(i, q, _t=tile):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, compute_dtype="f32", inner="polyx")
            return checksum(out)
        try:
            measure(stepw, f"polyx4-t{tile}", iters=192, trials=3)
        except Exception as e:
            print(f"polyx4-t{tile}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)


if which == "pairs":
    # round-5: pair-stacked im2col copies for the bf16 modes
    for dtype, inner, tile in (("bf16x2w", "im2col", 2048), ("bf16x2w", "im2colp", 2048),
                               ("bf16x2w", "im2colp", 3072), ("bf16x2w", "im2colp", 1024)):
        @jax.jit
        def stepw(i, q, _d=dtype, _i=inner, _t=tile):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=_t, compute_dtype=_d, inner=_i)
            return checksum(out)
        try:
            measure(stepw, f"{dtype}-{inner}-t{tile}", iters=192, trials=3)
        except Exception as e:
            print(f"{dtype}-{inner}-t{tile}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)


if which == "pgx":
    # round-5: polyx register-chain group sweep at the shipped tile
    for pg in (3, 4, 5, 6, 8):
        @jax.jit
        def stepw(i, q, _pg=pg):
            out = wideband_scan_fused(i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                                      sps=4, lag=LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                                      tile=3072, compute_dtype="f32", inner="polyx",
                                      dev_skip=f"pg{_pg}")
            return checksum(out)
        try:
            measure(stepw, f"polyx-t3072-pg{pg}", iters=192, trials=3)
        except Exception as e:
            print(f"polyx-t3072-pg{pg}: FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
