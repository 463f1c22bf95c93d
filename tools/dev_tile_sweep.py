"""Dev experiment: f32/poly exact-mode tile sweep at the EXACT bench.py
configuration (131072-ch-sample blocks, 16 candidate slots, 192
dispatches per fetch, median of 5) — hunting the last 4% between the
771 Msps round-3 default (tile 3072) and the 800 Msps target. Rolls per
tile are fixed (~65), so larger tiles amortize them; 4096 exceeds the
16 MB scoped-VMEM limit, leaving the 128-aligned steps in between.

Usage: python tools/dev_tile_sweep.py [tile ...]  (default 3072 3328 3584 3840)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from functools import partial

    from btle_tpu.rx.pipeline import required_halo
    from btle_tpu.wideband.channelizer import DEFAULT_TAPS
    from btle_tpu.wideband.fused import wideband_scan_fused
    from btle_tpu.wideband.sniffer import CH_LAG, default_scan_tables

    scan_len_ch = 131072
    max_candidates = 16
    n_wb = (scan_len_ch + required_halo(4, CH_LAG)) * 20
    aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags = default_scan_tables()

    @partial(jax.jit, static_argnames=("n",))
    def gen(k, n):
        ki, kq = jax.random.split(k)
        return (30.0 * jax.random.normal(ki, (n,), jnp.float32),
                30.0 * jax.random.normal(kq, (n,), jnp.float32))

    key = jax.random.PRNGKey(0)
    blocks = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        blocks.append(jax.block_until_ready(gen(sub, n_wb)))

    @jax.jit
    def fold(scalars):
        return sum(scalars)

    def measure(tile):
        @jax.jit
        def step(i, q):
            out = wideband_scan_fused(
                i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                sps=4, lag=CH_LAG, max_candidates=max_candidates,
                num_taps=DEFAULT_TAPS, compute_dtype="f32", tile=tile)
            return sum(leaf.astype(jnp.float32).sum()
                       for leaf in jax.tree_util.tree_leaves(out))
        t0 = time.perf_counter()
        try:
            float(fold([step(*b) for b in blocks[:2]]))
        except Exception as e:
            print(f"t{tile}: COMPILE FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return
        print(f"t{tile}: compile+warm {time.perf_counter()-t0:.0f}s",
              flush=True)
        iters, rates = 192, []
        for _ in range(5):
            t0 = time.perf_counter()
            scalars = [step(*blocks[k % len(blocks)]) for k in range(iters)]
            float(fold(scalars))
            rates.append(iters / (time.perf_counter() - t0))
        med = sorted(rates)[len(rates) // 2]
        msps = scan_len_ch * 20 * med / 1e6
        print(f"t{tile}: ms/block "
              + ", ".join(f"{1000/r:.2f}" for r in rates)
              + f" | median {1000/med:.2f} ms -> {msps:.0f} Msps "
              f"({msps/800:.2f}x)", flush=True)

    tiles = [int(a) for a in sys.argv[1:]] or [3072, 3328, 3584, 3840]
    for t in tiles:
        measure(t)


if __name__ == "__main__":
    main()
