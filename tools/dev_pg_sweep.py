"""Dev experiment: poly-inner register-group size (pgN) and stage skips
at the tile-3584 geometry, frontend-only, 192-dispatch folds. A/B
deltas between configs are floor-immune (see CLAUDE.md measurement
notes); absolute numbers include the harness floor.

Usage: python tools/dev_pg_sweep.py [labels...]
labels default: pg8 pg12 pg16 aaskip magskip  (all at tile 3584, f32/poly)
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from btle_tpu.rx.pipeline import required_halo
    from btle_tpu.spec import bits as B
    from btle_tpu.wideband.channelizer import DEFAULT_TAPS
    from btle_tpu.wideband.fused import fused_frontend
    from btle_tpu.wideband.sniffer import CH_LAG

    scan_len_ch = 131072
    n_wb = (scan_len_ch + required_halo(4, CH_LAG)) * 20
    aa_rows = jnp.broadcast_to(jnp.asarray(B.hex_to_bits("d6be898e")),
                               (40, 32))
    aa_mask = jnp.asarray(np.ones(32, np.int8))

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

    def measure(label, tile=3584, dev_skip=""):
        @jax.jit
        def step(i, q):
            out = fused_frontend(i, q, aa_rows, aa_mask,
                                 num_taps=DEFAULT_TAPS, sps=4, lag=CH_LAG,
                                 tile=tile, compute_dtype="f32",
                                 inner="poly", dev_skip=dev_skip)
            return sum(leaf.astype(jnp.float32).sum() for leaf in out)
        t0 = time.perf_counter()
        try:
            float(fold([step(*b) for b in blocks[:2]]))
        except Exception as e:
            print(f"{label}: COMPILE FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            return
        print(f"{label}: compile+warm {time.perf_counter()-t0:.0f}s",
              flush=True)
        iters, rates = 192, []
        for _ in range(5):
            t0 = time.perf_counter()
            scalars = [step(*blocks[k % len(blocks)]) for k in range(iters)]
            float(fold(scalars))
            rates.append(iters / (time.perf_counter() - t0))
        med = sorted(rates)[len(rates) // 2]
        print(f"{label}: ms/block "
              + ", ".join(f"{1000/r:.2f}" for r in rates)
              + f" | median {1000/med:.2f} ms", flush=True)

    labels = sys.argv[1:] or ["pg8", "pg12", "pg16", "aaskip", "magskip"]
    for lb in labels:
        if lb.startswith("pg"):
            measure(f"fe-t3584-{lb}", dev_skip=lb if lb != "pg8" else "")
        elif lb == "aaskip":
            measure("fe-t3584-noaa", dev_skip="aa")
        elif lb == "magskip":
            measure("fe-t3584-nomag", dev_skip="mag")
        elif lb.startswith("t"):
            measure(f"fe-{lb}", tile=int(lb[1:]))


if __name__ == "__main__":
    main()
