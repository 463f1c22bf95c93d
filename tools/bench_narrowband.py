#!/usr/bin/env python3
"""Honest single-channel scan throughput (BASELINE config 1 path).

Dense demod + AA correlation + candidate decode over 1M-sample int16
blocks, value-forced timing (outputs checksummed in-graph, one host
fetch per batch — see PERF.md round-2 measurement notes).

  python tools/bench_narrowband.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from btle_tpu.rx.pipeline import decode_block
    from btle_tpu.spec import bits as B
    from btle_tpu.spec import crc24 as C
    from btle_tpu.spec import whitening as W

    n = 1 << 20
    aa_bits = jnp.asarray(B.hex_to_bits("d6be898e"))
    aa_mask = jnp.asarray(np.ones(32, np.int8))
    whiten = jnp.asarray(W.whitening_bits(37, 336))
    crc_init = jnp.int32(C.lfsr_init_to_table_init("555555"))

    @partial(jax.jit, static_argnames=("nn",))
    def gen(k, nn):
        ki, kq = jax.random.split(k)
        mk = lambda kk: jax.random.randint(kk, (nn,), -90, 90, jnp.int32
                                           ).astype(jnp.int16)
        return mk(ki), mk(kq)

    key = jax.random.PRNGKey(0)
    blocks = []
    for _ in range(6):
        key, sub = jax.random.split(key)
        blocks.append(jax.block_until_ready(gen(sub, n)))

    @jax.jit
    def step(i, q):
        out = decode_block(i, q, aa_bits, aa_mask, whiten, crc_init,
                           jnp.asarray(True), sps=4, lag=1,
                           max_candidates=64)
        return sum(leaf.astype(jnp.float32).sum()
                   for leaf in jax.tree_util.tree_leaves(out))

    @jax.jit
    def fold(xs):
        return sum(xs)

    float(fold([step(*b) for b in blocks[:2]]))
    iters = 48
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        scalars = [step(*blocks[k % len(blocks)]) for k in range(iters)]
        float(fold(scalars))
        trials.append((time.perf_counter() - t0) / iters)
    med = sorted(trials)[1]
    print(f"narrowband scan: {med*1e3:.3f} ms per {n} samples "
          f"-> {n/med/1e6:.0f} Msps ({n/med/4e6:.0f}x real time at 4 Msps)")


if __name__ == "__main__":
    main()
