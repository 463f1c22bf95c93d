#!/usr/bin/env python3
"""Verdict-latency study for the wideband pipeline (production view).

Throughput (bench.py) answers "can one chip keep up with 80 Msps"; this
tool answers the deployment question behind it: **how stale is a packet
verdict**, and how small can the scan block get before the pipeline
stops beating real time?

Latency of a streaming block pipeline = block air time (the wait to
fill the block) + per-block processing time, with processing hidden
behind the NEXT block's fill once throughput > 1x real time. So the
knobs are block size (air time) and the per-block cost floor. This tool
measures, per block size:

  - pipelined ms/block (value-forced, rotating distinct blocks,
    >=192 dispatches per fetch — the same methodology as bench.py)
  - x real time (air ms / pipelined ms)
  - single-dispatch round trip (dispatch -> fetched verdict; through
    the tunnel this is dominated by the ~27 ms host fetch, which a
    co-located host does not pay — reported for honesty, labeled)
  - steady-state verdict latency estimate = air + pipelined ms/block
    (the co-located-host number that matters in production)

Reference context: the C tool scans half-buffers of 8,192 IQ samples
(~2 ms of 4 Msps air, btle_rx.c:223-238) on one channel. The wideband
TPU pipeline covers all 40 channels at once, so "real time" here is
80 Msps of wideband air.

Usage: python tools/bench_latency.py [--sizes 8192,32768,131072]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="8192,32768,131072",
                    help="CSV of scan_len_ch block sizes (channel-samples)")
    ap.add_argument("--iters", type=int, default=192)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from btle_tpu.rx.pipeline import required_halo
    from btle_tpu.wideband.channelizer import DEFAULT_TAPS
    from btle_tpu.wideband.fused import wideband_scan_fused
    from btle_tpu.wideband.sniffer import CH_LAG, default_scan_tables

    print(f"# devices: {jax.devices()}", file=sys.stderr)

    aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags = \
        default_scan_tables()

    @partial(jax.jit, static_argnames=("n",))
    def gen(k, n):
        ki, kq = jax.random.split(k)
        return (30.0 * jax.random.normal(ki, (n,), jnp.float32),
                30.0 * jax.random.normal(kq, (n,), jnp.float32))

    @jax.jit
    def fold(scalars):
        return sum(scalars)

    halo_ch = required_halo(4, CH_LAG)
    key = jax.random.PRNGKey(0)

    for scan_len_ch in (int(s) for s in args.sizes.split(",")):
        n_wb = (scan_len_ch + halo_ch) * 20
        air_ms = scan_len_ch * 20 / 80e3  # consumed air per block

        blocks = []
        for _ in range(6):
            key, sub = jax.random.split(key)
            blocks.append(jax.block_until_ready(gen(sub, n_wb)))

        @jax.jit
        def step(i, q):
            out = wideband_scan_fused(
                i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                sps=4, lag=CH_LAG, max_candidates=16, num_taps=DEFAULT_TAPS,
                compute_dtype="bf16x2w")
            return sum(leaf.astype(jnp.float32).sum()
                       for leaf in jax.tree_util.tree_leaves(out))

        float(fold([step(*b) for b in blocks[:2]]))  # compile + warm

        # pipelined per-block time (throughput methodology)
        rates = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            scalars = [step(*blocks[k % len(blocks)])
                       for k in range(args.iters)]
            float(fold(scalars))
            rates.append(args.iters / (time.perf_counter() - t0))
        piped_ms = 1000.0 / sorted(rates)[len(rates) // 2]

        # single-dispatch round trip (includes the full host fetch; a
        # co-located host pays only the device time)
        rtts = []
        for k in range(7):
            t0 = time.perf_counter()
            float(step(*blocks[k % len(blocks)]))
            rtts.append((time.perf_counter() - t0) * 1000.0)
        rtt_ms = sorted(rtts)[len(rtts) // 2]

        print(json.dumps({
            "scan_len_ch": scan_len_ch,
            "air_ms": round(air_ms, 2),
            "pipelined_ms_per_block": round(piped_ms, 2),
            "x_real_time": round(air_ms / piped_ms, 2),
            "single_dispatch_rtt_ms": round(rtt_ms, 2),
            "steady_state_verdict_latency_ms": round(air_ms + piped_ms, 2),
        }))


if __name__ == "__main__":
    main()
