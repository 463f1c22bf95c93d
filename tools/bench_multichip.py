#!/usr/bin/env python3
"""Multi-chip scaling benchmark for the sharded wideband scan.

Measures sustained wideband throughput at several mesh sizes on whatever
devices are attached (a pod slice in production; the CPU virtual mesh
just validates the mechanics) and reports scaling efficiency vs the
1-device run. On a multi-host pod, run one process per host with
--coordinator/--num-processes/--process-id.

  python tools/bench_multichip.py [--block-wb 655360] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-wb", type=int, default=655360)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force an N-device virtual CPU mesh (mechanics test)")
    args = ap.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        )
    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    from btle_tpu.dist import ShardedWidebandScan, make_mesh
    from btle_tpu.dist.multihost import init_distributed

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    n_dev = len(jax.devices())

    results = []
    configs = []
    for total in (1, 2, 4, 8, 16, 32):
        if total > n_dev:
            break
        # prefer a balanced (ch, time) factorization with ch dividing 40
        best = (1, total)
        for c in (8, 5, 4, 2, 1):
            if total % c == 0 and 40 % c == 0 and c <= total // c * 4:
                best = (c, total // c)
                break
        configs.append(best)

    base_msps = None
    rng = np.random.default_rng(0)
    for n_ch, n_time in configs:
        mesh = make_mesh(n_ch, n_time)
        scan = ShardedWidebandScan(mesh, block_wb=args.block_wb)
        n = n_time * args.block_wb
        data = [(rng.normal(0, 30, n).astype(np.float32),
                 rng.normal(0, 30, n).astype(np.float32)) for _ in range(4)]
        for d in data[:2]:
            jax.block_until_ready(scan(*d))
        t0 = time.perf_counter()
        outs = [scan(*data[k % 4]) for k in range(args.iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / args.iters
        msps = n / dt / 1e6
        if base_msps is None:
            base_msps = msps
        eff = msps / (base_msps * n_ch * n_time)
        results.append({
            "devices": n_ch * n_time, "mesh": f"{n_ch}x{n_time}",
            "msps": round(msps, 1), "scaling_efficiency": round(eff, 3),
        })
        print(json.dumps(results[-1]))
    return results


if __name__ == "__main__":
    main()
