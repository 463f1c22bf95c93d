#!/usr/bin/env python3
"""Multi-chip scaling benchmark for the sharded wideband scan.

Measures sustained wideband throughput at several mesh sizes on whatever
devices are attached (a pod slice in production; the CPU virtual mesh
validates the mechanics and the scaling trend) and reports efficiency vs
the 1-device run plus the analytic per-block communication volumes
(ppermute halo over the time axis, psum of the partial DFT over the
channel axis). Inputs are pre-sharded onto the mesh once — the steady
state of a front-end DMAing blocks to their owning device — so the
timing isolates compute + collectives.

  python tools/bench_multichip.py --cpu-devices 8 [--block-wb 655360]
  # multi-host pod: one process per host
  python tools/bench_multichip.py --coordinator host0:1234 \
      --num-processes 4 --process-id $RANK
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def pick_meshes(n_dev):
    """(n_ch, n_time) grids to sweep: one balanced factorization per
    power-of-two device count, plus the pure-channel and pure-time
    extremes at the largest size."""
    sweeps = []
    total = 1
    while total <= n_dev:
        for c in (8, 5, 4, 2, 1):
            if total % c == 0 and 40 % c == 0 and c * c <= total * 4:
                sweeps.append((c, total // c))
                break
        total *= 2
    largest = sweeps[-1][0] * sweeps[-1][1]
    for extreme in ((largest, 1), (1, largest)):
        if extreme[0] <= 8 and 40 % extreme[0] == 0 and extreme not in sweeps:
            sweeps.append(extreme)
    return sweeps


def comm_volumes(scan):
    """Bytes moved by collectives per block per device (I+Q float32)."""
    k = scan.block_wb // 20 + scan.halo_wb // 20  # per-channel samples
    return {
        "halo_ppermute_bytes": 2 * 4 * (scan.halo_wb + scan.num_taps - 1),
        "dft_psum_bytes": 2 * 4 * 40 * k,
    }


def bench_mesh(jax, n_ch, n_time, block_wb, iters, rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from btle_tpu.dist import ShardedWidebandScan, make_mesh

    mesh = make_mesh(n_ch, n_time)
    scan = ShardedWidebandScan(mesh, block_wb=block_wb)
    n = n_time * block_wb
    sh = NamedSharding(mesh, P("time"))
    blocks = []
    for _ in range(4):
        blocks.append(tuple(
            jax.device_put(rng.normal(0, 30, n).astype(np.float32), sh)
            for _ in range(2)
        ))
    run = lambda b: scan.run_placed(b[0], b[1])
    for b in blocks[:2]:
        jax.block_until_ready(run(b))
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(blocks[k % 4]) for k in range(iters)]
        jax.block_until_ready(outs)
        trials.append((time.perf_counter() - t0) / iters)
    dt = sorted(trials)[1]
    return {
        "devices": n_ch * n_time, "mesh": f"{n_ch}x{n_time}",
        "msps": round(n / dt / 1e6, 1),
        "ms_per_block": round(dt * 1e3, 2),
        **comm_volumes(scan),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-wb", type=int, default=655360)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force an N-device virtual CPU mesh (mechanics test)")
    ap.add_argument("--mesh", default=None,
                    help="only this CHxTIME factorization (e.g. 4x2)")
    ap.add_argument("--out", default=None, help="write results JSON here")
    args = ap.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        )
    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")

    from btle_tpu.dist.multihost import init_distributed

    init_distributed(args.coordinator, args.num_processes, args.process_id)
    n_dev = len(jax.devices())

    if args.mesh:
        c, t = args.mesh.split("x")
        meshes = [(int(c), int(t))]
    else:
        meshes = pick_meshes(n_dev)

    results = []
    rng = np.random.default_rng(0)
    base = None
    for n_ch, n_time in meshes:
        row = bench_mesh(jax, n_ch, n_time, args.block_wb, args.iters, rng)
        if base is None and row["devices"] == 1:
            base = row["msps"]
        if base:
            row["scaling_efficiency"] = round(
                row["msps"] / (base * row["devices"]), 3)
        results.append(row)
        print(json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"platform": jax.devices()[0].platform,
                       "host_devices": n_dev,
                       "block_wb": args.block_wb,
                       "results": results}, f, indent=1)
    return results


if __name__ == "__main__":
    main()
