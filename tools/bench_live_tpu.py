"""Live-chain benchmark: wire ingest -> ring -> pipelined scans -> NDJSON.

Measures the FULL deployed loop (runtime.IqRingBuffer + WidebandStreamRunner
.run_live) on the attached TPU at the production block size: a producer
thread writes int16 IQ into the native ring at a target wire rate while
the live loop consumes, scans and emits. Reports sustained Msps, ring
drops, packets decoded, and the steady-state per-block walltime — the
figure PERF.md's "live loop" row records.

Two producer modes:
  --rate 80     paced at the real wideband wire rate (the deployability
                criterion: zero ring drops = the chain keeps up live)
  --rate 0      unpaced (as fast as the consumer drains: the capacity)

Through this container's tunnel every consumed block pays a ~27 ms host
result fetch; pipeline depth 2 overlaps it with the next block's device
compute, so the loop is fetch-bound at ~1 block/RTT — a co-located host
pays ~0.1 ms instead (bench.py measures the device-side capacity at
192-dispatch folds). Both numbers are real; this tool measures the
deployed-loop one.

Usage: python tools/bench_live_tpu.py [--rate 80] [--seconds 20]
       [--phy 2m] [--pipeline 2] [--block 131072]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rate", type=float, default=80.0,
                    help="producer wire rate in Msps (0 = unpaced)")
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--phy", default="1m", choices=["1m", "2m"])
    ap.add_argument("--pipeline", type=int, default=2)
    ap.add_argument("--block", type=int, default=131072,
                    help="scan_len_ch (channel samples per block)")
    ap.add_argument("--dtype", default="bf16x2w")
    ap.add_argument("--xla", action="store_true",
                    help="XLA pipeline instead of fused (CPU smoke runs)")
    args = ap.parse_args()

    import jax

    from btle_tpu import runtime
    from btle_tpu.tx import parse_descriptor
    from btle_tpu.tx.synth import scene_to_wideband
    from btle_tpu.wideband import WidebandConfig, WidebandSniffer
    from btle_tpu.wideband.stream import WidebandStreamRunner

    print("devices:", jax.devices(), flush=True)
    assert runtime.available(), "native runtime required"

    cfg = WidebandConfig(scan_len_ch=args.block, fused=not args.xla,
                         fused_dtype=args.dtype, phy=args.phy)
    sn = WidebandSniffer(cfg)
    print("selftest:", sn.selftest(), flush=True)

    # a ~0.5 s scene buffer the producer cycles through: a few packets
    # per block so the decode path does real work
    n_scene = 8 * cfg.scan_len_ch * 20
    rng = np.random.default_rng(5)
    placed = []
    step = n_scene // 24
    for k in range(24):
        ch = int(rng.integers(0, 40))
        payload = rng.integers(0, 256, 12, dtype=np.uint8)
        if ch in (37, 38, 39):
            d = (f"{ch}-ADV_NONCONN_IND-TxAdd-0-RxAdd-0"
                 f"-AdvA-{bytes(payload[:6]).hex()}"
                 f"-AdvData-{bytes(payload[6:]).hex()}-Space-1")
        else:
            d = (f"{ch}-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0"
                 f"-DATA-{bytes(payload).hex()}-CRCInit-555555-Space-1")
        spec = parse_descriptor(d)
        if args.phy == "2m":
            spec = spec.to_2m()
        placed.append((spec, 20_000 + step * k))
    wi, wq = scene_to_wideband(placed, n_scene, noise_std=2.0, seed=5)
    inter = np.empty(2 * n_scene, np.int16)
    inter[0::2] = np.clip(np.round(wi), -32768, 32767)
    inter[1::2] = np.clip(np.round(wq), -32768, 32767)

    ring = runtime.IqRingBuffer(1 << 25)           # 32 M pairs
    stop = {"v": False}
    produced = {"pairs": 0}

    def producer():
        chunk_pairs = 1 << 20
        t0 = time.perf_counter()
        off = 0
        while not stop["v"]:
            if args.rate > 0:
                target = (time.perf_counter() - t0) * args.rate * 1e6
                if produced["pairs"] > target:
                    time.sleep(0.002)
                    continue
            end = min(off + chunk_pairs, n_scene)
            ring.write(inter[2 * off : 2 * end], "i16")
            produced["pairs"] += end - off
            off = end % n_scene
        produced["t"] = time.perf_counter() - t0

    runner = WidebandStreamRunner(sn)
    th = threading.Thread(target=producer, daemon=True)

    deadline = time.monotonic() + args.seconds

    def should_stop():
        return time.monotonic() >= deadline

    # warm the compiled program before timing (first compile is minutes
    # through the tunnel and would otherwise fill the ring with drops);
    # warm with the SAME int16 dtype the ring path dispatches
    warm = np.zeros(sn.wb_block_len, np.int16)
    sn.process(warm, warm)
    th.start()
    stats = runner.run_live(ring, should_stop=should_stop,
                            pipeline=args.pipeline, scale=1.0)
    stop["v"] = True
    th.join(timeout=5)

    blocks = stats.blocks
    ms_per_block = 1000.0 * stats.wall_s / max(1, blocks)
    air_ms = args.block / 4000.0
    print(f"phy={args.phy} dtype={args.dtype} block={args.block} "
          f"pipeline={args.pipeline} rate={args.rate}Msps", flush=True)
    print(f"blocks={blocks} packets={stats.packets} (crc_ok={stats.crc_ok}) "
          f"truncate_rescans={stats.truncate_rescans}", flush=True)
    print(f"consumed {stats.samples_wb/1e6:.1f} Ms in {stats.wall_s:.2f} s "
          f"= {stats.msps:.1f} Msps sustained "
          f"({stats.msps/80:.2f}x the 80 Msps wire rate)", flush=True)
    print(f"per-block wall {ms_per_block:.1f} ms vs {air_ms:.1f} ms air; "
          f"ring drops {stats.dropped_pairs} "
          f"(producer wrote {produced['pairs']/1e6:.1f} M pairs)", flush=True)
    verdict = (stats.dropped_pairs == 0 and stats.msps >= min(
        args.rate if args.rate > 0 else 80, 80) * 0.99)
    print("RESULT:", "PASS (keeps up live)" if verdict else "BELOW WIRE RATE",
          flush=True)


if __name__ == "__main__":
    main()
