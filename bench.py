"""Benchmark: sustained wideband 40-channel sniffing throughput per chip.

Prints one JSON line:
  {"metric": "wideband_iq_msps_per_chip", "value": <Msamples/s>,
   "unit": "Msps", "vs_baseline": <value / 800>}

The measured program is the full per-chip receive path of BASELINE
config 4: 80 Msps wideband IQ -> polyphase channelizer -> 40 parallel
demod/AA-correlate/de-whiten/CRC chains -> candidate arrays. Real time
is 80 Msps; the baseline target is 10x real time (800 Msps), so
vs_baseline >= 1.0 means the target is met.

Measurement honesty (round-2 fix): on the tunneled device,
jax.block_until_ready can return before execution completes, which made
round-1 numbers (10-47 Gsps) measure the dispatch rate, not the device.
Every block's FULL output tree is therefore checksummed inside the
compiled program and the per-trial batch is reduced to ONE scalar whose
host fetch forces every underlying execution; input blocks are distinct
and generated on device (a live front-end DMAs blocks into device
memory; host<->device transfer is not the metric).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from btle_tpu.wideband.channelizer import DEFAULT_TAPS
    from btle_tpu.wideband.fused import wideband_scan_fused
    from btle_tpu.wideband.sniffer import (CH_LAG, default_scan_tables,
                                           wideband_scan)

    # 131072 channel-samples per block (~33 ms of air) amortizes dispatch
    # overhead; 16 candidate slots per channel per block is the
    # production default (WidebandConfig.max_candidates — slot overflow
    # falls back to the sniffer's rescan path).
    from btle_tpu.rx.pipeline import required_halo

    scan_len_ch = 131072
    max_candidates = 16
    halo_ch = required_halo(4, CH_LAG)  # matches sniffer/dist block geometry
    n_wb = (scan_len_ch + halo_ch) * 20

    aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags = \
        default_scan_tables()

    from functools import partial

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

    def make_step(scan_fn, **kw):
        @jax.jit
        def step(i, q):
            out = scan_fn(
                i, q, aa_bits, aa_mask, whiten_rows, crc_inits, adv_flags,
                sps=4, lag=CH_LAG, max_candidates=max_candidates,
                num_taps=DEFAULT_TAPS, **kw,
            )
            # checksum EVERY output so no stage is dead-code-eliminated
            return sum(leaf.astype(jnp.float32).sum()
                       for leaf in jax.tree_util.tree_leaves(out))
        return step

    @jax.jit
    def fold(scalars):
        return sum(scalars)

    # Production path: the fused Pallas front end (wideband.fused). The
    # XLA path is the fallback if the Pallas kernel cannot compile on
    # this backend (e.g. CPU-only environments).
    import sys

    # production mode: fused Pallas pipeline with the bf16 hi/lo
    # weight pair — exact-ish filter response (~-96 dB), bf16
    # operands (exact for int8 SDR sources). See PERF.md for the
    # dynamic-range / throughput ladder incl. the HIGHEST-precision
    # f32 mode. The remote TPU compile helper occasionally returns a
    # transient HTTP 500 — retry once before concluding the Pallas
    # path is genuinely unavailable (a silent one-off flake would
    # otherwise record the much slower XLA fallback as the metric).
    path = "fused-bf16x2w"
    step = make_step(wideband_scan_fused, compute_dtype="bf16x2w")
    has_accel = any(d.platform != "cpu" for d in jax.devices())
    for attempt in (1, 2):
        try:
            float(fold([step(*b) for b in blocks[:2]]))  # compile + warm
            break
        except Exception as e:  # pragma: no cover - fallback path
            if attempt == 1 and has_accel:
                # only worth retrying where the failure can BE transient
                # (the remote compile helper); CPU-only failures are
                # deterministic — fall back immediately
                print(f"# fused compile failed once ({type(e).__name__}); "
                      "retrying", file=sys.stderr)
                time.sleep(5)
                continue
            print(f"# fused front end unavailable ({type(e).__name__}); "
                  "falling back to the XLA pipeline", file=sys.stderr)
            path = "xla"
            step = make_step(wideband_scan)
            float(fold([step(*b) for b in blocks[:2]]))
            break

    # timed: async pipeline over rotating distinct blocks; each trial is
    # forced by ONE host fetch of the folded checksum (the ~27 ms tunnel
    # fetch amortizes to ~0.14 ms/block at 192 dispatches — production
    # streaming overlaps result fetches with the next blocks' compute).
    # Median of 5 trials absorbs tunnel/scheduler jitter.
    iters = 192
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        scalars = [step(*blocks[k % len(blocks)]) for k in range(iters)]
        float(fold(scalars))
        rates.append(iters / (time.perf_counter() - t0))
    samples_per_block = scan_len_ch * 20  # territory actually consumed
    msps = samples_per_block * sorted(rates)[len(rates) // 2] / 1e6

    # regression-track the exact-f32 parity mode alongside the headline
    # (round-5 "polyx" stacked-slice inner, 806 Msps = 1.01x the target
    # on v5e — the first parity-mode configuration at >= 1.0x; see
    # PERF.md) — a parity-mode slowdown should be as visible run-to-run
    # as a headline one. Skipped on the XLA fallback path (no second
    # kernel config exists there).
    parity = {}
    if path != "xla":
        pstep = make_step(wideband_scan_fused, compute_dtype="f32")
        try:
            float(fold([pstep(*b) for b in blocks[:2]]))
            prates = []
            for _ in range(5):
                t0 = time.perf_counter()
                scalars = [pstep(*blocks[k % len(blocks)])
                           for k in range(iters)]
                float(fold(scalars))
                prates.append(iters / (time.perf_counter() - t0))
            pmsps = samples_per_block * sorted(prates)[len(prates) // 2] / 1e6
            parity = {"parity_msps": round(pmsps, 1),
                      "parity_vs_baseline": round(pmsps / 800.0, 3),
                      "parity_path": "fused-f32-polyx"}
        except Exception as e:  # pragma: no cover - keep the headline
            print(f"# parity-mode measurement unavailable "
                  f"({type(e).__name__})", file=sys.stderr)

    # "path" distinguishes the fused-Pallas production pipeline from the
    # XLA fallback in the recorded metric (a silent Pallas compile
    # regression would otherwise be indistinguishable from a slow run).
    print(json.dumps({
        "metric": "wideband_iq_msps_per_chip",
        "value": round(msps, 1),
        "unit": "Msps",
        "vs_baseline": round(msps / 800.0, 3),
        "path": path,
        **parity,
    }))


if __name__ == "__main__":
    main()
