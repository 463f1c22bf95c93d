#!/usr/bin/env python3
"""Dense-traffic hardware soak of the fused wideband pipeline.

Synthesizes a sustained multi-channel BLE airspace — hundreds of packets
with known payloads spread over all 40 channels and the whole capture —
streams it block-by-block through WidebandSniffer on the attached
backend, and asserts every injected packet decodes byte-exactly. This is
the scaled-up version of wideband/selftest.py's known-answer gate: the
selftest proves the deployed kernel decodes ONE scene; the soak proves
sustained decode correctness under production traffic density (the
reference's analog is its live phone-in-the-room test, README.md:33-55).

Usage:  python tools/soak_fused_tpu.py [--seconds 0.25] [--packets 150]
        [--dtype bf16x2w|f32|xla] [--seed 0]

Exit code 0 = every packet decoded byte-exactly; 1 otherwise.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=0.25,
                    help="airspace duration (80 Msps wideband)")
    ap.add_argument("--packets", type=int, default=150)
    ap.add_argument("--dtype", default="bf16x2w",
                    choices=["bf16x2w", "f32", "xla"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    print("devices:", jax.devices(), flush=True)

    from btle_tpu.spec import bits as B
    from btle_tpu.tx import parse_descriptor_sequence
    from btle_tpu.tx.synth import burst_num_samples, scene_to_wideband
    from btle_tpu.wideband import WidebandConfig, WidebandSniffer

    rng = np.random.default_rng(args.seed)
    n_wb = int(args.seconds * 80_000_000)

    # One packet = a real descriptor (ADV_NONCONN_IND on 37/38/39, LL_DATA
    # keyed to the default scan AA elsewhere), synthesized and composed by
    # the SHIPPED TX path (tx.synth.scene_to_wideband — the same code
    # `tx --wideband-out` runs). Packets are spread uniformly over channels
    # and time with per-channel spacing that guarantees no intra-channel
    # overlap (AA+PDU span at 4 Msps < 2000 ch-samples for 37-byte
    # payloads; keep >= 4000 ch-samples = 80k wb-samples apart).
    t0 = time.time()
    placed_specs = []    # (PacketSpec, offset_wb)
    injected = []        # (channel, offset_wb, pdu_bytes)
    per_ch_next = {}
    placed = 0
    attempts = 0
    while placed < args.packets and attempts < args.packets * 20:
        attempts += 1
        ch = int(rng.integers(0, 40))
        if ch in (37, 38, 39):
            n_payload = int(rng.integers(6, 38))
            payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
            desc = (f"{ch}-ADV_NONCONN_IND-TxAdd-0-RxAdd-0"
                    f"-AdvA-{bytes(payload[:6]).hex()}"
                    f"-AdvData-{bytes(payload[6:]).hex()}-Space-1")
        else:
            n_payload = int(rng.integers(1, 32))
            payload = rng.integers(0, 256, n_payload, dtype=np.uint8)
            desc = (f"{ch}-LL_DATA-AA-8E89BED6-LLID-1-NESN-0-SN-0-MD-0"
                    f"-DATA-{bytes(payload).hex()}-CRCInit-555555-Space-1")
        (spec,), _ = parse_descriptor_sequence([desc])
        span_wb = burst_num_samples(spec) + 80_000
        off = int(rng.integers(0, max(1, n_wb - span_wb)))
        lo = per_ch_next.get(ch, 0)
        if off < lo:
            off = lo
        if off + span_wb >= n_wb:
            continue
        per_ch_next[ch] = off + span_wb
        placed_specs.append((spec, off))
        injected.append((ch, off,
                         bytes(B.bits_to_bytes(spec.info_bits[40:]))))
        placed += 1
    # light noise floor so ties are not degenerate zeros
    wi, wq = scene_to_wideband(placed_specs, n_wb, noise_std=0.01,
                               seed=args.seed)
    print(f"synthesized {placed} packets over {args.seconds}s of airspace "
          f"({time.time()-t0:.1f}s)", flush=True)

    cfg = WidebandConfig(fused=args.dtype != "xla",
                         fused_dtype=args.dtype if args.dtype != "xla" else "f32")
    sn = WidebandSniffer(cfg)
    t0 = time.time()
    pkts = sn.run(wi, wq)
    dt = time.time() - t0
    got = {}
    for p in pkts:
        if p.crc_ok:
            got.setdefault((p.channel, bytes(p.pdu_bytes)), []).append(
                p.sample_pos)

    missing = []
    for ch, off, pdu in injected:
        if (ch, pdu) not in got:
            missing.append((ch, off, pdu.hex()))
    extra_crc_ok = sum(len(v) for v in got.values()) - (placed - len(missing))
    print(f"decoded {placed - len(missing)}/{placed} injected packets "
          f"(+{extra_crc_ok} duplicate/extra CRC-OK) in {dt:.1f}s host "
          f"wall-clock ({n_wb/dt/1e6:.0f} Msps incl. per-block host "
          f"round trips; bench.py measures the pipelined device rate)",
          flush=True)
    if sn.truncated_channels:
        print(f"note: {sn.truncated_channels} slot-exhaustion rescans",
              flush=True)
    for m in missing[:10]:
        print("MISSING", m, flush=True)
    print("RESULT:", "PASS" if not missing else f"FAIL ({len(missing)})",
          flush=True)
    return 0 if not missing else 1


if __name__ == "__main__":
    raise SystemExit(main())
