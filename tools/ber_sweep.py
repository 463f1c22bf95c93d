#!/usr/bin/env python3
"""Regenerate the full-depth BER table (BER_CURVES.md data) and assert
the reference anchors.

  python tools/ber_sweep.py [--json out.json] [--seed 11]

Exits nonzero if any ppm anchor exceeds the reference 0.1% criterion.
Runs on whatever JAX backend is available (a few minutes on CPU; ~40 s
on the TPU after compile).
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--phy", default="1m", choices=["1m", "2m"],
                    help="LE PHY framing (2m: 16-bit preamble packets; "
                         "beyond-reference — the C harness is 1M-only)")
    args = ap.parse_args()

    from btle_tpu.sim.ber import BerHarness
    from btle_tpu.sim.sweep import anchors_pass, as_markdown, run_sweep

    t0 = time.perf_counter()
    harness = BerHarness(phy=args.phy) if args.phy != "1m" else None
    points = run_sweep(harness=harness, seed=args.seed, progress=lambda p: print(
        f"ppm {p.ppm:4.0f}  snr {p.snr_db:5.1f}  ber {p.ber:.2e}  "
        f"ok {p.pkts_ok}/{p.packets}", file=sys.stderr))
    dt = time.perf_counter() - t0
    print(as_markdown(points))
    print(f"# sweep: {sum(p.packets for p in points)} packets in {dt:.1f}s",
          file=sys.stderr)
    if args.json:
        with open(args.json, "w") as f:
            json.dump([dataclasses.asdict(p) for p in points], f, indent=1)
    if not anchors_pass(points):
        bad = [p for p in points if not p.anchor_pass]
        print(f"# FAIL: anchors above 0.1%: "
              f"{[(p.ppm, p.snr_db, p.ber) for p in bad]}", file=sys.stderr)
        return 1
    print("# all anchors <= 0.1% BER (reference criterion)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
