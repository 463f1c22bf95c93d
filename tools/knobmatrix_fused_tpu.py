#!/usr/bin/env python3
"""Hardware knob-matrix validation of the fused wideband pipeline.

Sweeps the fused-kernel configuration space — compute_dtype x inner x
time tile (default and one step either side) x decode path x AA_GRP —
through `fused_selftest()` ON THE ATTACHED BACKEND and writes a JSON
matrix artifact (KNOBMATRIX.json). This automates the class of check
that caught the AA_GRP=4 miscompile (a config that passes interpret
mode but decodes ZERO packets on the physical chip, wideband/fused.py
AA_GRP note): every knob someone might flip is known-answer-validated
by a tool, not by memory.

Each configuration costs one remote compile (~30 s-6 min through this
container's tunnel), so the default --quick set covers the shipped
modes, their decode variants and the known-bad AA_GRP=4 pin; --full
adds the tile steps and the non-default dtype/inner combinations.

Exit code 0 iff every config EXPECTED to work passes. Known-bad configs
(AA_GRP=4 on hardware) are recorded, never gate — if one starts
passing, the JSON says so and the pin can be re-examined.

Usage: python tools/knobmatrix_fused_tpu.py [--full] [--out KNOBMATRIX.json]
       (requires an attached TPU; --interpret forces interpret mode for
        a CPU smoke run of the tool itself)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def config_matrix(full: bool):
    """(label, dict(compute_dtype, inner, tile, decode, aa_grp), expected)

    expected: "pass" = must pass (gates exit code), "known_bad" =
    recorded only (the AA_GRP=4 hardware miscompile pin).
    """
    from btle_tpu.wideband.fused import _default_tile

    def t(dtype, inner):
        return _default_tile(dtype, inner)

    cfgs = []

    def add(dtype, inner, tile, decode="pallas", aa_grp=8, expected="pass",
            phy="1m", cutoff=None):
        label = f"{dtype}/{inner}/t{tile}/{decode}/grp{aa_grp}" + (
            "" if phy == "1m" else f"/{phy}") + (
            "" if cutoff is None else f"/c{cutoff}")
        cfg = dict(compute_dtype=dtype, inner=inner, tile=tile,
                   decode=decode, aa_grp=aa_grp, phy=phy)
        if cutoff is not None:
            cfg["cutoff_mhz"] = cutoff
        cfgs.append((label, cfg, expected))

    # the two shipped modes (library default + bench mode), both decode
    # paths, plus the known-bad AA_GRP=4 pin on each. "polyx" (stacked
    # slices) is the round-5 exact-f32 default inner (806 Msps = 1.01x).
    add("f32", "polyx", t("f32", "polyx"))
    add("f32", "polyx", t("f32", "polyx"), decode="xla")
    add("bf16x2w", "im2col", t("bf16x2w", "im2col"))
    add("bf16x2w", "im2col", t("bf16x2w", "im2col"), decode="xla")
    add("f32", "polyx", t("f32", "polyx"), aa_grp=4, expected="known_bad")
    add("bf16x2w", "im2col", t("bf16x2w", "im2col"), aa_grp=4,
        expected="known_bad")
    # LE 2M wideband (sps=2 per channel, phy-aware 1.2 MHz prototype via
    # fused_selftest's cutoff resolution) — hardware-validated round 4/5
    add("bf16x2w", "im2col", t("bf16x2w", "im2col"), phy="2m")
    add("f32", "polyx", t("f32", "polyx"), phy="2m")
    # the 2M sensitivity-optimized filter option (CUTOFF_MHZ_2M_SENS)
    add("bf16x2w", "im2col", t("bf16x2w", "im2col"), phy="2m", cutoff=1.2)
    # round-4 exact-f32 default (kept as a supported non-default mode)
    add("f32", "poly", t("f32", "poly"))
    # round-5: dual hi/lo operand/weight split (all-MXU slot-exact form;
    # measured slower than polyx — kept as a validated non-default mode)
    add("f32x2", "im2col", t("f32x2", "im2col"))

    if full:
        # tile one step either side of each shipped default: recorded,
        # never gating — the above-default step is expected to hit the
        # 16 MB scoped-VMEM compile limit (fused._default_tile notes),
        # and that boundary moving is information, not a failure
        for dtype, inner in (("f32", "poly"), ("bf16x2w", "im2col")):
            d = t(dtype, inner)
            for tile in (d - 1024, d + 1024):
                if tile >= 1024:
                    add(dtype, inner, tile, expected="info")
        # non-default combinations someone could reasonably deploy
        add("bf16", "im2col", t("bf16", "im2col"))
        add("bf16x2w", "im2colp", t("bf16x2w", "im2colp"))
        add("bf16", "poly", t("bf16", "poly"))
        add("f32", "im2col", t("f32", "im2col"))
        add("f32", "polyroll", t("f32", "polyroll"))
        add("f32", "poly", t("f32", "poly"), phy="2m")
    return cfgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="add tile steps + non-default dtype/inner combos")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "KNOBMATRIX.json"))
    ap.add_argument("--interpret", action="store_true",
                    help="force interpret mode (CPU smoke run of the tool)")
    args = ap.parse_args()

    import jax

    from btle_tpu.wideband import fused
    from btle_tpu.wideband.selftest import WidebandSelfTestError, fused_selftest

    backend = jax.default_backend()
    print(f"backend: {backend}, devices: {jax.devices()}", flush=True)
    if backend not in ("tpu", "axon") and not args.interpret:
        print("no TPU attached — pass --interpret for a CPU smoke run",
              flush=True)
        return 2

    rows = []
    failures = 0
    grp0 = fused.AA_GRP
    for label, cfg, expected in config_matrix(args.full):
        aa_grp = cfg.pop("aa_grp")
        t0 = time.time()
        status, detail = "pass", ""
        try:
            # AA_GRP is a module-level lowering constant (not a jit
            # static arg): swap it and clear the jit caches so the
            # kernel retraces with the new group size
            if fused.AA_GRP != aa_grp:
                fused.AA_GRP = aa_grp
                jax.clear_caches()
            fused_selftest(interpret=args.interpret, **cfg)
        except WidebandSelfTestError as e:
            status, detail = "selftest_fail", str(e)[:400]
        except Exception as e:  # compile errors (VMEM, Mosaic) land here
            status, detail = "error", f"{type(e).__name__}: {str(e)[:400]}"
        finally:
            if fused.AA_GRP != grp0:
                fused.AA_GRP = grp0
                jax.clear_caches()
        dt = time.time() - t0
        row = {"config": label, "expected": expected, "status": status,
               "seconds": round(dt, 1)}
        if detail:
            row["detail"] = detail
        rows.append(row)
        gate = expected == "pass" and status != "pass"
        failures += gate
        print(f"{'FAIL' if gate else 'ok  '} {label:38s} {status:13s} "
              f"{dt:6.1f}s", flush=True)

    out = {
        "backend": backend,
        "interpret": args.interpret,
        "full": args.full,
        "head": os.popen("git -C %s rev-parse --short HEAD" %
                         os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__)))).read().strip(),
        "results": rows,
        "gate_failures": failures,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(args.out)}", flush=True)
    print("RESULT:", "PASS" if failures == 0 else f"FAIL ({failures})",
          flush=True)
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
