#!/usr/bin/env python3
"""Compile an IEEE OUI registry snapshot into the bundled database.

Reads any of: the IEEE oui.txt ("XX-XX-XX   (hex)  Vendor"), a tsv of
"PREFIX<TAB>Vendor" (prefix with or without colons, optionally .gz —
e.g. the registry snapshot other BLE tools bundle), or our own output.
Writes btle_tpu/cli/data/oui.tsv.gz: one "AA:BB:CC<TAB>Vendor" line per
assignment, colon-normalized, deduplicated, sorted — the offline vendor
registry behind cli.vendors.oui_lookup.

  python tools/build_oui_db.py <source> [--out btle_tpu/cli/data/oui.tsv.gz]
"""

import argparse
import gzip
import os
import re
import sys

_IEEE_LINE = re.compile(r"^([0-9A-Fa-f]{2})-([0-9A-Fa-f]{2})-([0-9A-Fa-f]{2})"
                        r"\s+\(hex\)\s+(.+)$")


def parse_source(path: str) -> dict[str, str]:
    opener = gzip.open if path.endswith(".gz") else open
    table: dict[str, str] = {}
    with opener(path, "rt", errors="replace") as fh:
        for line in fh:
            line = line.rstrip("\n")
            m = _IEEE_LINE.match(line)
            if m:
                prefix = ":".join(p.upper() for p in m.groups()[:3])
                table[prefix] = m.group(4).strip()
                continue
            if "\t" in line:
                raw, vendor = line.split("\t", 1)
                raw = raw.strip().upper().replace("-", ":")
                hexonly = raw.replace(":", "")
                if len(hexonly) >= 6 and all(
                        c in "0123456789ABCDEF" for c in hexonly[:6]):
                    prefix = ":".join(
                        hexonly[k:k + 2] for k in (0, 2, 4))
                    table[prefix] = vendor.strip()
    return table


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="IEEE oui.txt or PREFIX\\tVendor tsv(.gz)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "btle_tpu", "cli", "data",
        "oui.tsv.gz"))
    args = ap.parse_args()

    table = parse_source(args.source)
    if not table:
        print(f"no assignments parsed from {args.source}", file=sys.stderr)
        return 1
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with gzip.open(args.out, "wt", encoding="utf-8") as fh:
        for prefix in sorted(table):
            fh.write(f"{prefix}\t{table[prefix]}\n")
    print(f"{len(table)} OUI assignments -> {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
