#!/usr/bin/env python
"""Compare two bench.py output files entry by entry.

Usage: python scratch/bench_agree.py runA.out runB.out [tol]

Loads the single JSON line from each file, joins headline queries and
extras (skipping :spread companions and -1.0 failure markers), prints
per-entry (a, b, ratio) and flags entries outside ±tol (default 0.30) —
the VERDICT r6 item-2 done-criterion: two consecutive full bench runs
agree within ±30% on every probe entry, or the JSON exposes spread.
Exit 0 = all inside tolerance.
"""

import json
import sys


def load(path: str) -> dict:
    for line in open(path):
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def flat(d: dict) -> dict:
    out = dict(d.get("queries", {}))
    for k, v in d.get("extras", {}).items():
        if k.endswith(":spread") or k.endswith("_factor"):
            continue
        out[k] = v
    return out


def main() -> None:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30
    fa, fb = flat(a), flat(b)
    keys = sorted(set(fa) & set(fb))
    missing = sorted(set(fa) ^ set(fb))
    bad = []
    for k in keys:
        va, vb = fa[k], fb[k]
        if va is None or vb is None or va <= 0 or vb <= 0:
            print(f"{k:45s} {va!s:>9} {vb!s:>9}  SKIP (failure marker)")
            continue
        ratio = vb / va
        flag = ""
        if abs(ratio - 1.0) > tol:
            flag = "  <-- OUTSIDE TOL"
            bad.append((k, va, vb, ratio))
        print(f"{k:45s} {va:9.3f} {vb:9.3f}  x{ratio:5.2f}{flag}")
    print(f"\ntotal: {a.get('value')} vs {b.get('value')}")
    if missing:
        print(f"entries present in only one run: {missing}")
    print(f"{len(bad)}/{len(keys)} entries outside ±{tol:.0%}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
