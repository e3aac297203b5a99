#!/usr/bin/env python
"""Compare two bench JSON lines per entry: seconds, delta, ratio.

Usage: python scripts/compare_bench.py BEFORE.json AFTER.json [--min-ratio R]
Prints entries sorted by absolute delta (biggest saving first), then a
summary: total before/after, median before/after, counts improved/regressed
beyond the 1.25x noise band.
"""

from __future__ import annotations

import argparse
import json


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.loads(fh.readlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("before")
    ap.add_argument("after")
    ap.add_argument("--min-abs", type=float, default=0.05)
    args = ap.parse_args()

    b, a = _load(args.before), _load(args.after)
    qb, qa = b["queries"], a["queries"]
    shared = sorted(set(qb) & set(qa), key=lambda k: qa[k] - qb[k])
    print(f"{'entry':32s} {'before':>7s} {'after':>7s} {'delta':>7s} {'ratio':>6s}")
    for k in shared:
        d = qa[k] - qb[k]
        if abs(d) < args.min_abs:
            continue
        r = qa[k] / qb[k] if qb[k] else float("inf")
        print(f"{k:32s} {qb[k]:7.2f} {qa[k]:7.2f} {d:+7.2f} {r:6.2f}")
    tb = sum(qb[k] for k in shared)
    ta = sum(qa[k] for k in shared)
    sb = sorted(qb[k] for k in shared)
    sa = sorted(qa[k] for k in shared)
    imp = sum(1 for k in shared if qa[k] < qb[k] / 1.25)
    reg = sum(1 for k in shared if qa[k] > qb[k] * 1.25)
    print(
        f"\nshared={len(shared)} total {tb:.1f} -> {ta:.1f} s "
        f"({(ta - tb) / tb * 100:+.1f}%)  median "
        f"{sb[len(sb) // 2]:.3f} -> {sa[len(sa) // 2]:.3f} s  "
        f"improved>1.25x={imp} regressed>1.25x={reg}"
    )
    only_a = set(qa) - set(qb)
    if only_a:
        print(f"new entries: {sorted(only_a)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
