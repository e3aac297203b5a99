#!/usr/bin/env python
"""Measure WHY n_cells must grow with the corpus (judge r4 task 2).

Times embedding pair-mining over the natural-rate fixtures twice per
rung: once with the cell count FROZEN at 16 (the pre-round-5 registry
shape) and once with the corpus-scaled count max(16, n // 64) the
registry now uses. Same centroid-selection rule (lowest-id corpus rows),
same plan, same protocol as scale_curve.py (best-of-2 noop-sink writes,
cache cleared) — the only variable is the cell count, so the timing gap
IS the per-cell quadratic blowup a fixed count degrades to.

Usage: python scripts/ivf_cells_compare.py [--out ivf_cells_compare.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

LADDER = [
    ("nat1x", "/root/repo/.scaledata/nat1"),
    ("nat3x", "/root/repo/.scaledata/nat3"),
    ("nat10x", "/root/repo/.scaledata/nat10"),
    ("nat30x", "/root/repo/.scaledata/nat30"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.operators.dedup import (
        embedding_cosine_pairs,
    )
    from exness_data_preprocess_spark.plans.registry_ext import _ivf_centroids

    spark = get_spark("ivf-cells-compare")
    results: dict[str, dict] = {}
    for tag, d in LADDER:
        if not os.path.isdir(d):
            continue
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        grown = max(16, n // 64)
        row: dict = {"n": n}
        for label, n_cells in (("fixed16", 16), (f"grown{grown}", grown)):
            cents = _ivf_centroids(spark, d, n_cells)
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                embedding_cosine_pairs(
                    emb, block_col=None, threshold=0.3, centroids=cents
                ).write.format("noop").mode("overwrite").save()
                el = time.time() - t0
                best = el if best is None else min(best, el)
            spark.catalog.clearCache()
            out_rows = embedding_cosine_pairs(
                emb, block_col=None, threshold=0.3, centroids=cents
            ).count()
            row[label] = {"sec": round(best, 3), "out_rows": out_rows}
            print(json.dumps({"tag": tag, "cells": label, **row[label]}),
                  file=sys.stderr)
        results[tag] = row

    tags = [t for t, _ in LADDER if t in results]
    for variant in ("fixed", "grown"):
        pts = []
        for t in tags:
            key = next(k for k in results[t] if k.startswith(variant))
            pts.append((results[t]["n"], results[t][key]["sec"]))
        if len(pts) >= 2:
            (n_lo, t_lo), (n_hi, t_hi) = pts[-2], pts[-1]
            alpha = math.log(t_hi / t_lo) / math.log(n_hi / n_lo)
            results[f"alpha_last_{variant}"] = round(alpha, 2)

    payload = {"metric": "ivf_cells_compare", "results": results}
    print(json.dumps(payload))
    if args.out:
        Path(args.out).write_text(json.dumps(payload, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
