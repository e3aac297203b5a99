#!/usr/bin/env python
"""Parallel-scaling probe for the heavy query family (judge r10 task 3).

The round driver's 8-vs-32-core scaling block is uninformative at sf0.1:
127/128 ratios land <=1.17 because the whole bench sits on Spark's
~0.13-0.2 s per-job floor at that fixture size, so "does the operator
parallelize" cannot be answered from it. This probe runs the top heavy
entries at a fixture big enough to leave the job floor (the nat100x
natural ladder rung: 500k docs, Zipf vocabulary) at two core counts and
reports the wall-clock ratio per entry.

Protocol (the scale_curve/skew_bench discipline):
  - one process per core count (local[N] masters cannot change inside a
    JVM); `--cpus` sets SPARK_GRAFT_CPUS for get_spark;
  - per entry: one warm pass at sf0.001 (plan compile/JIT outside the
    window), then best-of-N noop-sink samples, cache cleared between;
  - `--merge LOW HIGH` combines two outputs into the committed artifact
    with ratio = sec_low / sec_high per entry (>1 means more cores
    helped; the core ratio is the ceiling).

RUN STRICTLY IDLE: no concurrent pytest / bench / correctness sweeps.

Usage:
  SPARK_GRAFT_CPUS=8  python scripts/parallel_scaling_probe.py --out a.json
  SPARK_GRAFT_CPUS=32 python scripts/parallel_scaling_probe.py --out b.json
  python scripts/parallel_scaling_probe.py --merge a.json b.json \
      --out parallel_scaling_r11.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# The most expensive bench entries (r10/r11 snapshots) that the natural
# fixtures can feed — the family whose 100 TB behaviour the scaling
# question is actually about.
HEAVY_QUERIES = [
    "dedup_containment_exact",
    "dedup_containment",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh",
    "dedup_levenshtein",
    "sketch_index_update",
    "incremental_dedup",
    "line_dedup",
    "incremental_line_dedup",
    "ccnet_buckets",
    "lm_fluency_score",
    "quality_classifier_nb",
]

WARM_DIR = "/root/testdata/sf0.001"


def run(args) -> None:
    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.plans.registry import QUERIES

    spark = get_spark("parallel-scaling-probe")
    sc = spark.sparkContext
    out: dict[str, float] = {}
    for name in args.queries:
        spec = QUERIES[name]
        sc.setJobDescription(f"warm:{name}")
        spec.spark(spark, WARM_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        best = None
        for _ in range(args.n):
            spark.catalog.clearCache()
            sc.setJobDescription(f"probe:{name}")
            t0 = time.time()
            spec.spark(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"[{args.cpus} cores] {name}: {out[name]} s", file=sys.stderr)
    payload = {
        "cpus": args.cpus,
        "sf_dir": args.sf,
        "n_samples": args.n,
        "queries": out,
    }
    Path(args.out).write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))


def merge(args) -> None:
    low = json.loads(Path(args.merge[0]).read_text())
    high = json.loads(Path(args.merge[1]).read_text())
    if low["cpus"] > high["cpus"]:
        low, high = high, low
    rows = {}
    for name, lo_sec in low["queries"].items():
        hi_sec = high["queries"].get(name)
        if hi_sec:
            rows[name] = {
                "sec_low": lo_sec,
                "sec_high": hi_sec,
                "ratio": round(lo_sec / hi_sec, 2),
            }
    payload = {
        "cpus_low": low["cpus"],
        "cpus_high": high["cpus"],
        "core_ratio": round(high["cpus"] / low["cpus"], 2),
        "sf_dir": low["sf_dir"],
        "per_query": rows,
    }
    Path(args.out).write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/.scaledata/nat100")
    ap.add_argument("-n", type=int, default=2)
    ap.add_argument("--queries", nargs="*", default=HEAVY_QUERIES)
    ap.add_argument("--out", required=True)
    ap.add_argument("--merge", nargs=2, metavar=("LOW", "HIGH"))
    args = ap.parse_args()
    args.cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if args.merge:
        merge(args)
    else:
        run(args)


if __name__ == "__main__":
    main()
