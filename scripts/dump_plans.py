#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/dump_plans.py --tag r10 --suffix before [name ...]
(no names => every registry entry whose plan can be built lazily)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--executed",
        action="store_true",
        help="run the plan first (collect) and dump the FINAL adaptive "
        "plan — static explain duplicates shared subtrees per consumer; "
        "only the executed plan shows AQE exchange/stage reuse "
        "(ReusedExchange, AQEShuffleRead)",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.plans.registry import QUERIES

    spark = get_spark("dump-plans")
    outdir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    outdir.mkdir(parents=True, exist_ok=True)
    names = args.queries or list(QUERIES)
    for name in names:
        spec = QUERIES[name]
        try:
            df = spec.spark(spark, args.sf)
            if args.executed:
                # execute THIS DataFrame's own QueryExecution so the
                # AdaptiveSparkPlan reaches isFinalPlan=true, then dump
                # it (results are small registry outputs; this is plan
                # capture, never timing)
                df.collect()
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            txt = f"(plan capture failed: {e})"
        (outdir / f"{name}_{args.suffix}.txt").write_text(txt)
        print(name, "->", outdir / f"{name}_{args.suffix}.txt", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
