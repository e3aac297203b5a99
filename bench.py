#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query executes fully (noop sink — no driver-side collect) after a
shared warm-up that triggers JVM/codegen initialization, so per-query
numbers measure the plan, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.plans.registry import QUERIES

    spark = get_spark("bench")

    # Warm-up: initialize parquet reader + codegen on a trivial plan.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    t_all = time.time()
    for name, spec in QUERIES.items():
        if not spec.bench:
            continue  # correctness-only entries (e.g. streaming drains)
        t0 = time.time()
        df = spec.spark(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 4)
    total = round(time.time() - t_all, 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
