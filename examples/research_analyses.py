#!/usr/bin/env python
"""Research-side analyses from the reference's docs/research pipelines,
re-expressed as Spark plans over the engine's tables (SURVEY.md §2.D9:
"consumer-side analyses — port as example notebooks, not engine ops").

Each section cites the reference script it mirrors. Run against the
driver testdata:

    python examples/research_analyses.py [--sf /root/testdata/sf0.01]

All analyses are plain DataFrame aggregations/windows — at 100 TB each is
one or two partial-aggregated shuffles; nothing collects more than a
summary to the driver.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.plans.registry import load

    spark = get_spark("research-analyses")
    ev = load(spark, args.sf, "events")

    # -- 1. Daily extremes (phase6b_price_clustering.py:308) ----------------
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    print("daily extremes:", daily.count(), "days")

    # -- 2. Price clustering: round-level concentration
    #       (phase6b_price_clustering.py:556) ------------------------------
    clustered = (
        ev.groupBy(F.round("value", 0).alias("level"))
        .count()
        .orderBy(F.desc("count"))
    )
    top = clustered.first()
    print(f"most-hit price level: {top['level']} ({top['count']} events)")

    # -- 3. Interval quantiles (phase6a_interval_analysis.py:157-216) -------
    w = Window.partitionBy("event_type").orderBy("ts")
    gaps = ev.select(
        "event_type",
        (F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w))
        .alias("gap_s"),
    ).dropna()
    q = gaps.groupBy("event_type").agg(
        F.expr("percentile(gap_s, 0.25)").alias("q25"),
        F.expr("percentile(gap_s, 0.5)").alias("q50"),
        F.expr("percentile(gap_s, 0.99)").alias("q99"),
    )
    print("inter-event gap quantiles:")
    q.show(truncate=False)

    # -- 4. Volatility persistence: lag-1 autocorrelation of |returns|
    #       (phase3_volatility_model.py:159-215) ---------------------------
    rets = ev.select(
        "event_type",
        "ts",
        F.abs(F.col("value") - F.lag("value").over(w)).alias("abs_move"),
    ).dropna()
    persistence = (
        rets.withColumn(
            "prev_move",
            F.lag("abs_move").over(
                Window.partitionBy("event_type").orderBy("ts")
            ),
        )
        .groupBy("event_type")
        .agg(F.corr("abs_move", "prev_move").alias("autocorr"))
    )
    print("volatility persistence (lag-1 autocorr of |moves|):")
    persistence.show(truncate=False)

    # -- 5. Pearson corr between value and user activity
    #       (phase4_statistical_tests.py:137) ------------------------------
    per_user = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.avg("value").alias("avg_value")
    )
    corr = per_user.agg(F.corr("n_events", "avg_value").alias("r")).first()["r"]
    print(f"corr(user activity, avg value) = {corr:.6f}")

    spark.stop()


if __name__ == "__main__":
    main()
