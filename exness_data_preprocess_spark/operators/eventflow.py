"""Event-flow analytics: ordered funnels and cohort retention.

Extends the events-table analytics family (sessionize / rolling /
interval joins) with the two classic product-analytics operators a
ClickHouse user reaches for (`windowFunnel`, `retention`) — re-expressed
as keyed relational passes instead of specialized aggregate functions.

Scale shape:
- Funnel: one filtered scan + one keyed aggregation PER STEP, each
  shuffling on the (user, day) key — k steps → k hash aggregates over
  progressively smaller survivor sets (step n's input is semi-joined
  against step n−1's survivors). No window over the full event stream,
  no per-user event collection.
- Retention: two keyed aggregations (first-activity day per user, then
  (cohort, offset) distinct counts). Distinct-count state is bounded by
  users per cohort-offset cell.

Everything is exact integer/timestamp arithmetic — no floats anywhere —
so results are bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_col: str | None = None,
) -> DataFrame:
    """Strictly-ordered funnel: per scope (``within_col`` bucket, or the
    whole stream when None), how many distinct keys reached step 1, then
    step 2 AFTER their step-1 time, and so on.

    Each step's reach time is the EARLIEST qualifying event strictly
    after the previous step's reach time (the standard windowFunnel
    convention; ties at the exact same timestamp do not advance the
    funnel). Returns one row per scope with ``n_step_1..n_step_k``
    distinct-key counts; scopes with zero step-1 reachers are absent.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    scope = [within_col] if within_col else []
    ev = df.select(
        *scope,
        F.col(key_col).alias("k"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    # step 1: earliest matching event per (scope, key)
    reach = (
        ev.filter(F.col("t") == steps[0])
        .groupBy(*scope, "k")
        .agg(F.min("us").alias("r1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        # survivors only: keys whose r_{i-1} is NULL died at an earlier
        # step — filtering them BEFORE the join keeps each step's join
        # input shrinking with the funnel instead of staying at the
        # step-1 reach
        survivors = reach.select(*scope, "k", F.col(f"r{i-1}")).filter(
            F.col(f"r{i-1}").isNotNull()
        )
        nxt = (
            ev.filter(F.col("t") == s)
            .join(survivors, [*scope, "k"])
            .filter(F.col("us") > F.col(f"r{i-1}"))
            .groupBy(*scope, "k")
            .agg(F.min("us").alias(f"r{i}"))
        )
        reach = reach.join(nxt, [*scope, "k"], "left")
    counts = [
        F.count(F.col(f"r{i}")).alias(f"n_step_{i}")
        for i in range(1, len(steps) + 1)
    ]
    if scope:
        return reach.groupBy(*scope).agg(*counts).orderBy(*scope)
    return reach.agg(*counts)


def cohort_retention(
    df: DataFrame,
    max_offset_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention matrix: users grouped by first-activity
    day; for each day offset 0..max, how many of the cohort were active
    again that day.

    Output: (cohort_day, offset_days, n_active, cohort_size) — one row
    per (cohort, offset) with ≥1 active user; offset 0 always equals the
    cohort size.
    """
    act = df.select(
        F.col(key_col).alias("k"), F.to_date(ts_col).alias("day")
    ).dropDuplicates(["k", "day"])
    first = act.groupBy("k").agg(F.min("day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    joined = (
        act.join(first, "k")
        .withColumn("offset_days", F.datediff("day", "cohort_day"))
        .filter(F.col("offset_days") <= max_offset_days)
    )
    return (
        joined.groupBy("cohort_day", "offset_days")
        .agg(F.count_distinct("k").alias("n_active"))
        .join(sizes, "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "offset_days",
            "n_active",
            "cohort_size",
        )
        .orderBy("cohort_day", "offset_days")
    )
