"""Missing-month discovery for incremental updates (SURVEY M4/G2/J3).

Reference (clickhouse_gap_detector.py:90-139): generate the expected month
series from a start date to the current month (``arrayJoin(arrayMap(i ->
addMonths(...), range(...)))``), subtract observed ``DISTINCT (year,
month)`` of stored ticks via ``NOT IN``, order by (year, month); a fresh
instrument (no rows) falls back to Python enumeration
(clickhouse_gap_detector.py:141-193).

Spark-first: one ``sequence``+``explode`` expression replaces the
range/arrayMap/arrayJoin stack; the set difference is a **left_anti join**
(the distributed NOT IN). The observed side aggregates to at most a few
hundred rows before the join, so the anti-join broadcasts.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def expected_months(
    spark: SparkSession, start_date: str, end_date: str | None = None
) -> DataFrame:
    """(year, month) rows for every month from start_date's month through
    end_date's month (default: today), inclusive."""
    end_expr = (
        F.to_date(F.lit(end_date)) if end_date is not None else F.current_date()
    )
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.trunc(F.to_date(F.lit(start_date)), "month"),
                    F.trunc(end_expr, "month"),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ).alias("month_date")
        )
        .select(
            F.year("month_date").alias("year"),
            F.month("month_date").alias("month"),
        )
    )


def observed_months(
    ticks: DataFrame, instrument: str | None = None, ts_col: str = "timestamp"
) -> DataFrame:
    """DISTINCT (year, month) present in storage for the instrument."""
    df = ticks
    if instrument is not None:
        df = df.filter(F.col("instrument") == instrument.upper())
    return df.select(
        F.year(ts_col).alias("year"), F.month(ts_col).alias("month")
    ).distinct()


def missing_months(
    ticks: DataFrame,
    instrument: str,
    start_date: str,
    end_date: str | None = None,
) -> list[tuple[int, int]]:
    """Expected minus observed months, ordered (clickhouse_gap_detector.py:57-139)."""
    spark = ticks.sparkSession
    expected = expected_months(spark, start_date, end_date)
    observed = observed_months(ticks, instrument)
    gaps = (
        expected.join(observed, ["year", "month"], "left_anti")
        .orderBy("year", "month")
        .collect()
    )
    return [(r["year"], r["month"]) for r in gaps]


def enumerate_months(start_date: str, end_date: str | None = None) -> list[tuple[int, int]]:
    """Driver-side fallback for a fresh instrument
    (clickhouse_gap_detector.py:168-193)."""
    start = dt.date.fromisoformat(start_date).replace(day=1)
    end = (dt.date.fromisoformat(end_date) if end_date else dt.date.today()).replace(day=1)
    out = []
    cur = start
    while cur <= end:
        out.append((cur.year, cur.month))
        cur = (cur.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
    return out
