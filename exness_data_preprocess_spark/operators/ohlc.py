"""Tick → 1-minute OHLC bar generation (the reference's core derived table).

Reference computation (clickhouse_ohlc_generator.py:150-196), one SQL pass:

    raw ASOF LEFT JOIN standard  (C1)
    GROUP BY toStartOfMinute(r.timestamp):
        argMin(r.bid, ts) open, max(r.bid) high, min(r.bid) low,
        argMax(r.bid, ts) close,
        avg(r.ask - r.bid) raw_spread_avg,
        avg(s.ask - s.bid) standard_spread_avg,
        count(r.ts) tick_count_raw_spread,
        countIf(s.ts IS NOT NULL) tick_count_standard,   -- matched RAW ticks
        ny/london hour + session CASE labels
    -- flags written 0, then back-filled via pandas round-trip (K5)

Spark-first differences:
- asof join = union + forward-fill (operators/asof.py), month-bucketed for
  scale.
- ``min_by``/``max_by`` are exact argMin/argMax equivalents.
- holiday/session flags computed IN the same plan via broadcast dims
  (operators/sessions.py) — no write→read-back→rewrite cycle.
- ``tick_count_standard`` counts **matched raw ticks**, not standard ticks
  (deliberate semantic, clickhouse_ohlc_generator.py:162) — preserved.

Physical plan at scale: one shuffle for the asof fill (keyed by instrument ×
month bucket), one partial-aggregated shuffle for the minute groupBy, two
broadcast joins for enrichment. All expressions JVM-side.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exness_data_preprocess_spark.exchanges import (
    EXCHANGES,
    SESSION_FLAG_COLUMNS,
)
from exness_data_preprocess_spark.functions.timefuncs import (
    hour_in_tz,
    london_session_label,
    ny_session_label,
    to_start_of_minute,
)
from exness_data_preprocess_spark.operators.asof import asof_join_backward
from exness_data_preprocess_spark.operators.sessions import (
    build_holiday_dim,
    build_trading_minutes_dim,
    enrich_with_sessions,
)


def aggregate_ticks_to_1m(raw_with_std: DataFrame) -> DataFrame:
    """Minute aggregation of asof-joined ticks.

    Input: raw ticks with ``std_timestamp/std_bid/std_ask`` matched columns
    (possibly NULL). Output grain: (instrument, minute).
    """
    minute = to_start_of_minute(F.col("timestamp"))
    grouped = raw_with_std.groupBy(
        F.col("instrument"), minute.alias("timestamp")
    ).agg(
        F.min_by("bid", "timestamp").alias("open"),
        F.max("bid").alias("high"),
        F.min("bid").alias("low"),
        F.max_by("bid", "timestamp").alias("close"),
        F.avg(F.col("ask") - F.col("bid")).alias("raw_spread_avg"),
        F.avg(F.col("std_ask") - F.col("std_bid")).alias("standard_spread_avg"),
        F.count("timestamp").alias("tick_count_raw_spread"),
        F.count(F.when(F.col("std_timestamp").isNotNull(), F.lit(1))).alias(
            "tick_count_standard"
        ),
    )
    ts = F.col("timestamp")
    return grouped.select(
        "instrument",
        "timestamp",
        "open",
        "high",
        "low",
        "close",
        "raw_spread_avg",
        "standard_spread_avg",
        "tick_count_raw_spread",
        "tick_count_standard",
        hour_in_tz(ts, "America/New_York").alias("ny_hour"),
        hour_in_tz(ts, "Europe/London").alias("london_hour"),
        ny_session_label(ts).alias("ny_session"),
        london_session_label(ts).alias("london_session"),
    )


def generate_ohlc_1m(
    raw_ticks: DataFrame,
    standard_ticks: DataFrame,
    holiday_dim: DataFrame | None = None,
    minutes_dim: DataFrame | None = None,
    asof_bucket: str | None = "month",
) -> DataFrame:
    """Full 27-column 1-minute bar table from the two tick streams.

    When the dims are omitted they are built for the ticks' date range
    (requires one small min/max aggregation up front).
    """
    joined = asof_join_backward(
        raw_ticks,
        standard_ticks,
        on="timestamp",
        by=("instrument",),
        value_cols=("bid", "ask"),
        matched_prefix="std_",
        bucket=asof_bucket,
    )
    bars = aggregate_ticks_to_1m(joined)

    spark = raw_ticks.sparkSession
    if holiday_dim is None or minutes_dim is None:
        lo, hi = raw_ticks.agg(
            F.min("timestamp"), F.max("timestamp")
        ).first()
        if lo is None:
            # Empty input: return empty with the right shape.
            lo = hi = dt.datetime(1970, 1, 1)
        # Pad the dim range one LOCAL day both ways (review find): a
        # UTC-ahead exchange's next local trading day opens before UTC
        # midnight (NZX's Jan-9 session starts 21:00 UTC Jan 8), so dims
        # ending at the max UTC tick date zeroed the session flags for
        # the final UTC hours; symmetrically, a UTC-behind venue's prior
        # local day covers the first hours.
        start = lo.date() - dt.timedelta(days=1)
        end = hi.date() + dt.timedelta(days=1)
        if holiday_dim is None:
            holiday_dim = build_holiday_dim(spark, start, end)
        if minutes_dim is None:
            minutes_dim = build_trading_minutes_dim(spark, start, end)

    enriched = enrich_with_sessions(bars, holiday_dim, minutes_dim)
    flag_cols = SESSION_FLAG_COLUMNS
    return enriched.select(
        "instrument",
        "timestamp",
        "open",
        "high",
        "low",
        "close",
        "raw_spread_avg",
        "standard_spread_avg",
        "tick_count_raw_spread",
        "tick_count_standard",
        "ny_hour",
        "london_hour",
        "ny_session",
        "london_session",
        "is_us_holiday",
        "is_uk_holiday",
        "is_major_holiday",
        *flag_cols,
    )
