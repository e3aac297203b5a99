"""1m → {5m,15m,30m,1h,4h,1d} OHLC resampling with derived ratios.

Reference SQL (clickhouse_query_engine.py:218-271): re-aggregate stored 1m
bars into epoch-aligned ``toStartOfInterval`` buckets with
argMin(open)/max(high)/min(low)/argMax(close), avg spreads, sum counts,
max of hours/flags, ``any()`` of session labels, then compute 4 NULL-safe
derived ratios.

Deviation (documented, SURVEY.md §7): the reference's ``any()`` is
non-deterministic; we use ``min_by(label, timestamp)`` (the bucket's first
label) for reproducible output.

Physical: a single partial-aggregated shuffle on (instrument, bucket); the
ratio projection is a plain select over the aggregate — no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exness_data_preprocess_spark.exchanges import EXCHANGES
from exness_data_preprocess_spark.functions.timefuncs import (
    null_safe_ratio,
    to_start_of_interval,
)

_FLAG_COLS = [
    "is_us_holiday",
    "is_uk_holiday",
    "is_major_holiday",
    *[f"is_{n}_session" for n in EXCHANGES],
]


def resample_ohlc(bars_1m: DataFrame, minutes: int) -> DataFrame:
    """Re-aggregate 1m bars to ``minutes``-sized epoch-aligned buckets."""
    if minutes <= 1:
        raise ValueError("resample target must be > 1 minute")
    bucket = to_start_of_interval(F.col("timestamp"), minutes)
    base = bars_1m.groupBy(
        F.col("instrument"), bucket.alias("timestamp")
    ).agg(
        F.min_by("open", "timestamp").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "timestamp").alias("close"),
        F.avg("raw_spread_avg").alias("raw_spread_avg"),
        F.avg("standard_spread_avg").alias("standard_spread_avg"),
        F.sum("tick_count_raw_spread").alias("tick_count_raw_spread"),
        F.sum("tick_count_standard").alias("tick_count_standard"),
        F.max("ny_hour").alias("ny_hour"),
        F.max("london_hour").alias("london_hour"),
        F.min_by("ny_session", "timestamp").alias("ny_session"),
        F.min_by("london_session", "timestamp").alias("london_session"),
        *[F.max(c).alias(c) for c in _FLAG_COLS],
    )
    rng = F.col("high") - F.col("low")
    body = F.abs(F.col("close") - F.col("open"))
    return base.select(
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
        null_safe_ratio(rng, F.col("raw_spread_avg")).alias("range_per_spread"),
        null_safe_ratio(rng, F.col("tick_count_raw_spread")).alias("range_per_tick"),
        null_safe_ratio(body, F.col("raw_spread_avg")).alias("body_per_spread"),
        null_safe_ratio(body, F.col("tick_count_raw_spread")).alias("body_per_tick"),
        "ny_hour",
        "london_hour",
        "ny_session",
        "london_session",
        *_FLAG_COLS,
    )
