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

from exness_data_preprocess_spark.exchanges import SESSION_FLAG_COLUMNS
from exness_data_preprocess_spark.functions.timefuncs import (
    null_safe_ratio,
    to_start_of_interval,
)

_FLAG_COLS = [
    "is_us_holiday",
    "is_uk_holiday",
    "is_major_holiday",
    *SESSION_FLAG_COLUMNS,
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


def fill_minute_gaps(
    bars: DataFrame,
    key_col: str = "instrument",
    ts_col: str = "timestamp",
    close_col: str = "close",
    count_col: str | None = None,
) -> DataFrame:
    """Densify a 1-minute bar series: emit EVERY minute between each
    key's first and last bar, carrying the previous close into missing
    minutes (the close-fill convention chart/backtest consumers expect
    from a bar store that, like the reference's, only materializes
    minutes that had ticks).

    Output: (key, minute, close_filled, is_gap, n_events) — ``is_gap=1``
    rows are synthesized minutes; ``close_filled`` is never NULL because
    the dense span starts at each key's first bar.

    Scale shape (same decomposition as operators/asof.py's prefix fill):
    the dense calendar is generated day-by-day (two bounded explodes —
    nothing ever builds a span-length array in one task), the
    forward-fill window partitions by (key, DAY) — bounded state — and
    day boundaries are repaired with a per-(key, day) carry frame whose
    window runs over days, not minutes. No global per-key sort at any
    data size.
    """
    from pyspark.sql import Window

    minute = F.date_trunc("minute", F.col(ts_col))
    # Explicit not-null keys + every-column-referencing aggregates, so
    # the THREE consumers of ``b`` (spans, the minute left join,
    # day_last) stay canonically identical below their shared exchange
    # and AQE stage reuse computes the upstream bars aggregation once
    # (optimization round 10, guide §2.4): the left join used to infer
    # IsNotNull(k, minute) into only its own copy, and column pruning
    # specialized the spans/day_last copies. Null-key bars carry no
    # fillable series identity and are dropped (they previously
    # synthesized an unreachable null-key span).
    b = bars.select(
        F.col(key_col).alias("k"),
        minute.alias("minute"),
        F.col(close_col).alias("close"),
        (F.lit(1) if count_col is None else F.col(count_col)).alias("n"),
    ).filter(F.col("k").isNotNull() & F.col("minute").isNotNull())
    # struct min/max == min/max of minute ((k, minute) is unique per
    # row, so the first struct field decides) — the close/n references
    # are vacuous but keep this copy's pruning identical to the join's
    spans = b.groupBy("k").agg(
        F.min(F.struct("minute", "close", "n"))["minute"].alias("lo"),
        F.max(F.struct("minute", "close", "n"))["minute"].alias("hi"),
    )
    days = spans.select(
        "k", "lo", "hi",
        F.explode(
            F.sequence(F.to_date("lo"), F.to_date("hi"))
        ).alias("day"),
    )
    day_start = F.col("day").cast("timestamp")
    # day end = next midnight − 1 minute, NOT start + 23:59 — identical
    # under the repo's pinned UTC session, but correct for any session
    # timezone with DST-shortened/lengthened days too
    day_end = F.date_add(F.col("day"), 1).cast("timestamp") - F.expr(
        "INTERVAL 1 MINUTE"
    )
    minutes = days.select(
        "k", "day",
        F.explode(
            F.sequence(
                F.greatest(F.col("lo"), day_start),
                F.least(F.col("hi"), day_end),
                F.expr("INTERVAL 1 MINUTE"),
            )
        ).alias("minute"),
    )
    joined = minutes.join(b, ["k", "minute"], "left")

    wd = (
        Window.partitionBy("k", "day")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    in_day = F.last("close", ignorenulls=True).over(wd)

    # cross-day carry: last close of each day with bars, filled forward
    # over the (small) day axis, shifted one day back
    day_last = b.withColumn("day", F.to_date("minute")).groupBy(
        "k", "day"
    ).agg(
        # struct value for the vacuous n reference (copy alignment, as
        # in spans); (k, minute) unique => same close as max_by(close)
        F.max_by(F.struct("close", "n"), "minute")["close"].alias(
            "day_close"
        )
    )
    wdy = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        # day-level spine from `days` (one row per (k, day) already) —
        # NOT minutes.distinct(), which would re-run the minute explode
        # and shuffle span-length rows to recover 1/1440th of them
        days.select("k", "day")
        .join(day_last, ["k", "day"], "left")
        .select(
            "k", "day",
            F.last("day_close", ignorenulls=True).over(wdy).alias("carry"),
        )
    )
    return (
        joined.join(carry, ["k", "day"])
        .select(
            F.col("k").alias(key_col),
            "minute",
            F.coalesce(in_day, F.col("carry")).alias("close_filled"),
            F.col("close").isNull().cast("int").alias("is_gap"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )
