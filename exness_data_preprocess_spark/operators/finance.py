"""Time-series finance aggregates: TWAP bars, realized volatility, and
cross-series correlation.

These extend the reference's research-side analytics (D9 family —
docs/research/.../phase3_volatility_model.py:159-215 computes per-period
volatility and correlation features driver-side in pandas) into
distributed, oracle-checkable engine operators.

Determinism contract (round-1 rules):
- Sums that feed a value hash run over DECIMAL-quantized terms (exact,
  order-free), cast to double only at the edge.
- Ratio math uses a single IEEE division of two exact operands — same
  bits in any engine.
- No transcendental functions on the hash path: realized volatility uses
  *simple* (arithmetic) returns, not log returns, because ``ln`` is not
  guaranteed bit-identical across libm implementations; a last-ulp
  difference under decimal quantization is a latent hash-flake.
  ``corr`` outputs are rounded to 6 decimals (the accepted idiom from
  ``autocorr_lag1``) since co-moment accumulation order differs between
  engines.

Scale shape: every window is keyed (series × bucket / series × day) —
state per task is one bucket of one key, never a global sort. The
aggregations are plain hash aggregates with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def twap_hourly(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event-anchored time-weighted average price per (key, hour).

    Each observation holds its value until the next observation in the
    same (key, hour) bucket; the last one holds until the bucket's end.
    The open interval from bucket start to the first observation carries
    no weight (event-anchored TWAP — the convention that needs no
    previous-bucket state, so buckets are embarrassingly parallel; a
    boundary-filled TWAP would be this plus one asof carry of the prior
    close, operators/asof.py).

    Weighted sums run as DECIMAL(18,6) × µs-duration products — exact
    integers-scaled arithmetic, summed order-free — and a single double
    division at the edge.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    ts_us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col, "bucket_hour").orderBy("ts_us", "tie")
    e = df.select(
        F.col(key_col),
        hour.alias("bucket_hour"),
        ts_us.alias("ts_us"),
        F.col("event_id").alias("tie"),
        F.col(value_col).cast("decimal(18,6)").alias("v"),
    )
    e = e.withColumn(
        "dur_us",
        F.coalesce(
            F.lead("ts_us").over(w),
            F.unix_micros(F.col("bucket_hour")) + F.lit(US_PER_HOUR),
        )
        - F.col("ts_us"),
    )
    return (
        e.groupBy(key_col, "bucket_hour")
        .agg(
            F.sum(F.col("v") * F.col("dur_us")).alias("_wv"),
            F.sum("dur_us").alias("_dur"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col(key_col),
            F.unix_micros("bucket_hour").alias("hour_us"),
            (F.col("_wv").cast("double") / F.col("_dur").cast("double")).alias(
                "twap"
            ),
            F.col("_dur").alias("weighted_us"),
            "n_events",
        )
    )


def realized_volatility_daily(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (key, day) realized variance over simple returns.

    rv = Σ r², r = (vₜ − vₜ₋₁) / vₜ₋₁ within the day, observations
    ordered by (ts, event_id). The division and subtraction are
    bit-reproducible IEEE ops; each squared return is quantized to
    DECIMAL(28,12) (identical input bits → identical decimal in every
    engine) and summed exactly.

    Mirrors the reference's per-period volatility features
    (docs/research/.../phase3_volatility_model.py:159-215) as a
    distributed keyed-window plan: partition (key, day) — no global sort.
    """
    day = F.to_date(F.col(ts_col))
    w = Window.partitionBy(key_col, "day").orderBy("ts_us", "tie")
    e = df.select(
        F.col(key_col),
        day.alias("day"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col("event_id").alias("tie"),
        F.col(value_col).alias("v"),
    )
    r = F.col("v") / F.lag("v").over(w) - F.lit(1.0)
    e = e.withColumn("term", (r * r).cast("decimal(28,12)"))
    return (
        e.groupBy(key_col, "day")
        .agg(
            F.sum("term").cast("double").alias("rv"),
            F.count("term").alias("n_returns"),
        )
        .select(
            F.col(key_col),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "rv",
            "n_returns",
        )
    )


def hourly_count_corr_daily(
    df: DataFrame,
    type_a: str = "click",
    type_b: str = "view",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily Pearson correlation between the hourly count series of two
    event types (activity co-movement — phase4_statistical_tests.py:137's
    cross-series correlation, distributed).

    Hour buckets with zero events of both types contribute no point (the
    bucket set is derived from observed rows identically in any engine).
    ``corr`` is rounded to 6 decimals at the edge (autocorr_lag1 idiom).
    """
    t = F.col(key_col)
    hourly = (
        df.filter(t.isin(type_a, type_b))
        .groupBy(
            F.to_date(ts_col).alias("day"),
            F.date_trunc("hour", F.col(ts_col)).alias("h"),
        )
        .agg(
            F.count(F.when(t == type_a, 1)).alias("cnt_a"),
            F.count(F.when(t == type_b, 1)).alias("cnt_b"),
        )
    )
    return (
        hourly.groupBy("day")
        .agg(
            F.round(F.corr("cnt_a", "cnt_b"), 6).alias("corr_ab"),
            F.count("*").alias("n_hours"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "corr_ab",
            "n_hours",
        )
    )
