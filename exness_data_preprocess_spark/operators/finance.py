"""Time-series finance aggregates: TWAP bars, realized volatility, and
cross-series correlation.

These extend the reference's research-side analytics (D9 family —
docs/research/.../phase3_volatility_model.py:159-215 computes per-period
volatility and correlation features driver-side in pandas) into
distributed, oracle-checkable engine operators.

Determinism contract (round-1 rules):
- Sums that feed a value hash run over DECIMAL-quantized or exact-integer
  terms (exact, order-free), cast to double only at the edge.
- Ratio math uses a single IEEE division of two exact operands — same
  bits in any engine.
- No transcendental functions on the hash path: realized volatility uses
  *simple* (arithmetic) returns, not log returns, because ``ln`` is not
  guaranteed bit-identical across libm implementations. ``sqrt`` is fine:
  IEEE 754 requires it correctly rounded.
- Pearson correlation is computed from exact integer co-moment sums
  (counts are integers), not ``F.corr`` — both for bit-reproducibility
  and because Spark 4's ANSI mode makes ``corr``'s internal division
  throw DIVIDE_BY_ZERO on constant series instead of returning NULL.

ANSI-safety convention (Spark 4 defaults ``spark.sql.ansi.enabled=true``):
- any ratio whose denominator can be zero goes through ``F.try_divide``;
  the NULL result is the documented output for the degenerate case
  (zero previous price → no return; constant series → no correlation).

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
    tie_col: str = "event_id",
) -> DataFrame:
    """Event-anchored time-weighted average price per (key, hour).

    Each observation holds its value until the next observation in the
    same (key, hour) bucket; the last one holds until the bucket's end.
    The open interval from bucket start to the first observation carries
    no weight (event-anchored TWAP — the convention that needs no
    previous-bucket state, so buckets are embarrassingly parallel; a
    boundary-filled TWAP would be this plus one asof carry of the prior
    close, operators/asof.py).

    Weighted sums run as DECIMAL(18,6) × DECIMAL(18,0)-µs-duration
    products — exact integer-scaled arithmetic, summed order-free — and a
    single double division at the edge. Domain bound: |value| < 1e12
    (DECIMAL(18,6)'s integer range) — beyond any real price; an
    out-of-range value raises under ANSI mode rather than silently
    dropping the observation, because a dropped event would corrupt the
    holding-time weights of its neighbors. ``_dur`` is strictly positive
    (the last observation's duration to bucket end is > 0 because
    ``date_trunc`` maps a boundary timestamp into the bucket it opens),
    so the edge division cannot hit zero.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    ts_us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col, "bucket_hour").orderBy("ts_us", "tie")
    e = (
        df
        # NULL-valued observations are excluded BEFORE the lead()
        # duration assignment (review find): kept in, they contributed
        # holding time to the denominator but nothing to the weighted
        # sum — silently deflating the TWAP — and truncated the
        # previous observation's holding period. Filtering first makes
        # the previous value correctly hold across the gap.
        .filter(F.col(value_col).isNotNull())
        .select(
            F.col(key_col),
            hour.alias("bucket_hour"),
            ts_us.alias("ts_us"),
            F.col(tie_col).alias("tie"),
            F.col(value_col).cast("decimal(18,6)").alias("v"),
        )
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
            # dur cast to decimal(18,0) keeps the product inside
            # decimal(38,6) in both Spark and DuckDB — exact in each.
            F.sum(F.col("v") * F.col("dur_us").cast("decimal(18,0)")).alias("_wv"),
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
    tie_col: str = "event_id",
) -> DataFrame:
    """Per (key, day) realized variance over simple returns.

    rv = Σ r², r = vₜ / vₜ₋₁ − 1 within the day, observations ordered by
    (ts, tie). The division runs through ``try_divide``: a zero previous
    value yields a NULL return that is excluded from both rv and
    n_returns (documented convention, mirrored in the oracle) instead of
    throwing DIVIDE_BY_ZERO under ANSI mode. ``value_col`` is cast to
    double up front so the division is a single IEEE double op even for
    decimal inputs.

    The *return* (not the squared return) is quantized to DECIMAL(18,9)
    and squared in exact decimal arithmetic. Quantizing r² would be
    engine-divergent: near-zero prices push r² to ~1e8, and rounding
    that to 12 decimals needs >17 significant digits — beyond what a
    double carries — so Spark's shortest-string cast and DuckDB's
    exact-binary cast disagree in the last ulp. |r| stays ≤ ~1e4, where
    scale-9 quantization sits safely inside double precision and both
    engines round identically; the decimal square and exact sum are then
    order-free and bit-identical in each engine.

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
        F.col(tie_col).alias("tie"),
        F.col(value_col).cast("double").alias("v"),
    )
    # try_cast, not cast: a pathological return (previous price ~1e-6 →
    # r ~1e9+) would overflow DECIMAL(18,9) and, under ANSI mode, kill
    # the job. try_cast folds the overflow into the same NULL-return
    # convention as a zero previous price: excluded from rv AND from
    # n_returns, mirrored by TRY_CAST in the oracle.
    r = (F.try_divide(F.col("v"), F.lag("v").over(w)) - F.lit(1.0)).try_cast(
        "decimal(18,9)"
    )
    e = e.withColumn("term", r * r)
    return (
        e.groupBy(key_col, "day")
        .agg(
            # The exact sum carries scale 18; casting THAT to double is
            # engine-divergent (a scale-18 int128 → double needs two
            # roundings in DuckDB). Re-quantize to scale 6 first — an
            # exact integer-decimal rounding — so the scaled value fits
            # in 2^53 and the final double conversion is single-rounded
            # and bit-identical in both engines.
            F.sum("term").cast("decimal(28,6)").cast("double").alias("rv"),
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

    The correlation is assembled from exact integer co-moment sums
    (counts are longs; n·Σxy − ΣxΣy etc. are exact), cast to double for
    one sqrt (IEEE correctly-rounded) and one ``try_divide`` — so a
    constant series (zero variance, guaranteed for single-hour days)
    yields NULL rather than an ANSI DIVIDE_BY_ZERO from ``F.corr``'s
    internals. Rounded to 6 decimals at the edge (autocorr_lag1 idiom).
    Co-moment sums are carried as DECIMAL(38,0): exact for hourly
    counts up to ~10¹⁷ (the squared-count combinations stay under
    10³⁸), with ANSI raising — never silently corrupting — beyond
    that; int64 counts would already overflow at ~3·10⁹ per hour.
    DuckDB's HUGEINT sums are likewise exact in that range, and both
    engines perform the single exact-integer→double rounding at the
    same point.
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
    return corr_from_hourly(hourly)


def corr_from_hourly(hourly: DataFrame) -> DataFrame:
    """Daily Pearson correlation from an hourly (day, cnt_a, cnt_b)
    count frame — the combination half of ``hourly_count_corr_daily``,
    exposed so the overflow path is testable with synthetic counts.

    decimal(19,0) counts (any int64 casts losslessly — a decimal(18,0)
    cast would itself overflow for counts in (10¹⁸, 2⁶³)) →
    decimal(38,0) products and sums: every co-moment is exact while
    hourly counts stay ≤ ~10¹⁷ (then Σcnt² over 24 hours < 2.4·10³⁵
    and the n·Σxy − ΣxΣy combinations stay under 10³⁸). Long counts
    would already overflow sxx at cnt ≈ 3·10⁹ per hour — real at
    event-stream scale; past the 10¹⁷ bound ANSI raises rather than
    silently corrupting. The final combination stays in decimal before
    the one cast to double for sqrt/divide.
    """
    da = F.col("cnt_a").cast("decimal(19,0)")
    db = F.col("cnt_b").cast("decimal(19,0)")
    daily = hourly.groupBy("day").agg(
        F.count("*").alias("n_hours"),
        F.sum(da).alias("sx"),
        F.sum(db).alias("sy"),
        F.sum(da * da).alias("sxx"),
        F.sum(db * db).alias("syy"),
        F.sum(da * db).alias("sxy"),
    )
    n = F.col("n_hours").cast("decimal(18,0)")
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    var_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        daily.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.try_divide(cov, F.sqrt(var_x * var_y)), 6).alias("corr_ab"),
            "n_hours",
        )
        .orderBy("day")
    )


def max_drawdown_daily(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Daily maximum drawdown per key: min over t of value_t/runmax_t − 1,
    the classic peak-to-trough risk metric (the research layer's drawdown
    companion to realized volatility, phase2_mean_reversion.py's family).

    Determinism without rounding: the running max is an exact comparison
    (no fp accumulation), the ratio is one IEEE division on identical
    operands in any engine, and the daily min is again exact — so the
    metric ships UNROUNDED (round-at-the-edge is only needed for
    order-dependent sums; see the sf0.1 .5-boundary lesson).

    Scale shape: the prefix max is a growing ROWS frame over the bounded
    (key, day) partition — O(n) per partition, never a shrinking frame —
    and the rollup is one partial-aggregable groupBy on the same keys.
    Non-positive values are excluded (a zero/negative 'price' makes the
    ratio degenerate), identically in the oracle.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    w = (
        Window.partitionBy(key_col, "day")
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = (
        df.filter(F.col(value_col) > 0)
        .select(key_col, day, ts_col, id_col, value_col)
        .withColumn("runmax", F.max(value_col).over(w))
    )
    return (
        p.groupBy(key_col, "day")
        .agg(
            F.min(F.col(value_col) / F.col("runmax") - 1).alias(
                "max_drawdown"
            ),
            F.count("*").alias("n_obs"),
        )
        .select(
            key_col,
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "max_drawdown",
            "n_obs",
        )
    )
