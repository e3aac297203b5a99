"""ASOF (backward) join — the reference's centerpiece operator.

Reference semantics (clickhouse_ohlc_generator.py:187-190)::

    FROM raw_spread_ticks r
    ASOF LEFT JOIN standard_ticks s
      ON r.instrument = s.instrument AND r.timestamp >= s.timestamp

Every left row is matched to the **latest right row at-or-before** its
timestamp within the same key; left rows preceding any right row get NULLs.
The research pipeline also uses a 10-second tolerance variant
(docs/research/.../phase2_mean_reversion.py:78-84, pandas ``merge_asof``
``direction="backward", tolerance=...``).

Spark has no native asof join, so we re-express it as a **union +
forward-fill window** — a single shuffle on the join key, no row explosion,
exact semantics:

1. Tag both sides (right sorts before left at equal timestamps, because
   ``r.ts >= s.ts`` lets an equal-timestamp right row match).
2. ``last(value, ignorenulls=True) OVER (PARTITION BY key ORDER BY ts, side
   ROWS UNBOUNDED PRECEDING)`` forward-fills the prevailing right values
   onto left rows.
3. Keep left rows; optionally NULL out matches older than ``tolerance``.

Scale design — the naive window partitions by the bare key, so one key
(e.g. one instrument) = one task: hopeless at 100 TB with 10 instruments.
``bucket="month"`` switches to a two-pass prefix-fill that partitions by
(key, month) — parallelism = keys × months — and repairs bucket boundaries
with a tiny per-(key, bucket) "carry" aggregate (instruments × months rows,
broadcast back). Same exact results, arbitrarily scalable; this is the
standard distributed prefix-scan decomposition.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right, 1 = left
_BUCKET = "__asof_bucket"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: Sequence[str] = ("instrument",),
    value_cols: Sequence[str] = ("bid", "ask"),
    matched_prefix: str = "right_",
    tolerance_seconds: float | None = None,
    bucket: str | None = "month",
) -> DataFrame:
    """Backward asof-join ``right`` onto ``left``.

    Returns ``left.*`` plus ``{matched_prefix}{on}`` (timestamp of the
    matched right row, NULL if none) and ``{matched_prefix}{c}`` for each
    value column.

    ``bucket``: None → single window per key (only for small/test data);
    ``"month"``/``"day"``/``"hour"`` → scalable two-pass prefix fill.
    """
    by = list(by)
    value_cols = list(value_cols)
    matched_on = f"{matched_prefix}{on}"
    matched_vals = [f"{matched_prefix}{c}" for c in value_cols]
    fill_cols = [matched_on, *matched_vals]

    left_cols = left.columns
    left_tagged = left.select(
        *left_cols,
        F.lit(1).alias(_SIDE),
        F.col(on).cast("timestamp").alias("__ts"),
        F.lit(None).cast("timestamp").alias(matched_on),
        *[F.lit(None).cast(right.schema[c].dataType).alias(m)
          for c, m in zip(value_cols, matched_vals)],
    )
    right_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by else F.col(c)
          for c in left_cols],
        F.lit(0).alias(_SIDE),
        F.col(on).cast("timestamp").alias("__ts"),
        F.col(on).cast("timestamp").alias(matched_on),
        *[F.col(c).alias(m) for c, m in zip(value_cols, matched_vals)],
    )
    unioned = left_tagged.unionByName(right_tagged)

    if bucket is None:
        w = (
            Window.partitionBy(*by)
            .orderBy("__ts", _SIDE)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = unioned.select(
            *left_cols,
            _SIDE,
            *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
        )
    else:
        filled = _bucketed_fill(unioned, by, fill_cols, left_cols, bucket)

    out = filled.filter(F.col(_SIDE) == 1).drop(_SIDE)

    if tolerance_seconds is not None:
        within = (
            F.col(on).cast("double") - F.col(matched_on).cast("double")
        ) <= F.lit(float(tolerance_seconds))
        out = out.select(
            *left_cols,
            F.when(within, F.col(matched_on)).alias(matched_on),
            *[F.when(within, F.col(m)).alias(m) for m in matched_vals],
        )
    return out


def _bucketed_fill(
    unioned: DataFrame,
    by: list[str],
    fill_cols: list[str],
    left_cols: list[str],
    bucket: str,
) -> DataFrame:
    """Two-pass forward fill partitioned by (key, time-bucket).

    Pass 1 fills within each (key, bucket) partition. Pass 2 computes, per
    (key, bucket), the last right-side values ("carry"), forward-fills the
    carries across buckets on the tiny bucket spine, shifts them one bucket
    forward, and coalesces them under pass-1 NULLs (rows preceding any right
    row in their bucket).
    """
    bucketed = unioned.withColumn(_BUCKET, F.date_trunc(bucket, F.col("__ts")))

    w_in = (
        Window.partitionBy(*by, _BUCKET)
        .orderBy("__ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    in_filled = bucketed.select(
        *left_cols,
        _SIDE,
        _BUCKET,
        "__ts",
        *[F.last(c, ignorenulls=True).over(w_in).alias(c) for c in fill_cols],
    )

    # Carry aggregate: last right-side fill values per (key, bucket).
    # max_by on the (ts, side) pair == the final filled row of the bucket.
    order_key = F.struct(F.col("__ts"), F.col(_SIDE))
    carries = (
        in_filled.groupBy(*by, _BUCKET)
        .agg(
            F.max_by(F.struct(*[F.col(c) for c in fill_cols]), order_key).alias(
                "__last"
            )
        )
        .select(
            *by,
            _BUCKET,
            *[F.col(f"__last.{c}").alias(f"__carry_{c}") for c in fill_cols],
        )
    )
    # Forward-fill carries along the bucket spine, then shift by one bucket
    # so each bucket sees the carry from *previous* buckets only.
    w_spine = (
        Window.partitionBy(*by)
        .orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = carries.select(
        *by,
        _BUCKET,
        *[
            F.last(f"__carry_{c}", ignorenulls=True).over(w_spine).alias(
                f"__in_{c}"
            )
            for c in fill_cols
        ],
    )

    # No broadcast hint: carry_in is one row per (key, bucket) — tiny for
    # the reference's instrument×month domain but unbounded in general
    # (10M keys × 120 buckets is not a broadcast). AQE broadcasts it at
    # runtime when it is actually small; otherwise the join co-partitions
    # on the same (key, bucket) the pass-1 window already shuffled on.
    joined = in_filled.join(carry_in, [*by, _BUCKET], "left")
    return joined.select(
        *left_cols,
        _SIDE,
        *[F.coalesce(F.col(c), F.col(f"__in_{c}")).alias(c) for c in fill_cols],
    )
