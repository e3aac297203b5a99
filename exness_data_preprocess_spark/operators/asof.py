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
candidate-struct fill** — a single shuffle on the join key, no row
explosion, exact semantics:

1. Union both sides; each right row carries ONE candidate struct
   ``(match_ts, values…)`` (the whole matched row — NULL fields
   included, so columns are never mixed across right rows).
2. The prevailing match is ``max(candidate)`` over a trailing RANGE
   frame (peers included, so an equal-timestamp right row matches, as
   ``r.ts >= s.ts`` requires; duplicate right timestamps resolve by the
   deterministic struct order).
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

from pyspark.sql import Column, DataFrame, Window
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

    Implementation note: delegates to :func:`asof_join_directional`
    (``direction="backward"``), which carries the matched row as ONE
    candidate struct. The original per-column ``last(ignorenulls)``
    fill had a subtle bug review caught: a NULL value column in the
    matched right row was silently replaced by that column from an
    OLDER right row, emitting a mixed row no real ASOF join returns
    (e.g. bid from t1 with ask from t2). The struct fill takes the
    whole matched row — NULL fields included — and also makes
    duplicate-right-timestamp resolution deterministic (struct max)
    instead of row-order-dependent.
    """
    return asof_join_directional(
        left,
        right,
        on=on,
        by=by,
        value_cols=value_cols,
        matched_prefix=matched_prefix,
        direction="backward",
        tolerance_seconds=tolerance_seconds,
        bucket=bucket,
    )


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    on: str = "timestamp",
    by: Sequence[str] = ("instrument",),
    value_cols: Sequence[str] = ("bid", "ask"),
    matched_prefix: str = "right_",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    bucket: str | None = "month",
) -> DataFrame:
    """ASOF join with full pandas ``merge_asof`` direction parity:
    ``backward`` (latest right at-or-before), ``forward`` (earliest right
    at-or-after), ``nearest`` (closer of the two; exact ties resolve
    backward — documented, deterministic).

    Same union-instead-of-join scale design as :func:`asof_join_backward`
    (one shuffle on the key, or on (key, bucket) in the two-pass bucketed
    mode), but direction-symmetric: each right row carries a candidate
    struct ``(match_ts, values…)`` and the prevailing match is
    ``max(candidate)`` over a trailing RANGE frame (backward) and/or
    ``min(candidate)`` over a leading RANGE frame (forward). RANGE frames
    make equal-timestamp right rows visible in both directions without
    side tags, and the struct extremum is a total order — duplicate
    right timestamps resolve deterministically (max/min over
    ``(ts, values…)``), which row-position ``last()`` fills cannot
    guarantee. ``nearest`` computes both fills over the *same* shuffle —
    no second pass, no row-id self-join.

    Bucketed mode repairs bucket boundaries with per-(key, bucket)
    carry extrema forward-filled down (backward) and backward-filled up
    (forward) along the tiny bucket spine — the same distributed
    prefix-scan decomposition, applied in both directions.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    by = list(by)
    value_cols = list(value_cols)
    left_cols = left.columns
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")

    cand = F.struct(
        F.unix_micros(F.col(on).cast("timestamp")).alias("__mts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    cand_type = right.select(cand.alias("x")).schema["x"].dataType
    left_tagged = left.select(
        *left_cols,
        F.lit(1).alias(_SIDE),
        F.unix_micros(F.col(on).cast("timestamp")).alias("__ts"),
        F.lit(None).cast(cand_type).alias("__cand"),
    )
    right_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in by else F.col(c)
          for c in left_cols],
        F.lit(0).alias(_SIDE),
        F.unix_micros(F.col(on).cast("timestamp")).alias("__ts"),
        cand.alias("__cand"),
    )
    unioned = left_tagged.unionByName(right_tagged)

    if bucket is None:
        part = Window.partitionBy(*by)
    else:
        unioned = unioned.withColumn(
            _BUCKET,
            F.unix_micros(
                F.date_trunc(bucket, F.timestamp_micros(F.col("__ts")))
            ),
        )
        part = Window.partitionBy(*by, _BUCKET)
    w_b = part.orderBy("__ts").rangeBetween(Window.unboundedPreceding, 0)
    # Forward fill as a GROWING frame over descending order, never a
    # [current, unboundedFollowing] shrinking frame: Spark's shrinking
    # WindowFunctionFrame re-evaluates the aggregate from scratch on
    # every row (no inverse-combine), turning a 130k-row partition into
    # O(n²) work — measured as a hang at the 10M-event scale probe.
    # Descending order + [unboundedPreceding, current] RANGE is the same
    # row set (all rows with ts >= current, peers included) at O(n).
    w_f = part.orderBy(F.desc("__ts")).rangeBetween(
        Window.unboundedPreceding, 0
    )

    fills = [*left_cols, _SIDE, "__ts"]
    if bucket is not None:
        fills.append(_BUCKET)
    filled = unioned.select(
        *fills,
        *([F.max("__cand").over(w_b).alias("__b")] if need_b else []),
        *([F.min("__cand").over(w_f).alias("__f")] if need_f else []),
    )

    if bucket is not None:
        aggs = []
        if need_b:
            aggs.append(F.max("__cand").alias("__bc"))
        if need_f:
            aggs.append(F.min("__cand").alias("__fc"))
        carries = unioned.groupBy(*by, _BUCKET).agg(*aggs)
        w_prev = (
            Window.partitionBy(*by)
            .orderBy(_BUCKET)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # same shrinking-frame avoidance on the spine (harmless at
        # instrument×month cardinality, free to do right)
        w_next = (
            Window.partitionBy(*by)
            .orderBy(F.desc(_BUCKET))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = carries.select(
            *by,
            _BUCKET,
            *([F.max("__bc").over(w_prev).alias("__b_in")] if need_b else []),
            *([F.min("__fc").over(w_next).alias("__f_in")] if need_f else []),
        )
        filled = filled.join(carry, [*by, _BUCKET], "left")
        if need_b:
            filled = filled.withColumn(
                "__b", F.coalesce(F.col("__b"), F.col("__b_in"))
            )
        if need_f:
            filled = filled.withColumn(
                "__f", F.coalesce(F.col("__f"), F.col("__f_in"))
            )

    out = filled.filter(F.col(_SIDE) == 1)

    tol_us = (
        None
        if tolerance_seconds is None
        else int(round(float(tolerance_seconds) * 1_000_000))
    )

    def _gate(col: Column, dist: Column) -> Column:
        if tol_us is None:
            return col
        return F.when(dist <= F.lit(tol_us), col)

    if need_b:
        b_dist = F.col("__ts") - F.col("__b.__mts")
        b_pick = _gate(F.col("__b"), b_dist)
    if need_f:
        f_dist = F.col("__f.__mts") - F.col("__ts")
        f_pick = _gate(F.col("__f"), f_dist)

    if direction == "backward":
        pick = b_pick
    elif direction == "forward":
        pick = f_pick
    else:  # nearest: closer wins, exact tie -> backward
        b_ok, f_ok = b_pick, f_pick
        pick = (
            F.when(b_ok.isNull(), f_ok)
            .when(f_ok.isNull(), b_ok)
            .when(
                (F.col("__ts") - b_ok["__mts"])
                <= (f_ok["__mts"] - F.col("__ts")),
                b_ok,
            )
            .otherwise(f_ok)
        )

    matched_on = f"{matched_prefix}{on}"
    return out.select(
        *left_cols,
        F.timestamp_micros(pick["__mts"]).alias(matched_on),
        *[pick[c].alias(f"{matched_prefix}{c}") for c in value_cols],
    )
