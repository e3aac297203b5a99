"""Skew-safe aggregation patterns.

At 100 TB the hot key is the rule, not the exception (one instrument, one
language, one event type dominating a corpus). AQE's skew handling covers
sort-merge *joins*; skewed *aggregation state* still needs plan shape:

- ``distinct_count_skew_safe`` — Spark plans ``count(DISTINCT x)`` as an
  Expand + single shuffle on the group key, so every distinct value of a
  hot key lands on one reducer. Pre-aggregating on ``(key, value)`` first
  spreads the hot key across reducers by value hash; the second shuffle
  then carries exactly one row per distinct pair. Two cheap shuffles
  instead of one reducer-melting shuffle.
- ``salted_join`` — broadcast is the first answer for skewed joins; when
  BOTH sides are too big, explode the small(er) side over a salt domain
  and hash the big side's rows onto it, so one hot key spreads over
  ``n_salts`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_count_skew_safe(
    df: DataFrame,
    keys: tuple[str, ...],
    value_col: str,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key distinct count that survives hot keys.

    Stage 1 shuffles on ``(keys…, value)`` — a hot key's values hash
    across all reducers; map-side partial aggregation collapses local
    duplicates before the wire. Stage 2 shuffles one row per distinct
    pair and counts. Equivalent to ``count(DISTINCT value)`` (NULLs not
    counted, like SQL) with bounded per-task state.
    """
    key_cols = [F.col(k) for k in keys]
    pairs = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, F.col(value_col))
        .agg(F.lit(1).alias("_one"))
    )
    return pairs.groupBy(*key_cols).agg(F.count("*").alias(out_col))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has skewed join keys and ``right`` is too
    large to broadcast: replicate each ``right`` row across the salt
    domain, route each ``left`` row to one salt pseudo-randomly, and join
    on ``(key, salt)`` — a hot key now occupies ``n_salts`` reducers.

    The salt assignment uses a deterministic hash of the whole left row,
    so replays produce identical partition routing (results are identical
    under any routing; determinism keeps stage retries consistent).
    """
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                          F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = l_salted.join(r_salted, [on, "_salt"], how)
    return out.drop("_salt")
