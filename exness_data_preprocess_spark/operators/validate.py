"""Data-quality validation and table statistics (ANALYZE) operators.

Two maintenance passes every production lake runs:

- ``validate_ticks`` — the ingest contract as a *report*: one row per
  rule with its violation count over the scanned range.  The reference
  enforces its schema imperatively at insert time (column normalization
  and variant checks, clickhouse_manager.py:271-330; typed CSV parse,
  tick_loader.py:37-67); at 100 TB you also want the declarative audit
  you can run over data at rest.  One aggregate pass — every rule is a
  conditional count in a single scan, no per-rule jobs.

- ``analyze_columns`` — per-column min/max/null-count/approx-NDV, the
  optimizer-statistics pass (Spark's ``ANALYZE TABLE`` computes the same
  numbers; this returns them as a DataFrame so they can be stored with
  the table and diffed between runs).  Exact NDV is a shuffle per
  column; approx_count_distinct (HLL++) keeps it one scan-side pass —
  the standard trade at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["validate", "validate_ticks", "tick_rules", "analyze_columns"]


def tick_rules() -> dict[str, "F.Column"]:
    """The ingest contract for tick data as violation predicates."""
    return {
        "null_instrument": F.col("instrument").isNull(),
        "null_timestamp": F.col("timestamp").isNull(),
        "nonpositive_bid": F.col("bid") <= 0,
        "nonpositive_ask": F.col("ask") <= 0,
        "inverted_spread": F.col("ask") < F.col("bid"),
        "unreasonable_spread": (F.col("ask") - F.col("bid"))
        > F.col("bid") * 0.1,
    }


def validate_ticks(df: DataFrame) -> DataFrame:
    """Tick-table audit: :func:`validate` with the tick rule set."""
    return validate(df, tick_rules())


def validate(df: DataFrame, rules: dict[str, "F.Column"]) -> DataFrame:
    """One row per rule: (rule, violations, total_rows).

    All rules evaluate in a single aggregate over one scan (conditional
    counts), so the audit costs the same as one COUNT(*) regardless of
    how many rules are registered."""
    if not rules:
        # stack(0) is a ParseException, not an empty report (review find)
        raise ValueError("validate requires at least one rule")
    agg = df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in rules.items()
        ],
    )
    # unpivot to the report shape via the COLUMN API (review find: a
    # rule name with a quote/space/hyphen aliased fine but then broke
    # the interpolated selectExpr stack() SQL — the dict[str, Column]
    # contract must accept any name the alias accepts)
    n = len(rules)
    stack_cols: list = []
    for name in rules:
        stack_cols.append(F.lit(name))
        stack_cols.append(agg[name])  # by-name access: no SQL parsing
    return agg.select(
        F.stack(F.lit(n), *stack_cols).alias("rule", "violations"),
        "total_rows",
    )


def analyze_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column statistics: (column, min, max, null_count, approx_ndv).

    min/max are rendered as strings so heterogeneous column types fit one
    report frame (same convention as Spark's ``df.summary()``)."""
    cols = columns or df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            c
            for name in cols
            for c in (
                # df[name] resolves by name without SQL parsing, so
                # non-identifier column names survive end to end
                F.min(df[name]).cast("string").alias(f"min_{name}"),
                F.max(df[name]).cast("string").alias(f"max_{name}"),
                F.sum(
                    F.when(df[name].isNull(), 1).otherwise(0)
                ).alias(f"nulls_{name}"),
                F.approx_count_distinct(df[name]).alias(f"ndv_{name}"),
            )
        ],
    )
    # column API, not interpolated SQL — a column name that is not a
    # bare identifier must not break the unpivot (review find)
    if not cols:
        raise ValueError("analyze_columns requires at least one column")
    stack_cols: list = []
    for name in cols:
        stack_cols.extend(
            (
                F.lit(name),
                agg[f"min_{name}"],
                agg[f"max_{name}"],
                agg[f"nulls_{name}"],
                agg[f"ndv_{name}"],
            )
        )
    return agg.select(
        F.stack(F.lit(len(cols)), *stack_cols).alias(
            "column", "min_value", "max_value", "null_count", "approx_ndv"
        ),
        F.col("__n").alias("total_rows"),
    )
