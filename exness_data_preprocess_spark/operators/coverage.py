"""Coverage report (SURVEY M7/D4/D5).

Reference (clickhouse_query_engine.py:279-375): tick counts via a tagged
UNION ALL + ``countIf``, OHLC count, min/max timestamp range, derived
``date_range_days``; all packaged into ``CoverageInfo``.

Spark-first: the union+countIf shape is preserved as an operator (it is
also one of the oracle-checked queries), but the facade computes the three
aggregates directly — one job per table, each a partial-aggregated scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exness_data_preprocess_spark.models import CoverageInfo


def tagged_union_counts(
    raw: DataFrame, std: DataFrame, instrument: str | None = None
) -> DataFrame:
    """UNION ALL + conditional count (clickhouse_query_engine.py:301-314)."""
    if instrument is not None:
        raw = raw.filter(F.col("instrument") == instrument.upper())
        std = std.filter(F.col("instrument") == instrument.upper())
    tagged = raw.select(F.lit("raw_spread_ticks").alias("table")).unionAll(
        std.select(F.lit("standard_ticks").alias("table"))
    )
    return tagged.agg(
        F.count(F.when(F.col("table") == "raw_spread_ticks", 1)).alias("raw_count"),
        F.count(F.when(F.col("table") == "standard_ticks", 1)).alias("std_count"),
    )


def get_data_coverage(
    raw: DataFrame,
    std: DataFrame,
    ohlc: DataFrame | None,
    instrument: str,
    database: str = "exness",
) -> CoverageInfo:
    """Assemble CoverageInfo (clickhouse_query_engine.py:279-375)."""
    inst = instrument.upper()
    # ONE aggregate pass over the raw table returns count+min+max
    # together (review find: a tagged-union count job plus a separate
    # min/max job doubled the dominant raw scan; tagged_union_counts
    # remains the oracle-checked operator for its own registry query)
    rng = (
        raw.filter(F.col("instrument") == inst)
        .agg(
            F.count("*").alias("n"),
            F.min("timestamp").alias("earliest"),
            F.max("timestamp").alias("latest"),
        )
        .first()
    )
    raw_count = rng["n"] if rng else 0
    std_count = std.filter(F.col("instrument") == inst).count()

    ohlc_count = 0
    if ohlc is not None:
        ohlc_count = ohlc.filter(F.col("instrument") == inst).count()

    earliest = rng["earliest"] if rng else None
    latest = rng["latest"] if rng else None
    # timedelta.days truncation is DELIBERATE reference parity
    # (clickhouse_query_engine.py:356 computes exactly this)
    date_range_days = (latest - earliest).days if earliest and latest else 0

    return CoverageInfo(
        database=database,
        storage_bytes=0,
        raw_spread_ticks=raw_count,
        standard_ticks=std_count,
        ohlc_bars=ohlc_count,
        earliest_date=str(earliest) if earliest else None,
        latest_date=str(latest) if latest else None,
        date_range_days=date_range_days,
    )
