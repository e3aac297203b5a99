"""Bucketed-table layout: pre-shuffled storage for co-located joins.

Partitioning (catalog.py) prunes *directories*; bucketing pre-applies the
join/aggregation *shuffle* at write time: rows are hash-distributed into a
fixed number of buckets on the join key and each bucket lands in its own
file set.  Two tables bucketed the same way join with NO Exchange on
either side — at 100 TB that turns the recurring tick⋈tick or tick⋈bar
join from the dominant shuffle into a local zip of pre-sorted buckets.

This is the Spark analog of the co-location ClickHouse gets from sharing
an ORDER BY key between MergeTree tables (reference DDL,
src/exness_data_preprocess/clickhouse_manager.py:159-176).

Bucketing requires the session catalog (``saveAsTable``); tables live
under ``spark.sql.warehouse.dir``.  The plan guard in
tests/test_scale_plans.py asserts the no-Exchange property instead of
trusting the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    Pick ``num_buckets`` so a bucket of the *final* table size fits one
    task comfortably (hundreds of MB); both sides of a co-located join
    must use identical bucket columns AND count.
    """
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
