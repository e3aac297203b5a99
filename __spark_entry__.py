"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (tick→1m OHLC over the events
stream) at sf0.001. ``queries()`` / ``oracle_sql()`` expose every
oracle-checked operator from SURVEY.md §2 plus the training-data pipeline
operators; implementations live in
``exness_data_preprocess_spark/plans/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from exness_data_preprocess_spark.plans.registry import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 1-minute OHLC aggregation over the sf0.001 events stream."""
    return QUERIES["ohlc_1m"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query — every registry
    entry carries one (the streaming drains and mapInPandas stubs are
    digest-deterministic, so SQL reproduces them bit-for-bit)."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
