"""Version-robust reader for the events table (parquet TIMESTAMP(NANOS)).

The synthetic ``events.parquet`` stores ``ts`` with nanosecond precision.
How that surfaces depends on the Spark reader:

- Spark <=4.0 vectorized readers reject TIMESTAMP(NANOS) unless
  ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case the
  column arrives as a ``long`` of epoch-nanos.
- Spark >=4.1 reads it natively as ``TIMESTAMP_NTZ`` truncated to µs and
  ignores the legacy conf.

Both shapes normalize to a session-TZ (UTC) µs ``timestamp`` — exactly
the value DuckDB surfaces for the same file, which is what the oracle
compare hashes against.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce a nanos-sourced timestamp column to a UTC µs timestamp,
    whatever shape the reader surfaced it in (long nanos / NTZ / TZ)."""
    t = df.schema[col].dataType
    if isinstance(t, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df.withColumn(col, F.col(col).cast("timestamp"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch scan of ``{sf_dir}/events.parquet`` with normalized ``ts``."""
    # Harmless no-op on Spark >=4.1; required for the long-nanos path on
    # older readers (set before the read so schema inference honors it).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
