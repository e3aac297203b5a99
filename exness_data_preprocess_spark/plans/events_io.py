"""Version-robust reader for the events table's timestamp column.

What the fixtures actually store (verified with pyarrow metadata): all
``events.parquet`` files type ``ts`` as INT64
``TIMESTAMP(MICROS, isAdjustedToUTC=false)`` — i.e. µs-precision
*naive* (NTZ) timestamps, not NANOS. Readers surface that three ways:

- most Spark readers: ``TIMESTAMP_NTZ`` — normalized here by casting to
  the session-TZ ``timestamp``. That cast is instant-preserving ONLY
  because ``session.py`` pins ``spark.sql.session.timeZone=UTC``; under
  any other session TZ the naive wall-clock would shift.
- a reader configured with ``spark.sql.legacy.parquet.nanosAsLong`` on a
  file that DOES carry TIMESTAMP(NANOS): a ``long`` of epoch-nanos —
  normalized by integer-dividing to µs. (Observed Spark 4.1.2 still
  *rejects* NANOS files without that conf rather than reading them
  natively; the conf is a no-op for these MICROS fixtures but kept so
  the same code path survives a NANOS-writing upstream.)
- ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` readers:
  a TZ-adjusted ``timestamp`` already — the cast is a no-op.

All shapes normalize to the UTC µs timestamp DuckDB surfaces for the
same file, which is what the oracle compare hashes against.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce however the reader surfaced the timestamp (long epoch-nanos
    / NTZ / TZ) to a UTC-session µs timestamp."""
    t = df.schema[col].dataType
    if isinstance(t, LongType):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df.withColumn(col, F.col(col).cast("timestamp"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch scan of ``{sf_dir}/events.parquet`` with normalized ``ts``."""
    # No-op for the MICROS fixtures; required for the long-nanos path if
    # an upstream ever writes TIMESTAMP(NANOS) (set before the read so
    # schema inference honors it).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
