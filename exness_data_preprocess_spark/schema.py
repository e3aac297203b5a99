"""Explicit StructType schemas for every table the engine stores or derives.

Mirrors the reference's DDL-defined model (clickhouse_manager.py:110-269)
with Spark/Parquet-native types (SURVEY.md §1.2 mapping):

- ``DateTime64(6,'UTC')``  -> TimestampType (µs precision, session TZ=UTC)
- ``LowCardinality(String)`` -> StringType (parquet dictionary pages)
- ``UInt8`` flags/hours    -> IntegerType (kept as int 0/1 to match the
  reference's output shape, not boolean)
- ``Nullable(Float64)``    -> DoubleType nullable
"""

from __future__ import annotations

from pyspark.sql import types as T

from exness_data_preprocess_spark.exchanges import SESSION_FLAG_COLUMNS

# ---------------------------------------------------------------------------
# Tick streams (clickhouse_manager.py:151-184)
# ---------------------------------------------------------------------------
TICK_SCHEMA = T.StructType(
    [
        T.StructField("instrument", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("bid", T.DoubleType(), True),
        T.StructField("ask", T.DoubleType(), True),
    ]
)

# CSV ingress shape before normalization (tick_loader.py:37-67)
TICK_CSV_SCHEMA = T.StructType(
    [
        T.StructField("Timestamp", T.TimestampType(), True),
        T.StructField("Bid", T.DoubleType(), True),
        T.StructField("Ask", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Derived 1-minute bars: 27 physical columns (clickhouse_manager.py:193-229)
# ---------------------------------------------------------------------------
_OHLC_BASE_FIELDS = [
    T.StructField("instrument", T.StringType(), False),
    T.StructField("timestamp", T.TimestampType(), False),
    T.StructField("open", T.DoubleType(), True),
    T.StructField("high", T.DoubleType(), True),
    T.StructField("low", T.DoubleType(), True),
    T.StructField("close", T.DoubleType(), True),
    T.StructField("raw_spread_avg", T.DoubleType(), True),
    T.StructField("standard_spread_avg", T.DoubleType(), True),
    T.StructField("tick_count_raw_spread", T.LongType(), True),
    T.StructField("tick_count_standard", T.LongType(), True),
    T.StructField("ny_hour", T.IntegerType(), True),
    T.StructField("london_hour", T.IntegerType(), True),
    T.StructField("ny_session", T.StringType(), True),
    T.StructField("london_session", T.StringType(), True),
    T.StructField("is_us_holiday", T.IntegerType(), True),
    T.StructField("is_uk_holiday", T.IntegerType(), True),
    T.StructField("is_major_holiday", T.IntegerType(), True),
]

OHLC_1M_SCHEMA = T.StructType(
    _OHLC_BASE_FIELDS
    + [T.StructField(c, T.IntegerType(), True) for c in SESSION_FLAG_COLUMNS]
)

OHLC_1M_COLUMNS = [f.name for f in OHLC_1M_SCHEMA.fields]

# Resampled output adds 4 nullable derived ratios
# (clickhouse_query_engine.py:258-261)
DERIVED_RATIO_COLUMNS = [
    "range_per_spread",
    "range_per_tick",
    "body_per_spread",
    "body_per_tick",
]

# ---------------------------------------------------------------------------
# Dimension tables (clickhouse_manager.py:236-269)
# ---------------------------------------------------------------------------
EXCHANGE_SESSIONS_SCHEMA = T.StructType(
    [
        T.StructField("exchange_code", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("timezone", T.StringType(), False),
        T.StructField("open_hour", T.IntegerType(), False),
        T.StructField("open_minute", T.IntegerType(), False),
        T.StructField("close_hour", T.IntegerType(), False),
        T.StructField("close_minute", T.IntegerType(), False),
    ]
)

HOLIDAYS_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType(), False),
        T.StructField("exchange_code", T.StringType(), False),
        T.StructField("holiday_name", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Training-data pipeline tables (documents / embeddings, TESTDATA.md)
# ---------------------------------------------------------------------------
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

# Multimodal assets: opaque binary payload + typed metadata
# (image/audio/video decode is stubbed; plumbing is real — see
# operators/multimodal.py)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)
