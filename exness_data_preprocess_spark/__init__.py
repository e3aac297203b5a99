"""PySpark-native analytics engine with the capabilities of
terrylica/exness-data-preprocess (forex tick preprocessing + query engine),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, parquet
storage partitioned for scale, and a set of large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).

Nothing here is a port of the reference's ClickHouse SQL strings; every
operator is declared through the DataFrame API so Catalyst/Tungsten pick the
physical strategy (predicate pushdown, broadcast joins, whole-stage codegen,
AQE). Reference behavior citations use ``file:line`` of the reference repo.

The top-level export surface mirrors the reference package root
(reference __init__.py:96-125) so a user can switch imports one-for-one:
``ExnessDataProcessor`` ≙ :class:`SparkDataProcessor`,
``ClickHouseManager`` ≙ :class:`ParquetCatalog`,
``ClickHouseQueryEngine`` ≙ :class:`SparkQueryEngine`.
"""

from exness_data_preprocess_spark.config import load_config
from exness_data_preprocess_spark.models import (
    BatchIterator,
    CoverageInfo,
    CursorResult,
    DryRunResult,
    PairType,
    TimeframeType,
    UpdateResult,
    VariantType,
    supported_pairs,
    supported_timeframes,
    supported_variants,
)
from exness_data_preprocess_spark.processor import SparkDataProcessor
from exness_data_preprocess_spark.query import SparkQueryEngine
from exness_data_preprocess_spark.session import get_spark
from exness_data_preprocess_spark.sources.catalog import ParquetCatalog

__version__ = "0.2.0"

__all__ = [
    # Main facade (Spark backend)
    "SparkDataProcessor",
    # Result models
    "UpdateResult",
    "CoverageInfo",
    "CursorResult",
    "DryRunResult",
    "BatchIterator",
    # Type definitions
    "PairType",
    "TimeframeType",
    "VariantType",
    # Helper functions
    "supported_pairs",
    "supported_timeframes",
    "supported_variants",
    "load_config",
    # Engine modules
    "ParquetCatalog",
    "SparkQueryEngine",
    "get_spark",
    # Package metadata
    "__version__",
]
