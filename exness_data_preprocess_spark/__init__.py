"""PySpark-native analytics engine with the capabilities of
terrylica/exness-data-preprocess (forex tick preprocessing + query engine),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, parquet
storage partitioned for scale, and a set of large-scale training-data
operators (dedup, similarity search, text analysis, multimodal plumbing).

Nothing here is a port of the reference's ClickHouse SQL strings; every
operator is declared through the DataFrame API so Catalyst/Tungsten pick the
physical strategy (predicate pushdown, broadcast joins, whole-stage codegen,
AQE). Reference behavior citations use ``file:line`` of the reference repo.
"""

from exness_data_preprocess_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
