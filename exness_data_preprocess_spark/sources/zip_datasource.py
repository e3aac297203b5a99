"""Spark 4 Python DataSource for monthly tick ZIP archives.

The ``binaryFile`` + ``mapInPandas`` path (ingest.py:47-82) materializes
each archive as a blob *row* — the whole ZIP travels through the plan as
column data before decoding. Fine at 5-50 MB per month; a hazard if an
archive is ever large. This source is the Spark-4-idiomatic alternative
(pyspark.sql.datasource, added in Spark 4.0): planning assigns one
partition per archive *path*, and each executor task opens its file
lazily and streams decoded Arrow batches — no blob ever becomes plan
data, and per-archive parallelism (the reference's per-month download
granularity, downloader.py:40-82) falls out of the partitioning.

Usage::

    spark.dataSource.register(ExnessZipDataSource)
    df = (spark.read.format("exness_zip")
          .option("glob", "/data/ticks/EURUSD/*.zip").load())

``glob`` expands driver-side at planning; paths must be reachable from
executors (shared FS / object store — the same contract every file
source has). Output schema matches the raw CSV surface
(``Timestamp timestamp, Bid double, Ask double``); normalization to the
tick schema stays in :func:`ingest.load_ticks_zip`-style callers.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

__all__ = ["ExnessZipDataSource", "register_zip_source"]

_SCHEMA_DDL = "Timestamp timestamp, Bid double, Ask double"


class _ZipPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _ZipReader(DataSourceReader):
    def __init__(self, options: dict):
        glob_pat = options.get("glob") or options.get("path")
        if not glob_pat:
            raise ValueError(
                "exness_zip requires .option('glob', <pattern>) or a load path"
            )
        self.glob_pat = glob_pat

    def partitions(self):  # planning: one partition per archive
        import glob as globmod

        paths = sorted(globmod.glob(self.glob_pat))
        if not paths:
            raise FileNotFoundError(
                f"exness_zip: no archives match {self.glob_pat!r}"
            )
        return [_ZipPartition(p) for p in paths]

    def read(self, partition: _ZipPartition) -> Iterator:
        # executor-side: stream Arrow batches straight from the file —
        # the archive bytes never enter the query plan
        import zipfile

        import pandas as pd
        import pyarrow as pa

        # pandas parses to ns precision; Spark's Arrow bridge takes µs
        schema = pa.schema(
            [
                ("Timestamp", pa.timestamp("us")),
                ("Bid", pa.float64()),
                ("Ask", pa.float64()),
            ]
        )
        with zipfile.ZipFile(partition.path) as zf:
            for name in zf.namelist():
                if not name.lower().endswith(".csv"):
                    continue
                with zf.open(name) as fh:
                    for chunk in pd.read_csv(
                        fh,
                        usecols=["Timestamp", "Bid", "Ask"],
                        parse_dates=["Timestamp"],
                        chunksize=500_000,
                    ):
                        ts = pa.Array.from_pandas(
                            chunk["Timestamp"].dt.tz_localize(None)
                        ).cast(pa.timestamp("us"))
                        yield pa.RecordBatch.from_arrays(
                            [
                                ts,
                                pa.array(chunk["Bid"], pa.float64()),
                                pa.array(chunk["Ask"], pa.float64()),
                            ],
                            schema=schema,
                        )


class ExnessZipDataSource(DataSource):
    """``spark.read.format("exness_zip")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "exness_zip"

    def schema(self) -> str | StructType:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _ZipReader(self.options)


def register_zip_source(spark) -> None:
    """Idempotent registration helper."""
    spark.dataSource.register(ExnessZipDataSource)
