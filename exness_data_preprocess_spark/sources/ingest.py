"""Tick ingestion: ZIP/CSV → normalized tick DataFrame (SURVEY A2/A3).

Reference (tick_loader.py:37-67): pandas ``read_csv(usecols=[Timestamp,
Bid, Ask], parse_dates)`` + UTC localization, then column rename/ordering
and a constant instrument column at insert (clickhouse_manager.py:271-330).

Spark-first: ``spark.read.csv`` with an explicit schema (no inference scan)
reads any number of monthly files in parallel; ZIP archives are read
through the ``binaryFile`` source + ``mapInPandas`` (ZIP is not a splittable
codec, so each archive decodes in one task — exactly the per-month
granularity the reference downloads at).
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exness_data_preprocess_spark.schema import TICK_CSV_SCHEMA, TICK_SCHEMA


def load_ticks_csv(
    spark: SparkSession, paths: str | list[str], instrument: str
) -> DataFrame:
    """CSV(s) → normalized tick rows (timestamp, bid, ask, instrument).

    FAILFAST mode (review find): the default PERMISSIVE read turned a
    row with an unparseable Timestamp into a null-timestamp tick —
    violating TICK_SCHEMA's non-null contract — and the write-side
    ``dropDuplicates`` then collapsed all such junk rows into one,
    destroying the evidence. The reference's ``pandas.read_csv(
    parse_dates=...)`` raises on malformed source data (processor.py:
    283-307); failing loudly on a corrupt archive is the parity
    behavior."""
    df = spark.read.csv(
        paths, schema=TICK_CSV_SCHEMA, header=True, mode="FAILFAST"
    )
    return normalize_ticks(df, instrument)


def normalize_ticks(df: DataFrame, instrument: str) -> DataFrame:
    """Rename CSV ingress columns and stamp the instrument
    (clickhouse_manager.py:283-307): Timestamp→timestamp, Bid→bid, Ask→ask,
    constant uppercased instrument, canonical column order."""
    return df.select(
        F.lit(instrument.upper()).alias("instrument"),
        F.col("Timestamp").alias("timestamp"),
        F.col("Bid").cast("double").alias("bid"),
        F.col("Ask").cast("double").alias("ask"),
    )


def load_ticks_zip(
    spark: SparkSession, zip_glob: str, instrument: str
) -> DataFrame:
    """Distributed ZIP→CSV decode (A2) via binaryFile + mapInPandas.

    Each monthly archive (~5-50 MB, one CSV inside) is decoded in a single
    Arrow-batched task; at 100 TB the parallelism unit is the archive,
    which matches the reference's per-month download granularity
    (downloader.py:40-82).
    """
    binaries = spark.read.format("binaryFile").load(zip_glob)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for name in zf.namelist():
                        if not name.lower().endswith(".csv"):
                            continue
                        with zf.open(name) as fh:
                            chunk = pd.read_csv(
                                fh,
                                usecols=["Timestamp", "Bid", "Ask"],
                            )
                        # parse explicitly: pandas' parse_dates leaves an
                        # OBJECT column on any malformed row (no error),
                        # and .dt on it raises an AttributeError that
                        # names neither archive nor member (review find)
                        try:
                            ts = pd.to_datetime(
                                chunk["Timestamp"], errors="raise"
                            )
                        except (ValueError, TypeError) as exc:
                            raise ValueError(
                                f"malformed Timestamp in {name!r}: {exc}"
                            ) from exc
                        if getattr(ts.dt, "tz", None) is not None:
                            ts = ts.dt.tz_localize(None)
                        chunk["Timestamp"] = ts
                        yield chunk[["Timestamp", "Bid", "Ask"]]

    decoded = binaries.select("content").mapInPandas(decode, TICK_CSV_SCHEMA)
    return normalize_ticks(decoded, instrument)


def with_dedup(df: DataFrame) -> DataFrame:
    """Eager (instrument, timestamp) dedup — ReplacingMergeTree analog
    (clickhouse_manager.py:159; SURVEY.md §1.3)."""
    return df.dropDuplicates(["instrument", "timestamp"])


def empty_ticks(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], TICK_SCHEMA)
