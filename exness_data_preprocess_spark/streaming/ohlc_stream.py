"""Structured Streaming variant of the tick→OHLC pipeline.

The reference is strictly monthly-batch (SURVEY.md §2 "Streaming: none");
its closest analog is incremental append mode
(clickhouse_ohlc_generator.py:133). This module is the Spark-native
extension: the same 1-minute OHLC aggregation (D1,
clickhouse_ohlc_generator.py:150-196) expressed as a watermarked streaming
window aggregation, so new tick files landing in a directory roll into
bars continuously instead of via the reference's delete + re-insert cycle.

Design notes:

- **Same logical agg as batch.** open/close use min/max over a
  ``struct(ts, value)`` — the streaming-safe spelling of argMin/argMax
  (identical results when timestamps are unique within a bucket, which the
  tick schema's (instrument, timestamp) key guarantees).
- **Watermark bounds state.** ``withWatermark(on, delay)`` lets the state
  store evict minute windows once event time passes; without it a 100 TB
  stream accumulates state forever. Append output emits each bar exactly
  once, when its window is finalized — the streaming replacement for the
  reference's "regenerate the whole range" model.
- **File source scales.** ``readStream`` lists new files per micro-batch;
  with ``maxFilesPerTrigger`` the ingest rate is throttled, and each
  micro-batch is a normal partitioned scan → shuffle by (instrument,
  window) → state update.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def tick_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source tick stream (streaming twin of A2/A4 scans)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def stream_ohlc_1m(
    ticks: DataFrame,
    on: str = "timestamp",
    key: str = "instrument",
    price: str = "bid",
    spread: tuple[str, str] | None = ("ask", "bid"),
    watermark: str = "10 minutes",
    window_size: str = "1 minute",
) -> DataFrame:
    """Watermarked streaming 1-minute OHLC bars.

    Output columns mirror the batch D1 aggregate: (key, minute, open,
    high, low, close, spread_avg, tick_count).
    """
    ts = F.col(on)
    p = F.col(price)
    aggs = [
        F.min(F.struct(ts.alias("t"), p.alias("v"))).alias("_open"),
        F.max(p).alias("high"),
        F.min(p).alias("low"),
        F.max(F.struct(ts.alias("t"), p.alias("v"))).alias("_close"),
        F.count(ts).alias("tick_count"),
    ]
    if spread is not None:
        aggs.append(
            F.avg(F.col(spread[0]) - F.col(spread[1])).alias("spread_avg")
        )
    agg = (
        ticks.withWatermark(on, watermark)
        .groupBy(F.col(key), F.window(ts, window_size).alias("w"))
        .agg(*aggs)
    )
    cols = [
        F.col(key),
        F.col("w.start").alias("minute"),
        F.col("_open.v").alias("open"),
        "high",
        "low",
        F.col("_close.v").alias("close"),
    ]
    if spread is not None:
        cols.append(F.round("spread_avg", 10).alias("spread_avg"))
    cols.append("tick_count")
    return agg.select(*cols)


def stream_dedup_ticks(
    ticks: DataFrame,
    key_cols: tuple[str, ...] = ("instrument", "timestamp"),
    on: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup on the tick sort key — the streaming twin of the
    write-side ``dropDuplicates`` (D8 / ReplacingMergeTree semantics).

    ``dropDuplicatesWithinWatermark`` keeps the first row per key and
    evicts key state once event time passes the watermark, so re-delivered
    ticks (at-least-once sources, overlapping archive loads) collapse
    exactly once while state stays bounded by the watermark horizon — the
    property that lets a 100 TB/day stream run forever.
    """
    return ticks.withWatermark(on, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def write_stream_ohlc(
    bars: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = False,
    processing_interval: str | None = None,
):
    """Production sink: append finalized OHLC windows to partitioned
    parquet with checkpointed exactly-once delivery.

    Partition layout matches the batch catalog (review find: the old
    writer claimed "partitioned parquet" but never called partitionBy):
    when the bar frame carries (instrument, minute), a ``year_month``
    column is derived and the write partitions by
    (instrument, year_month) — the same directories ``ParquetCatalog``
    prunes — otherwise the frame is written flat as-is.

    ``available_now=True`` drains the current backlog and stops (backfill
    mode); otherwise the query runs continuously, micro-batching on
    ``processing_interval`` (None → as-fast-as-possible). Restarts resume
    from the checkpoint with no duplicate or lost windows
    (tests/test_streaming.py::test_stream_checkpoint_restart_exactly_once).
    """
    from exness_data_preprocess_spark.functions.timefuncs import year_month

    part_cols: list[str] = []
    if "instrument" in bars.columns and "minute" in bars.columns:
        bars = bars.withColumn("year_month", year_month(F.col("minute")))
        part_cols = ["instrument", "year_month"]
    writer = (
        bars.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_interval is not None:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()


def run_available_now_to_memory(
    df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_seconds: float = 300.0,
) -> DataFrame:
    """Drain all currently-available input through ``df``'s streaming plan
    into an in-memory table and return it as a batch DataFrame.

    ``availableNow`` processes the backlog in bounded micro-batches then
    stops — the pattern for catch-up/backfill runs of a streaming job. NOTE
    append mode only emits windows finalized by the watermark; callers
    wanting every window from a finite drain should pass
    ``output_mode="complete"`` (aggregations only).
    """
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        drained = q.awaitTermination(timeout_seconds)
    finally:
        if q.isActive:  # pragma: no cover - only on timeout
            q.stop()
    if not drained:  # pragma: no cover - only on timeout
        # a partial memory table silently masquerading as "the drained
        # output" is worse than failing (review find)
        raise TimeoutError(
            f"availableNow drain of {query_name!r} did not finish within "
            f"{timeout_seconds}s; partial results discarded"
        )
    return df.sparkSession.table(query_name)


def stream_stream_time_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    watermark: str,
) -> DataFrame:
    """Watermarked stream-stream inner join: each left row matches right
    rows of equal key inside ``[left_ts − lookback, left_ts]`` — the
    attribution/enrichment join (purchase ← preceding clicks, trade ←
    preceding quotes).

    The event-time range condition is what makes this runnable forever:
    Spark derives state watermarks from it, so each side buffers only
    ``lookback + watermark delay`` of history per key and evicts older
    state — state size is bounded by rate × horizon, independent of
    stream age. ``watermark`` must be ≥ the lateness you accept; a match
    emits as soon as both rows have arrived.

    Column names must be disjoint across the two sides (rename before
    calling) — the join keeps all columns of both.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (
            F.col(right_ts)
            >= F.col(left_ts) - F.expr(f"INTERVAL {lookback_seconds} SECONDS")
        )
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return lw.join(rw, cond, "inner")
