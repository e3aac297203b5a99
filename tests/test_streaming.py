"""Streaming extension: watermarked OHLC window agg and the stateful
session operator, both checked against their batch-expressible twins on the
same static data (the streaming analog of the DuckDB differential)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from exness_data_preprocess_spark.schema import TICK_SCHEMA
from exness_data_preprocess_spark.streaming import (
    run_available_now_to_memory,
    stateful_gap_sessions,
    stream_ohlc_1m,
    tick_file_stream,
)


@pytest.fixture(scope="module")
def tick_dir(spark, tick_dfs, tmp_path_factory):
    raw, _ = tick_dfs
    path = str(tmp_path_factory.mktemp("stream_ticks"))
    raw.write.mode("overwrite").parquet(path)
    return path


def test_stream_ohlc_matches_batch(spark, tick_dir):
    stream = tick_file_stream(spark, tick_dir, TICK_SCHEMA)
    bars = stream_ohlc_1m(stream, watermark="5 minutes")
    # complete mode: a finite drain must emit every window, including those
    # the watermark hasn't finalized.
    got = run_available_now_to_memory(bars, "t_ohlc_stream", "complete").toPandas()

    batch = (
        spark.read.parquet(tick_dir)
        .groupBy("instrument", F.date_trunc("minute", "timestamp").alias("minute"))
        .agg(
            F.min_by("bid", "timestamp").alias("open"),
            F.max("bid").alias("high"),
            F.min("bid").alias("low"),
            F.max_by("bid", "timestamp").alias("close"),
            F.round(F.avg(F.col("ask") - F.col("bid")), 10).alias("spread_avg"),
            F.count("timestamp").alias("tick_count"),
        )
        .toPandas()
    )
    key = ["instrument", "minute"]
    got = got.sort_values(key).reset_index(drop=True)[batch.columns]
    batch = batch.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, batch, check_exact=False, rtol=1e-12)


def test_stream_ohlc_append_respects_watermark(spark, tick_dir):
    """Append mode emits only watermark-finalized windows — a subset of the
    complete result, never windows newer than (max event time - delay)."""
    stream = tick_file_stream(spark, tick_dir, TICK_SCHEMA)
    bars = stream_ohlc_1m(stream, watermark="5 minutes")
    got = run_available_now_to_memory(bars, "t_ohlc_append", "append").toPandas()
    mx = spark.read.parquet(tick_dir).agg(F.max("timestamp")).collect()[0][0]
    assert len(got) > 0
    assert got["minute"].max() <= mx
    # every emitted window is final: window end + delay <= max event time
    late_ok = got["minute"] + pd.Timedelta(minutes=1 + 5) <= mx
    assert late_ok.all()


def test_stateful_sessions_match_batch_lag(spark, tick_dir):
    stream = tick_file_stream(spark, tick_dir, TICK_SCHEMA)
    sess = stateful_gap_sessions(stream, gap_seconds=300.0)
    got = run_available_now_to_memory(sess, "t_sessions", "append").toPandas()

    # Batch twin: lag-gap session ids (SQL-expressible), drop each
    # instrument's last session (still open in the stream → not emitted).
    ticks = spark.read.parquet(tick_dir)
    w = Window.partitionBy("instrument").orderBy("timestamp")
    sid = F.sum(
        F.when(
            F.col("timestamp").cast("double")
            - F.lag(F.col("timestamp").cast("double")).over(w)
            > 300.0,
            1,
        ).otherwise(0)
    ).over(w)
    by_sess = (
        ticks.withColumn("sid", sid)
        .groupBy("instrument", "sid")
        .agg(
            F.min("timestamp").alias("session_start"),
            F.max("timestamp").alias("session_end"),
            F.count("*").alias("n_ticks"),
            F.min_by("bid", "timestamp").alias("open"),
            F.max_by("bid", "timestamp").alias("close"),
        )
    )
    last_sid = by_sess.groupBy("instrument").agg(F.max("sid").alias("last_sid"))
    closed = (
        by_sess.join(last_sid, "instrument")
        .filter(F.col("sid") < F.col("last_sid"))
        .drop("sid", "last_sid")
        .toPandas()
    )

    key = ["instrument", "session_start"]
    got = got.sort_values(key).reset_index(drop=True)[closed.columns]
    closed = closed.sort_values(key).reset_index(drop=True)
    # n_ticks differs on duplicate-key rows? No — stream processes raw rows,
    # batch twin too; both count physical rows.
    pd.testing.assert_frame_equal(got, closed, check_exact=False, rtol=1e-12)


def test_stream_checkpoint_restart_exactly_once(spark, tick_dfs, tmp_path):
    """Two availableNow drains over a growing source dir, sharing one
    checkpoint: the second run must process only the NEW file, and each
    finalized window lands in the sink exactly once."""
    import datetime as dt

    from exness_data_preprocess_spark.schema import TICK_SCHEMA

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))

    def ticks(day, n):
        base = dt.datetime(2024, 5, day, 12, 0, tzinfo=dt.timezone.utc)
        return spark.createDataFrame(
            [
                ("EURUSD", base + dt.timedelta(seconds=20 * i), 1.1 + i * 1e-4, 1.1)
                for i in range(n)
            ],
            TICK_SCHEMA,
        )

    ticks(1, 30).write.mode("append").parquet(src)

    def drain():
        from exness_data_preprocess_spark.streaming import write_stream_ohlc

        stream = tick_file_stream(spark, src, TICK_SCHEMA)
        bars = stream_ohlc_1m(stream, watermark="2 minutes")
        q = write_stream_ohlc(bars, out, ckpt, available_now=True)
        q.awaitTermination(120)
        assert not q.isActive

    drain()
    first = spark.read.parquet(out).count()
    # day-1 max event time is 12:09:40; windows ending <= 12:07 finalized
    assert first > 0

    ticks(2, 30).write.mode("append").parquet(src)
    drain()
    final = spark.read.parquet(out).toPandas()

    # exactly-once: every (instrument, minute) window appears at most once
    assert not final.duplicated(["instrument", "minute"]).any()
    # restart picked up day-2 windows; day-1 windows were NOT re-emitted
    days = final["minute"].dt.day.value_counts().to_dict()
    assert set(days) == {1, 2}
    # batch equivalence on the finalized subset
    batch = (
        spark.read.parquet(src)
        .groupBy("instrument", F.date_trunc("minute", "timestamp").alias("minute"))
        .count()
        .toPandas()
    )
    merged = final.merge(batch, on=["instrument", "minute"], how="left")
    assert (merged["tick_count"] == merged["count"]).all()


def test_stream_dedup_collapses_redelivery(spark, tmp_path):
    """dropDuplicatesWithinWatermark: re-delivered ticks collapse exactly
    once across micro-batches while state stays watermark-bounded."""
    import datetime as dt

    from exness_data_preprocess_spark.schema import TICK_SCHEMA
    from exness_data_preprocess_spark.streaming import (
        run_available_now_to_memory,
        stream_dedup_ticks,
        tick_file_stream,
    )

    src = str(tmp_path / "in")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ticks(n, offset=0):
        return spark.createDataFrame(
            [
                ("EURUSD", base + dt.timedelta(seconds=offset + 10 * i),
                 1.1 + i * 1e-4, 1.1001 + i * 1e-4)
                for i in range(n)
            ],
            TICK_SCHEMA,
        )

    # batch 1 and an overlapping re-delivery (same keys, same rows)
    ticks(20).write.mode("append").parquet(src)
    ticks(20).write.mode("append").parquet(src)
    # plus fresh rows beyond the overlap
    ticks(10, offset=200).write.mode("append").parquet(src)

    stream = tick_file_stream(spark, src, TICK_SCHEMA)
    dd = stream_dedup_ticks(stream, watermark="10 minutes")
    out = run_available_now_to_memory(dd, "dedup_test_sink", "append").toPandas()

    assert len(out) == 30
    assert not out.duplicated(["instrument", "timestamp"]).any()


def test_stream_stream_time_join_matches_batch(spark, tmp_path):
    """Stream-stream join with an event-time range: drained result equals
    the batch join, and only in-window pairs emit."""
    import datetime as dt

    from exness_data_preprocess_spark.streaming import (
        run_available_now_to_memory,
        stream_stream_time_join,
    )

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        # (id, user, ts, kind)
        (1, 7, base, "click"),
        (2, 7, base + dt.timedelta(minutes=5), "purchase"),   # joins click 1
        (3, 7, base + dt.timedelta(minutes=90), "purchase"),  # out of 1h window
        (4, 8, base + dt.timedelta(minutes=2), "click"),
        (5, 9, base + dt.timedelta(minutes=3), "purchase"),   # no click for user 9
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, kind string"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    purchases = stream.filter("kind = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = stream.filter("kind = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = stream_stream_time_join(
        purchases, clicks, "p_user", "c_user", "p_ts", "c_ts",
        lookback_seconds=3600, watermark="10 minutes",
    )
    out = run_available_now_to_memory(j, "ss_join_test", "append").toPandas()
    assert sorted(zip(out["purchase_id"], out["click_id"])) == [(2, 1)]


def test_running_anomaly_state_carries_across_batches(spark, tmp_path):
    """Two files → (typically) two micro-batches: the second batch's
    n_prev/sum6_prev must continue from the first batch's state, and the
    deviation flag must fire on the planted outlier."""
    import datetime as dt

    from exness_data_preprocess_spark.streaming import run_available_now_to_memory
    from exness_data_preprocess_spark.streaming.anomaly import (
        stateful_running_anomaly,
    )

    base = dt.datetime(2024, 7, 1, 9, 0, 0)
    src = str(tmp_path / "src")
    rows1 = [(i, 1, base + dt.timedelta(seconds=i), 10.0) for i in range(5)]
    rows2 = [
        (5, 1, base + dt.timedelta(seconds=5), 10.0),
        (6, 1, base + dt.timedelta(seconds=6), 900.0),  # outlier
    ]
    schema = "event_id long, user_id long, ts timestamp, value double"
    # one file per append so maxFilesPerTrigger=1 replays them in order
    spark.createDataFrame(rows1, schema).repartition(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows2, schema).repartition(1).write.mode(
        "append"
    ).parquet(src)

    stream = spark.readStream.format("parquet").schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", "1").load(src)
    out = run_available_now_to_memory(
        stateful_running_anomaly(stream, threshold=250.0),
        "anomaly_test_sink",
        "append",
    ).toPandas().sort_values("event_id")

    assert list(out["n_prev"]) == list(range(7))
    assert out[out["event_id"] == 6]["anomaly"].iloc[0] == 1
    assert out[out["event_id"] != 6]["anomaly"].sum() == 0


def test_stream_ingest_gate_matches_batch_incremental_dedup(spark, tmp_path):
    """The streaming ingest gate (per-row minhash + stream-static index
    joins + one complete-mode aggregation) must reproduce the batch
    incremental_dedup flags exactly for the same corpus index."""
    from exness_data_preprocess_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
    )
    from exness_data_preprocess_spark.streaming import (
        run_available_now_to_memory,
    )
    from exness_data_preprocess_spark.streaming.ingest_gate import (
        stream_incremental_dedup,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five six"),
            (3, "quick brown fox jumps over dog"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),      # exact dup of 1
            (11, "one two three four five six seven"),   # near dup of 2
            (12, "totally novel content appears here"),  # fresh
        ],
        "doc_id long, text string",
    )
    idx = build_dedup_index(corpus)
    expected = sorted(map(tuple, incremental_dedup(new, corpus).collect()))

    src = str(tmp_path / "incoming")
    new.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.format("parquet").schema(new.schema).load(src)
    )
    gate = stream_incremental_dedup(stream, idx)
    got = sorted(
        map(
            tuple,
            run_available_now_to_memory(
                gate, "t_ingest_gate", "complete"
            ).collect(),
        )
    )
    assert got == expected


def test_stream_cdc_snapshot_multibatch_matches_batch_apply(spark, tmp_path):
    """foreachBatch CDC composition: three seq-monotone micro-batches
    (maxFilesPerTrigger=1, one file each) must land on exactly the
    result of one batch apply_cdc over the whole change set."""
    from exness_data_preprocess_spark.operators.cdc import apply_cdc
    from exness_data_preprocess_spark.streaming.cdc_stream import (
        run_cdc_snapshot_available_now,
    )

    base = spark.createDataFrame(
        [(k, f"v{k}") for k in range(6)], "k long, v string"
    )
    # seq-monotone slices: file i carries seqs [10i, 10i+10)
    slices = [
        [(0, 1, "U", "a1"), (1, 2, "D", None), (6, 3, "U", "new6")],
        [(0, 11, "U", "a2"), (2, 12, "D", None), (6, 13, "D", None)],
        [(0, 21, "D", None), (3, 22, "U", "c2"), (7, 23, "U", "new7")],
    ]
    d = tmp_path / "cdc_in"
    d.mkdir()
    for i, rows in enumerate(slices):
        spark.createDataFrame(
            rows, "k long, seq long, op string, v string"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / f"b{i}"))

    schema = "k long, seq long, op string, v string"
    stage = tmp_path / "stage"
    stage.mkdir()
    import glob as _g
    import os
    import shutil
    import time as _t

    # the file stream source orders batches by modification time — pin
    # strictly-ascending mtimes explicitly (copies land too fast to rely
    # on the clock, which made this flaky)
    base_t = _t.time() - 100
    for i in range(3):
        src = _g.glob(str(d / f"b{i}" / "part-*.parquet"))[0]
        dst = stage / f"{i:04d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (base_t + 10 * i, base_t + 10 * i))

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(stage))
    )
    got = run_cdc_snapshot_available_now(
        stream, base, ("k",), query_name="cdc_multibatch_test"
    )
    all_changes = spark.createDataFrame(
        [r for s in slices for r in s], schema
    )
    want = apply_cdc(base, all_changes, ("k",))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # spot semantics: 0 deleted in last batch, 6 inserted-then-deleted,
    # 7 inserted late, 4/5 untouched
    m = {r["k"]: r["v"] for r in got.collect()}
    assert 0 not in m and 1 not in m and 2 not in m and 6 not in m
    assert m[3] == "c2" and m[7] == "new7" and m[4] == "v4" and m[5] == "v5"
