"""Registry entries for the round-2 training-pipeline additions: dup-pair
→ cluster resolution (connected components), bucketed interval joins,
benchmark decontamination, rolling event-time windows, repetition-quality
signals, stratified sampling, and int8 embedding quantization.

Every entry has a DuckDB oracle (the connected-components one is a
recursive CTE — min-label reachability — so even the iterative graph
operator is value-hash-checked, not rows-only). Determinism rules follow
round 1's lessons: decimal-quantized windowed sums, identical IEEE
expression shapes for ratio math, md5-derived hashes shared bit-for-bit
between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from exness_data_preprocess_spark.functions.hashing import md5_h32_sql

from exness_data_preprocess_spark.operators.graph import connected_components
from exness_data_preprocess_spark.operators.intervals import interval_join
from exness_data_preprocess_spark.operators.similarity import quantize_embeddings
from exness_data_preprocess_spark.operators.textstats import (
    decontaminate,
    repetition_features,
    stratified_sample,
)
from exness_data_preprocess_spark.plans.registry_ext import (
    SKIP_ITERATIVE,
    SKIP_STREAMING_DRAIN,
)
from exness_data_preprocess_spark.plans.registry_ml import (
    ORACLE_DEDUP_NGRAM_JACCARD,
)

# Shared DuckDB fragments (same idioms as registry_ml)
_TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"
_SH3 = (
    "CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform("
    "generate_series(1, len(toks) - 2), i -> array_to_string(toks[i:i+2], ' ')))"
    " ELSE [] END"
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS) → normalized to µs UTC
    (shared reader-version-robust path, plans/events_io.py)."""
    from exness_data_preprocess_spark.plans.events_io import load_events

    return load_events(spark, sf_dir)


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs → dedup clusters
# ---------------------------------------------------------------------------
def _sparse_components(docs: DataFrame) -> DataFrame:
    """Sparsified near-dup components: the n-gram-Jaccard edge list
    (threshold 0.9) deterministically thinned to 5% (md5 rule shared with
    the oracle), clustered by min-label CC. Near-dup families are
    near-cliques; dropping 95% of edges keeps them connected but turns
    direct edges into multi-hop chains — a *stronger* transitivity test
    for the operator — and bounds the recursive-CTE oracle, whose
    reachability set is O(component²·degree) and would be cubic on the
    raw cliques."""
    from exness_data_preprocess_spark.functions.hashing import md5_h32
    from exness_data_preprocess_spark.operators.dedup import ngram_jaccard_pairs

    edges = (
        ngram_jaccard_pairs(docs, threshold=0.9)
        .filter(
            md5_h32(
                F.concat(
                    F.col("id_a").cast("string"),
                    F.lit(":"),
                    F.col("id_b").cast("string"),
                )
            )
            % 20
            == 0
        )
        .select("id_a", "id_b")
    )
    return connected_components(edges, docs.select("doc_id"))


def q_dup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the n-gram-Jaccard near-dup pairs (threshold 0.9, the
    dedup_ngram_jaccard edge list) into components; every doc gets the min
    reachable doc_id as its cluster id — the canonical-doc key a dedup
    pipeline keeps. Edge sparsification rationale: `_sparse_components`."""
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    return _sparse_components(_docs_spread(spark, sf_dir))


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup *resolution*: the near-dup components from the CC pass,
    resolved to the one doc per cluster a curation pipeline keeps — the
    longest member, ties to the lowest id (Dolma/FineWeb keep-best rule)
    — plus the payload volume the drop removes. Single-member components
    are excluded (nothing to resolve)."""
    from exness_data_preprocess_spark.operators.graph import best_docs_per_cluster
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return best_docs_per_cluster(docs, _sparse_components(docs))


ORACLE_DUP_CC = f"""
WITH RECURSIVE all_pairs AS ({ORACLE_DEDUP_NGRAM_JACCARD}),
pairs AS (
  SELECT id_a, id_b FROM all_pairs
  WHERE (('0x' || substr(md5(id_a::VARCHAR || ':' || id_b::VARCHAR), 1, 8))::BIGINT)
        % 20 = 0
),
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
walk(id, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.root FROM walk w JOIN e ON e.src = w.id
)
SELECT id AS doc_id, min(root) AS component FROM walk GROUP BY id
"""

# Dedup resolution on top of the CC map: keep-best per multi-member
# cluster (longest doc, ties to lowest id), one window in the oracle vs
# the Spark side's partial-aggregable max_by struct.
ORACLE_DEDUP_KEEP_BEST = f"""
WITH comp AS ({ORACLE_DUP_CC}),
m AS (
  SELECT c.component, d.doc_id, d.n_chars,
         count(*) OVER (PARTITION BY c.component) AS cluster_size,
         sum(d.n_chars) OVER (PARTITION BY c.component) AS total_chars,
         row_number() OVER (
           PARTITION BY c.component ORDER BY d.n_chars DESC, d.doc_id
         ) AS rk
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT component, cluster_size::BIGINT AS cluster_size,
       doc_id AS kept_doc_id, n_chars AS kept_n_chars,
       (total_chars - n_chars)::BIGINT AS dropped_n_chars
FROM m WHERE rk = 1 AND cluster_size >= 2
"""


# ---------------------------------------------------------------------------
# C4-style blocklist screening (drop / redact / keep)
# ---------------------------------------------------------------------------
BLOCKLIST_TERMS = ["slow", "big", "filter", "merge"]
_BLOCKLIST_PAT = r"\b(" + "|".join(BLOCKLIST_TERMS) + r")\b"
_BLOCKLIST_DROP_AT = 8


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist screening over the corpus: whole-word hit counts, the
    drop/redact decision, and the md5 of the redacted text (NULL for
    dropped docs — their content never leaves the filter). Clean docs
    are omitted from the report (they pass unchanged)."""
    from exness_data_preprocess_spark.operators.textstats import blocklist_screen
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    screened = blocklist_screen(
        docs, BLOCKLIST_TERMS, drop_threshold=_BLOCKLIST_DROP_AT
    )
    return screened.filter(F.col("n_blocklist_hits") > 0).select(
        "doc_id",
        "lang",
        "source",
        F.col("n_blocklist_hits").cast("long").alias("n_blocklist_hits"),
        "screen_action",
        F.md5("redacted_text").alias("redacted_md5"),
    )


ORACLE_BLOCKLIST = f"""
WITH h AS (
  SELECT doc_id, lang, source,
         len(regexp_extract_all(text, '{_BLOCKLIST_PAT}'))::BIGINT
           AS n_blocklist_hits,
         regexp_replace(text, '{_BLOCKLIST_PAT}', '[REDACTED]', 'g') AS red
  FROM documents
)
SELECT doc_id, lang, source, n_blocklist_hits,
       CASE WHEN n_blocklist_hits >= {_BLOCKLIST_DROP_AT} THEN 'drop'
            ELSE 'redact' END AS screen_action,
       CASE WHEN n_blocklist_hits >= {_BLOCKLIST_DROP_AT} THEN NULL
            ELSE md5(red) END AS redacted_md5
FROM h WHERE n_blocklist_hits > 0
"""


# ---------------------------------------------------------------------------
# Deterministic training-shard manifest
# ---------------------------------------------------------------------------
def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-shard deterministic assignment manifest: per-shard doc count,
    payload size, id range, and the ascending-id md5 fingerprint a
    trainer verifies its shard against."""
    from exness_data_preprocess_spark.operators.textstats import shard_manifest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shard_manifest(docs, n_shards=64, seed="shard-v1")


ORACLE_TRAINING_SHARDS = """
WITH s AS (
  SELECT (('0x' || substr(md5('shard-v1' || doc_id::VARCHAR), 1, 8))::BIGINT)
           % 64 AS shard_id,
         doc_id, n_chars
  FROM documents
)
SELECT shard_id, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS ids_md5
FROM s GROUP BY shard_id
"""


# ---------------------------------------------------------------------------
# JSONL corpus round-trip (interchange-format fidelity)
# ---------------------------------------------------------------------------
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → JSONL directory (distributed sink) → schema-enforced
    PERMISSIVE read-back → per-(lang, source) fidelity fingerprints.

    The hashed columns (doc counts, char sums, and an order-free sum of
    32-bit content hashes) are computed from the *round-tripped* rows,
    while the oracle computes them from the original parquet — equality
    proves the JSONL source/sink preserves every document bit-for-bit
    (escaping, unicode, nulls). The JSONL staging dir is fingerprinted
    by the fixture's size+mtime (regenerating the fixture invalidates
    it) and written once per fingerprint."""
    import os
    import tempfile

    from exness_data_preprocess_spark.functions.hashing import md5_h32
    from exness_data_preprocess_spark.plans.registry_ext import _sf_key
    from exness_data_preprocess_spark.sources.corpus_io import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    stage = os.path.join(
        tempfile.gettempdir(),
        f"docs_jsonl_{_sf_key(sf_dir)}_{st.st_size}_{st.st_mtime_ns}",
    )
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        write_documents_jsonl(spark.read.parquet(src), stage, n_files=8)
    clean = read_documents_jsonl(spark, stage)
    return clean.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.length("text").cast("long")).alias("total_text_len"),
        F.sum(md5_h32(F.col("text"))).alias("content_h32_sum"),
    )


ORACLE_JSONL_ROUNDTRIP = """
SELECT lang, source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(length(text))::BIGINT AS total_text_len,
       sum((('0x' || substr(md5(text), 1, 8))::BIGINT))::BIGINT
         AS content_h32_sum
FROM documents GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# Exact-k per-group deterministic sampling (bounded top-k, skew-proof)
# ---------------------------------------------------------------------------
def q_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 50 docs per language, uniformly by seeded hash rank —
    the per-stratum quota sampler ("10k eval docs per language"),
    computed with the salted bounded top-k instead of a per-group
    window sort (hot-language skew spreads over the salt domain)."""
    from exness_data_preprocess_spark.operators.skew import sample_k_per_group

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return sample_k_per_group(docs, k=50, group_cols=("lang",))


ORACLE_SAMPLE_K = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY (('0x' || substr(md5('samplek-v1' || doc_id::VARCHAR), 1, 8))::BIGINT), doc_id
         ) AS rk
  FROM documents
) WHERE rk <= 50
"""


# ---------------------------------------------------------------------------
# CDC / MERGE application over the events stream
# ---------------------------------------------------------------------------
_CDC_SPLIT = "2024-01-16 00:00:00"


def _cdc_base(ev: DataFrame) -> DataFrame:
    cut = F.lit(_CDC_SPLIT).cast("timestamp")
    return (
        ev.filter(F.col("ts") < cut)
        .groupBy("user_id")
        .agg(F.max(F.struct("event_id", "value")).alias("_s"))
        .select(
            "user_id",
            F.col("_s.event_id").alias("last_event_id"),
            F.col("_s.value").alias("last_value"),
        )
    )


def _cdc_changes(ev: DataFrame) -> DataFrame:
    cut = F.lit(_CDC_SPLIT).cast("timestamp")
    return ev.filter(F.col("ts") >= cut).select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_id").alias("last_event_id"),
        F.col("value").alias("last_value"),
    )


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics on plain parquet: the per-user snapshot as of
    Jan 16 (latest event wins), advanced by the second half-month of
    events as a CDC batch — ``error`` events are tombstones, everything
    else upserts. Exercises insert (new user), update (higher seq wins),
    delete, and untouched-key passthrough in one plan."""
    from exness_data_preprocess_spark.operators.cdc import apply_cdc

    ev = _events(spark, sf_dir)
    return apply_cdc(
        _cdc_base(ev), _cdc_changes(ev), ("user_id",), seq_col="seq"
    )


def q_streaming_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``cdc_apply``: the same change set consumed as
    a file-source stream (availableNow drain) through per-micro-batch
    ``apply_cdc`` (foreachBatch — Spark's production CDC-apply shape);
    the drained snapshot must be bit-identical to the batch MERGE."""
    from exness_data_preprocess_spark.plans.registry_ext import (
        _events_stream,
        _sf_key,
    )
    from exness_data_preprocess_spark.streaming.cdc_stream import (
        run_cdc_snapshot_available_now,
    )

    base = _cdc_base(_events(spark, sf_dir))
    changes = _cdc_changes(_events_stream(spark, sf_dir))
    return run_cdc_snapshot_available_now(
        changes,
        base,
        ("user_id",),
        seq_col="seq",
        query_name=f"cdc_snap_{_sf_key(sf_dir)}",
    )


ORACLE_CDC_APPLY = f"""
WITH base AS (
  SELECT user_id, max(event_id) AS last_event_id,
         arg_max(value, event_id) AS last_value
  FROM events WHERE ts < TIMESTAMP '{_CDC_SPLIT}' GROUP BY user_id
),
latest AS (
  SELECT user_id, event_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rk
  FROM events WHERE ts >= TIMESTAMP '{_CDC_SPLIT}'
)
SELECT b.user_id, b.last_event_id, b.last_value
FROM base b
WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.user_id = b.user_id)
UNION ALL
SELECT user_id, event_id AS last_event_id, value AS last_value
FROM latest WHERE rk = 1 AND op = 'U'
"""


# ---------------------------------------------------------------------------
# Bucketed interval join: events → per-(type, day) activity spans
# ---------------------------------------------------------------------------
def q_interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping range join: every event joined to every (event_type, day)
    activity span [min ts, max ts] containing it, then rolled up per span.
    The join goes through the hour-bucketed equi-join decomposition — no
    BroadcastNestedLoopJoin anywhere in the plan."""
    ev = _events(spark, sf_dir)
    iv = ev.groupBy(
        F.col("event_type").alias("iv_type"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("iv_day"),
    ).agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    joined = interval_join(
        ev.select("ts", "user_id"), iv,
        ts_col="ts", start_col="start_ts", end_col="end_ts",
        bucket_seconds=3600,
    )
    return joined.groupBy("iv_type", "iv_day").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


ORACLE_INTERVAL_JOIN = """
WITH iv AS (
  SELECT event_type AS iv_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS iv_day,
         min(ts) AS s, max(ts) AS e
  FROM events GROUP BY 1, 2
)
SELECT iv.iv_type, iv.iv_day,
       count(*) AS n_events,
       count(DISTINCT ev.user_id) AS n_users
FROM iv JOIN events ev ON ev.ts BETWEEN iv.s AND iv.e
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs an eval set)
# ---------------------------------------------------------------------------
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs from source 'src0' act as the benchmark set; every corpus doc is
    scored by distinct 3-gram overlap against the benchmark's shingle set
    (broadcast semi-join — the corpus side never shuffles)."""
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    bench = docs.filter(F.col("source") == "src0")
    return decontaminate(docs, bench, shingle_n=3, min_overlap=3)


ORACLE_DECONTAMINATION = f"""
WITH d AS (
  SELECT doc_id, source, {_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, source, {_SH3} AS sh FROM d
), b AS (
  SELECT DISTINCT unnest(sh) AS s FROM sh WHERE source = 'src0'
), cs AS (
  SELECT doc_id, unnest(sh) AS s FROM sh
), ov AS (
  SELECT cs.doc_id, count(*) AS overlap_ngrams
  FROM cs JOIN b USING (s) GROUP BY cs.doc_id
)
SELECT d.doc_id,
       coalesce(ov.overlap_ngrams, 0) AS overlap_ngrams,
       (coalesce(ov.overlap_ngrams, 0) >= 3)::INT AS contaminated
FROM d LEFT JOIN ov USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Rolling event-time range windows (per-user trailing hour)
# ---------------------------------------------------------------------------
def q_rolling_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour features per user. Sums run over
    DECIMAL(18,6)-quantized values (exact, order-free) and are cast to
    double only at the edge — sliding-frame float sums associate
    differently across engines and would break the value hash.

    Uses the ADAPTIVE rendering (judge r8 task 2): a sampled max-key-
    share probe picks the single-window frame plan on uniform keys and
    the bucketed decomposition above the 5% skew threshold — the r8
    skew bench showed the sliding-frame plan melting 40x on a
    50%-hot-key fixture (it re-aggregates the whole frame per row for
    non-invertible min/max) while costing ~1.8x LESS on uniform data
    than the always-bucketed insurance. Both plans are value-identical,
    so the choice can never move this entry's hash."""
    from exness_data_preprocess_spark.operators.rolling import (
        rolling_range_stats_adaptive,
    )

    ev = _events(spark, sf_dir)
    r = rolling_range_stats_adaptive(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        window_seconds=3600,
    )
    return r.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "w_cnt",
        F.col("w_sum").cast("double").alias("w_sum"),
        F.col("w_min").cast("double").alias("w_min"),
        F.col("w_max").cast("double").alias("w_max"),
    )


ORACLE_ROLLING = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       count(*) OVER w AS w_cnt,
       (sum(value::DECIMAL(18,6)) OVER w)::DOUBLE AS w_sum,
       (min(value::DECIMAL(18,6)) OVER w)::DOUBLE AS w_min,
       (max(value::DECIMAL(18,6)) OVER w)::DOUBLE AS w_max
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
"""


# ---------------------------------------------------------------------------
# Repetition-quality signals (gopher-style)
# ---------------------------------------------------------------------------
def q_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return repetition_features(docs).select(
        "doc_id",
        "dup_token_ratio",
        "top_token_ratio",
        "dup_2gram_ratio",
        "dup_3gram_ratio",
        "repetition_flag",
    )


ORACLE_REPETITION = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents
), c AS (
  SELECT doc_id,
         len(toks) AS n,
         len(list_distinct(toks)) AS d1,
         CASE WHEN len(toks) >= 2 THEN len(list_distinct(list_transform(
           generate_series(1, len(toks) - 1),
           i -> array_to_string(toks[i:i+1], ' ')))) ELSE 0 END AS d2,
         CASE WHEN len(toks) >= 3 THEN len(list_distinct(list_transform(
           generate_series(1, len(toks) - 2),
           i -> array_to_string(toks[i:i+2], ' ')))) ELSE 0 END AS d3,
         list_max(list_transform(list_distinct(toks),
           t -> len(list_filter(toks, x -> x = t)))) AS topc
  FROM d
), r AS (
  SELECT doc_id,
         CASE WHEN n > 0 THEN round(1.0 - d1::DOUBLE / n, 6) END AS dup_token_ratio,
         CASE WHEN n > 0 THEN round(topc::DOUBLE / n, 6) END AS top_token_ratio,
         CASE WHEN n - 1 > 0 THEN round(1.0 - d2::DOUBLE / (n - 1), 6) END
           AS dup_2gram_ratio,
         CASE WHEN n - 2 > 0 THEN round(1.0 - d3::DOUBLE / (n - 2), 6) END
           AS dup_3gram_ratio
  FROM c
)
SELECT doc_id, dup_token_ratio, top_token_ratio, dup_2gram_ratio, dup_3gram_ratio,
       (coalesce(dup_token_ratio, 0.0) <= 0.8
        AND coalesce(top_token_ratio, 1.0) <= 0.3
        AND coalesce(dup_2gram_ratio, 0.0) <= 0.9)::INT AS repetition_flag
FROM r
"""


# ---------------------------------------------------------------------------
# Stratified deterministic sampling
# ---------------------------------------------------------------------------
_RATES = {"en": 0.2, "de": 1.0, "fr": 0.5, "es": 0.5, "zh": 0.25}
_BUCKETS = 1_000_000


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(
        docs, _RATES, stratum_col="lang", id_col="doc_id",
        seed="sample-v1", buckets=_BUCKETS,
    ).select("doc_id", "lang", "source")


def _stratified_oracle() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {int(round(v * _BUCKETS))}"
        for k, v in sorted(_RATES.items())
    )
    return f"""
SELECT doc_id, lang, source FROM documents
WHERE (('0x' || substr(md5('sample-v1' || doc_id::VARCHAR), 1, 8))::BIGINT)
      % {_BUCKETS} < CASE lang {cases} ELSE 0 END
"""


# ---------------------------------------------------------------------------
# Document chunking (context-window splitting with overlap)
# ---------------------------------------------------------------------------
_CHUNK_TOKENS, _CHUNK_OVERLAP = 32, 8
_CHUNK_STEP = _CHUNK_TOKENS - _CHUNK_OVERLAP


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.textstats import (
        chunk_documents,
    )
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return chunk_documents(
        docs, chunk_tokens=_CHUNK_TOKENS, overlap_tokens=_CHUNK_OVERLAP
    )


ORACLE_CHUNK_DOCUMENTS = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS tk, len({_TOKS}) AS n FROM documents
), c AS (
  SELECT doc_id, n, tk,
         unnest(generate_series(0,
           CAST(ceil(greatest(0, n - {_CHUNK_TOKENS})::DOUBLE
                     / {_CHUNK_STEP}) AS INT))) AS chunk_idx
  FROM d
)
SELECT doc_id, chunk_idx,
       chunk_idx * {_CHUNK_STEP} AS tok_start,
       least({_CHUNK_TOKENS}, n - chunk_idx * {_CHUNK_STEP}) AS n_tokens,
       array_to_string(
         tk[chunk_idx * {_CHUNK_STEP} + 1 : chunk_idx * {_CHUNK_STEP} + {_CHUNK_TOKENS}],
         ' ') AS chunk_text
FROM c
"""


# ---------------------------------------------------------------------------
# Temperature-smoothed corpus mixing (α-sampling)
# ---------------------------------------------------------------------------
_MIX_ALPHA, _MIX_TARGET = 0.5, 0.5


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.textstats import (
        temperature_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_sample(
        docs, alpha=_MIX_ALPHA, target_fraction=_MIX_TARGET,
        stratum_col="lang", id_col="doc_id",
        seed="mix-v1", buckets=_BUCKETS,
    ).select("doc_id", "lang", "source")


ORACLE_TEMPERATURE_MIX = f"""
WITH g AS (
  SELECT lang, count(*) AS n_g FROM documents GROUP BY lang
), w AS (
  SELECT lang, n_g, CAST(sqrt(n_g::DOUBLE) AS DECIMAL(24,9)) AS wq FROM g
), s AS (
  SELECT CAST(sum(wq) AS DOUBLE) AS wsum,
         CAST(sum(n_g) AS BIGINT) AS n_total
  FROM w
), k AS (
  SELECT lang,
         CAST(round(least(1.0,
                ({_MIX_TARGET} * n_total::DOUBLE)
                * (CAST(wq AS DOUBLE) / wsum) / n_g::DOUBLE)
              * {_BUCKETS}) AS BIGINT) AS keep_lt
  FROM w CROSS JOIN s
)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN k USING (lang)
WHERE (('0x' || substr(md5('mix-v1' || d.doc_id::VARCHAR), 1, 8))::BIGINT)
      % {_BUCKETS} < keep_lt
"""


# ---------------------------------------------------------------------------
# int8 embedding quantization
# ---------------------------------------------------------------------------
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return quantize_embeddings(emb)


ORACLE_QUANTIZE = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e
), q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> round(x / scale)::INT) AS qq
  FROM s
)
SELECT vec_id,
       round(scale, 6) AS q_scale,
       md5(array_to_string(qq, ',')) AS q_md5,
       list_sum(list_transform(qq, x -> x::BIGINT))::BIGINT AS q_sum,
       list_sum(list_transform(qq, x -> x::BIGINT * x))::BIGINT AS q_sumsq,
       round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS norm_f32,
       round(list_max(list_transform(generate_series(1, len(v)),
             i -> abs(v[i] - qq[i] * scale))), 6) AS max_abs_err
FROM q
"""


# ---------------------------------------------------------------------------
# Batch sessionization (batch twin of streaming_gap_sessions)
# ---------------------------------------------------------------------------
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-min-gap sessions rolled up to one row per session."""
    from exness_data_preprocess_spark.operators.sessionize import sessionize

    ev = _events(spark, sf_dir)
    s = sessionize(ev, key_col="user_id", ts_col="ts",
                   tiebreak_col="event_id", gap_seconds=1800)
    return s.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min(F.unix_micros("ts")).alias("start_us"),
        F.max(F.unix_micros("ts")).alias("end_us"),
        F.countDistinct("event_type").alias("n_types"),
    )


ORACLE_SESSIONIZE = """
WITH x AS (
  SELECT user_id, event_id, event_type, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
), y AS (
  SELECT *, sum(is_new) OVER (
    PARTITION BY user_id ORDER BY epoch_us(ts), event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS session_seq
  FROM x
)
SELECT user_id, session_seq::BIGINT AS session_seq,
       count(*) AS n_events,
       min(epoch_us(ts)) AS start_us,
       max(epoch_us(ts)) AS end_us,
       count(DISTINCT event_type) AS n_types
FROM y GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sequence packing (fixed token-budget training sequences)
# ---------------------------------------------------------------------------
_PACK_BUDGET = 512


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.textstats import pack_sequences
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return pack_sequences(docs, budget=_PACK_BUDGET).select(
        "doc_id", "lang", "n_tokens", "pack_id", "pack_offset"
    )


ORACLE_PACKING = f"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         sum(least(n_tokens, {_PACK_BUDGET})) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) - least(n_tokens, {_PACK_BUDGET}) AS start
  FROM t
)
SELECT doc_id, lang, n_tokens,
       (start // {_PACK_BUDGET})::BIGINT AS pack_id,
       (start % {_PACK_BUDGET})::BIGINT AS pack_offset
FROM c
"""


# ---------------------------------------------------------------------------
# Data-quality audit + ANALYZE statistics
# ---------------------------------------------------------------------------
def q_validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative quality audit over events: every rule is a conditional
    count inside ONE aggregate over one scan."""
    from exness_data_preprocess_spark.operators.validate import validate

    ev = _events(spark, sf_dir)
    return validate(
        ev,
        {
            "null_user_id": F.col("user_id").isNull(),
            "null_event_type": F.col("event_type").isNull(),
            "negative_value": F.col("value") < 0,
            "empty_props": F.length(F.col("props")) == 0,
        },
    )


ORACLE_VALIDATE = """
SELECT 'null_user_id' AS rule,
       sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS violations,
       count(*) AS total_rows FROM events
UNION ALL
SELECT 'null_event_type',
       sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT, count(*)
FROM events
UNION ALL
SELECT 'negative_value',
       sum(CASE WHEN value < 0 THEN 1 ELSE 0 END)::BIGINT, count(*)
FROM events
UNION ALL
SELECT 'empty_props',
       sum(CASE WHEN len(props) = 0 THEN 1 ELSE 0 END)::BIGINT, count(*)
FROM events
"""


def q_analyze_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (int/string columns — cross-engine
    string rendering is exact for those; the approx-NDV column is
    engine-specific HLL and is exercised by pytest instead)."""
    from exness_data_preprocess_spark.operators.validate import analyze_columns

    ev = _events(spark, sf_dir)
    return analyze_columns(ev, ["event_id", "user_id", "event_type"]).select(
        "column", "min_value", "max_value", "null_count", "total_rows"
    )


ORACLE_ANALYZE = """
SELECT 'event_id' AS column, min(event_id)::VARCHAR AS min_value,
       max(event_id)::VARCHAR AS max_value,
       sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS null_count,
       count(*) AS total_rows
FROM events
UNION ALL
SELECT 'user_id', min(user_id)::VARCHAR, max(user_id)::VARCHAR,
       sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT, count(*)
FROM events
UNION ALL
SELECT 'event_type', min(event_type), max(event_type),
       sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT, count(*)
FROM events
"""


# ---------------------------------------------------------------------------
# Product quantization: encode + ADC top-k
# ---------------------------------------------------------------------------
_PQ_M, _PQ_K, _PQ_DSUB = 4, 16, 16  # 64-dim → 4 subspaces × 16 dims, 16 codes


def _pq_sq_dist(vec: str, cb: str) -> str:
    """Round-6 squared-L2 between ``vec``'s subspace ``cb.sub`` slice and
    codebook row ``cb.cvec`` — the fold every PQ oracle decision (encode
    argmin, ADC LUT, trained Lloyd assignment) uses; single-sourced so
    the stand-in and trained oracles cannot diverge."""
    return (
        f"round(list_sum(list_transform(generate_series(1, {_PQ_DSUB}), "
        f"i -> ({vec}[{cb}.sub * {_PQ_DSUB} + i] - {cb}.cvec[i]) "
        f"* ({vec}[{cb}.sub * {_PQ_DSUB} + i] - {cb}.cvec[i]))), 6)"
    )


_PQ_CB_SQL = f"""
e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), cb AS (
  SELECT s.sub, b.rk - 1 AS code,
         b.v[s.sub * {_PQ_DSUB} + 1 : s.sub * {_PQ_DSUB} + {_PQ_DSUB}] AS cvec
  FROM (
    SELECT v, row_number() OVER (ORDER BY vec_id) AS rk
    FROM e ORDER BY vec_id LIMIT {_PQ_K}
  ) b, (VALUES (0), (1), (2), (3)) s(sub)
), enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT e.vec_id, cb.sub, cb.code,
           row_number() OVER (
             PARTITION BY e.vec_id, cb.sub
             ORDER BY {_pq_sq_dist('e.v', 'cb')}, cb.code
           ) AS rn
    FROM e CROSS JOIN cb
  ) WHERE rn = 1
)"""


def _pq_books(spark: SparkSession, sf_dir: str):
    from exness_data_preprocess_spark.operators.similarity import pq_codebooks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb, pq_codebooks(emb, m=_PQ_M, k=_PQ_K)


def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.similarity import pq_encode

    emb, books = _pq_books(spark, sf_dir)
    return pq_encode(emb, books)


ORACLE_PQ_ENCODE = f"""
WITH {_PQ_CB_SQL}
SELECT vec_id, sub, code FROM enc
"""


def q_pq_ann_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.similarity import pq_adc_topk

    emb, books = _pq_books(spark, sf_dir)
    return pq_adc_topk(emb, emb.filter(F.col("vec_id") < 10), books, topk=5)


ORACLE_PQ_ADC = f"""
WITH {_PQ_CB_SQL}, lut AS (
  SELECT q.vec_id AS query_id, cb.sub, cb.code,
         CAST({_pq_sq_dist('q.v', 'cb')} AS DECIMAL(28,12)) AS pd
  FROM e q CROSS JOIN cb
  WHERE q.vec_id < 10
), cand AS (
  SELECT l.query_id, en.vec_id AS neighbor_id, sum(l.pd) AS adc
  FROM enc en JOIN lut l ON en.sub = l.sub AND en.code = l.code
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc::DOUBLE AS adc_dist, rank FROM (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (
           PARTITION BY query_id ORDER BY adc, neighbor_id
         ) AS rank
  FROM cand WHERE query_id != neighbor_id
) WHERE rank <= 5
"""


# -- Trained PQ: deterministic per-subspace Lloyd k-means codebooks -------
#: fixed iteration count / init seed of the trained-PQ entry — constants
#: so the NumPy trainer and the unrolled-CTE oracle run the identical
#: computation (the trained-IVF design, applied per subspace)
_PQ_TRAINED_ITERS, _PQ_TRAINED_SEED = 3, "pq-init-42"
_TRAINED_PQ_CACHE: dict[tuple, list[list[list[float]]]] = {}


def _trained_pq_books(
    spark: SparkSession, sf_dir: str
) -> list[list[list[float]]]:
    """Trained PQ codebooks, fit ONCE per fixture fingerprint and cached
    via ``registry_ml.fit_fingerprint_cached`` — codebooks are an index
    artifact that lives with the index, not a per-query cost; the fit
    lands in ``TRAINED_FIT_SECONDS`` so bench reports it as
    ``index_build_sec``, separately from the query timing."""
    from exness_data_preprocess_spark.operators.similarity import (
        train_pq_codebooks,
    )
    from exness_data_preprocess_spark.plans.registry_ml import (
        fit_fingerprint_cached,
    )

    return fit_fingerprint_cached(
        sf_dir,
        ("pq", _PQ_M, _PQ_K),
        _TRAINED_PQ_CACHE,
        lambda: train_pq_codebooks(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            m=_PQ_M,
            k=_PQ_K,
            iters=_PQ_TRAINED_ITERS,
            seed=_PQ_TRAINED_SEED,
        ),
    )


def q_pq_ann_adc_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k over TRAINED codebooks (judge r5 task 7) — the
    production PQ shape: per-subspace Lloyd k-means replaces the
    lowest-id stand-in, raising quantization fidelity (recall vs
    brute-force is measured in tests/test_dedup_similarity.py). The
    serving plan is IDENTICAL to ``pq_ann_adc`` — same fused
    encode+score corpus scan — only the codebook artifact changes."""
    from exness_data_preprocess_spark.operators.similarity import pq_adc_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_adc_topk(
        emb,
        emb.filter(F.col("vec_id") < 10),
        _trained_pq_books(spark, sf_dir),
        topk=5,
    )


def _trained_pq_oracle(
    iters: int = _PQ_TRAINED_ITERS, seed: str = _PQ_TRAINED_SEED
) -> str:
    """Full train+serve oracle for ``pq_ann_adc_trained``: the
    deterministic per-subspace Lloyd k-means (seeded-hash init shared
    across subspaces, ``iters`` unrolled assign/update CTE pairs,
    round-6 distances and means, ties to the lowest code, empty codes
    carried forward) followed by the encode + decimal-exact ADC top-k
    tail — inlined codebook literals cannot work because
    ``oracle_sql()`` is a static sf-independent string, so the training
    itself is part of the verified contract (the
    ``_spherical_ivf_oracle`` design). Association-order float
    differences (~1e-13) sit far below the 5e-7 rounding step."""
    subs_values = ", ".join(f"({s})" for s in range(_PQ_M))
    ctes = [
        f"""e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
), cb0 AS (
  SELECT s.sub, b.rk - 1 AS code,
         b.v[s.sub * {_PQ_DSUB} + 1 : s.sub * {_PQ_DSUB} + {_PQ_DSUB}] AS cvec
  FROM (
    SELECT v, row_number() OVER (ORDER BY h) AS rk
    FROM (SELECT md5('{seed}|' || CAST(vec_id AS VARCHAR)) AS h, v FROM e)
    ORDER BY h LIMIT {_PQ_K}
  ) b, (VALUES {subs_values}) s(sub)
)"""
    ]
    prev = "cb0"
    for t in range(1, iters + 1):
        ctes.append(
            f"""a{t} AS (
  SELECT vec_id, v, sub, code FROM (
    SELECT e.vec_id, e.v, c.sub, c.code,
           row_number() OVER (
             PARTITION BY e.vec_id, c.sub
             ORDER BY {_pq_sq_dist('e.v', 'c')}, c.code
           ) AS rn
    FROM e CROSS JOIN {prev} c
  ) WHERE rn = 1
), cb{t} AS (
  SELECT p.sub, p.code, coalesce(mm.cvec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT sub, code, list(c ORDER BY i) AS cvec FROM (
      SELECT a.sub, a.code, s.i,
             round(avg(a.v[a.sub * {_PQ_DSUB} + s.i]), 6) AS c
      FROM a{t} a CROSS JOIN generate_series(1, {_PQ_DSUB}) s(i)
      GROUP BY a.sub, a.code, s.i
    ) GROUP BY sub, code
  ) mm ON p.sub = mm.sub AND p.code = mm.code
)"""
        )
        prev = f"cb{t}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT e.vec_id, c.sub, c.code,
           row_number() OVER (
             PARTITION BY e.vec_id, c.sub
             ORDER BY {_pq_sq_dist('e.v', 'c')}, c.code
           ) AS rn
    FROM e CROSS JOIN {prev} c
  ) WHERE rn = 1
), lut AS (
  SELECT q.vec_id AS query_id, c.sub, c.code,
         CAST({_pq_sq_dist('q.v', 'c')} AS DECIMAL(28,12)) AS pd
  FROM e q CROSS JOIN {prev} c
  WHERE q.vec_id < 10
), cand AS (
  SELECT l.query_id, en.vec_id AS neighbor_id, sum(l.pd) AS adc
  FROM enc en JOIN lut l ON en.sub = l.sub AND en.code = l.code
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc::DOUBLE AS adc_dist, rank FROM (
  SELECT query_id, neighbor_id, adc,
         row_number() OVER (
           PARTITION BY query_id ORDER BY adc, neighbor_id
         ) AS rank
  FROM cand WHERE query_id != neighbor_id
) WHERE rank <= 5
"""
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus (production ingest shape)
# ---------------------------------------------------------------------------
_INC_SPLIT = 250  # docs below → "existing corpus", rest → incoming batch
_INC_PERM, _INC_BANDS, _INC_ROWS, _INC_T = 16, 4, 4, 0.8
_INC_CAP = 1000  # max_bucket_size — degenerate-band guard, modeled in SQL


def _inc_corpus_index(spark: SparkSession, sf_dir: str):
    """Materialized corpus dedup index for the registry's corpus half
    (doc_id < _INC_SPLIT) — built and catalog-written ONCE per sf_dir,
    read back on every later call THROUGH the production surface
    (ParquetCatalog.write/read_dedup_index — the same managed tables
    SparkDataProcessor.build_dedup_index maintains), so the bench
    exercises the supported steady-state API, not a private shortcut.

    At 100 TB the corpus signatures/digests/shingles are artifacts
    written when docs land; an incoming batch pays only its own minhash
    pass plus the banded join. The first invocation per process+sf
    builds the artifacts (the ingest cost, paid once); subsequent
    invocations are pure readers. Crash safety: the catalog writes the
    params sidecar LAST, so a half-written build reads as absent and is
    rebuilt rather than consumed.
    """
    import hashlib
    import os
    import tempfile

    from exness_data_preprocess_spark.operators.dedup import build_dedup_index
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread
    from exness_data_preprocess_spark.sources.catalog import ParquetCatalog

    # Cache key = source-file fingerprint (path + size + mtime) + the
    # signature params. A path-only key would serve a STALE index if the
    # fixture is regenerated in place between rounds — wrong dedup
    # decisions with no error (and oracle mismatches, since the oracle
    # always reads the live table). A params change likewise invalidates.
    st = os.stat(f"{sf_dir}/documents.parquet")
    fp = hashlib.md5(
        f"{sf_dir}|{st.st_size}|{st.st_mtime_ns}|{_INC_SPLIT}|{_INC_PERM}|"
        f"{_INC_BANDS}".encode()
    ).hexdigest()[:12]
    cat = ParquetCatalog(os.path.join(tempfile.gettempdir(), f"inc_dedup_index_{fp}"))
    if not cat.has_dedup_index():
        corpus = _docs_spread(spark, sf_dir).filter(F.col("doc_id") < _INC_SPLIT)
        idx = build_dedup_index(
            corpus, num_perm=_INC_PERM, bands=_INC_BANDS, shingle_n=1
        )
        cat.write_dedup_index(
            idx,
            {"num_perm": _INC_PERM, "bands": _INC_BANDS, "shingle_n": 1},
        )
    return cat.read_dedup_index(spark)


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.dedup import incremental_dedup
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    new = docs.filter(F.col("doc_id") >= _INC_SPLIT)
    return incremental_dedup(
        new,
        num_perm=_INC_PERM, bands=_INC_BANDS,
        jaccard_threshold=_INC_T,
        corpus_index=_inc_corpus_index(spark, sf_dir),
    )


def q_streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest gate over the documents 'landing dir', flagged
    against the SAME persisted corpus index the batch twin uses — drained
    with availableNow and hash-checked against the batch-equivalent SQL."""
    import os
    import tempfile

    from exness_data_preprocess_spark.plans.registry_ext import _sf_key
    from exness_data_preprocess_spark.streaming import (
        run_available_now_to_memory,
    )
    from exness_data_preprocess_spark.streaming.ingest_gate import (
        stream_incremental_dedup,
    )

    path = f"{sf_dir}/documents.parquet"
    stage = os.path.join(
        tempfile.gettempdir(), f"docs_stream_stage_{_sf_key(sf_dir)}"
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    # lexists, not exists: a dangling symlink (fixture moved/regenerated)
    # reports exists()=False but still blocks os.symlink
    if os.path.lexists(link):
        os.remove(link)
    os.symlink(path, link)
    schema = spark.read.parquet(path).schema
    docs = (
        spark.readStream.format("parquet").schema(schema).load(stage)
        .filter(F.col("doc_id") >= _INC_SPLIT)
    )
    gate = stream_incremental_dedup(
        docs,
        _inc_corpus_index(spark, sf_dir),
        num_perm=_INC_PERM,
        bands=_INC_BANDS,
        jaccard_threshold=_INC_T,
        corpus_bucket_cap=_INC_CAP,
    )
    return run_available_now_to_memory(
        gate, f"stream_inc_dedup_{_sf_key(sf_dir)}", "complete"
    )


def _streaming_incremental_oracle() -> str:
    """Batch-equivalent SQL for the streaming gate. Differs from the
    batch twin's oracle in one modeled detail: the degenerate-bucket cap
    counts the CORPUS side only (the stream cannot globally count its own
    buckets without a second streaming aggregation)."""
    from exness_data_preprocess_spark.functions.hashing import (
        MERSENNE_P,
        minhash_coeffs,
    )

    h32 = md5_h32_sql("s")
    perms = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MERSENNE_P}))"
        for a, b in minhash_coeffs(_INC_PERM)
    )
    bands_vals = ", ".join(f"({b})" for b in range(_INC_BANDS))
    return f"""
WITH d AS (
  SELECT doc_id, list_distinct({_TOKS}) AS sh FROM documents
), hashed AS (
  SELECT doc_id, sh, list_transform(sh, s -> {h32}) AS hs FROM d
), sigs AS (
  SELECT doc_id, [{perms}] AS sig FROM hashed
), banded AS (
  SELECT doc_id, b.band_idx,
         array_to_string(
           sig[b.band_idx * {_INC_ROWS} + 1 : b.band_idx * {_INC_ROWS} + {_INC_ROWS}],
           ',') AS band_key
  FROM sigs CROSS JOIN (VALUES {bands_vals}) AS b(band_idx)
), kept_corpus AS (
  -- corpus-side-only cap (streaming gate semantics)
  SELECT banded.* FROM banded
  JOIN (
    SELECT band_idx, band_key FROM banded
    WHERE doc_id < {_INC_SPLIT}
    GROUP BY 1, 2 HAVING count(*) <= {_INC_CAP}
  ) ok USING (band_idx, band_key)
  WHERE doc_id < {_INC_SPLIT}
), cand AS (
  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS cid
  FROM banded n JOIN kept_corpus c USING (band_idx, band_key)
  WHERE n.doc_id >= {_INC_SPLIT}
), ver AS (
  SELECT new_id, min(cid) AS near_id
  FROM cand
  JOIN d dn ON dn.doc_id = cand.new_id
  JOIN d dc ON dc.doc_id = cand.cid
  WHERE round(len(list_intersect(dn.sh, dc.sh))::DOUBLE
              / (len(dn.sh) + len(dc.sh) - len(list_intersect(dn.sh, dc.sh))),
              6) >= {_INC_T}
  GROUP BY 1
), ex AS (
  SELECT n.doc_id AS new_id, min(c.doc_id) AS exact_id
  FROM documents n JOIN documents c
    ON md5(trim(n.text)) = md5(trim(c.text))
   AND n.doc_id >= {_INC_SPLIT} AND c.doc_id < {_INC_SPLIT}
  GROUP BY 1
)
SELECT n.doc_id,
       (ex.exact_id IS NOT NULL)::INT AS exact_dup,
       (ver.near_id IS NOT NULL)::INT AS near_dup,
       least(ex.exact_id, ver.near_id) AS best_match_id,
       (ex.exact_id IS NULL AND ver.near_id IS NULL)::INT AS keep
FROM documents n
LEFT JOIN ex ON ex.new_id = n.doc_id
LEFT JOIN ver ON ver.new_id = n.doc_id
WHERE n.doc_id >= {_INC_SPLIT}
"""


def _incremental_oracle() -> str:
    from exness_data_preprocess_spark.functions.hashing import (
        MERSENNE_P,
        minhash_coeffs,
    )

    h32 = md5_h32_sql("s")
    perms = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MERSENNE_P}))"
        for a, b in minhash_coeffs(_INC_PERM)
    )
    bands_vals = ", ".join(f"({b})" for b in range(_INC_BANDS))
    return f"""
WITH d AS (
  SELECT doc_id, list_distinct({_TOKS}) AS sh FROM documents
), hashed AS (
  SELECT doc_id, sh, list_transform(sh, s -> {h32}) AS hs FROM d
), sigs AS (
  SELECT doc_id, [{perms}] AS sig FROM hashed
), banded AS (
  SELECT doc_id, b.band_idx,
         array_to_string(
           sig[b.band_idx * {_INC_ROWS} + 1 : b.band_idx * {_INC_ROWS} + {_INC_ROWS}],
           ',') AS band_key
  FROM sigs CROSS JOIN (VALUES {bands_vals}) AS b(band_idx)
), kept AS (
  -- degenerate-band cap over BOTH sides (corpus + new = all docs), the
  -- same max_bucket_size guard the Spark operator applies
  SELECT banded.* FROM banded
  JOIN (
    SELECT band_idx, band_key FROM banded
    GROUP BY 1, 2 HAVING count(*) <= {_INC_CAP}
  ) ok USING (band_idx, band_key)
), cand AS (
  SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS cid
  FROM kept n JOIN kept c USING (band_idx, band_key)
  WHERE n.doc_id >= {_INC_SPLIT} AND c.doc_id < {_INC_SPLIT}
), ver AS (
  SELECT new_id, min(cid) AS near_id
  FROM cand
  JOIN d dn ON dn.doc_id = cand.new_id
  JOIN d dc ON dc.doc_id = cand.cid
  WHERE round(len(list_intersect(dn.sh, dc.sh))::DOUBLE
              / (len(dn.sh) + len(dc.sh) - len(list_intersect(dn.sh, dc.sh))),
              6) >= {_INC_T}
  GROUP BY 1
), ex AS (
  SELECT n.doc_id AS new_id, min(c.doc_id) AS exact_id
  FROM documents n JOIN documents c
    ON md5(trim(n.text)) = md5(trim(c.text))
   AND n.doc_id >= {_INC_SPLIT} AND c.doc_id < {_INC_SPLIT}
  GROUP BY 1
)
SELECT n.doc_id,
       (ex.exact_id IS NOT NULL)::INT AS exact_dup,
       (ver.near_id IS NOT NULL)::INT AS near_dup,
       least(ex.exact_id, ver.near_id) AS best_match_id,
       (ex.exact_id IS NULL AND ver.near_id IS NULL)::INT AS keep
FROM documents n
LEFT JOIN ex ON ex.new_id = n.doc_id
LEFT JOIN ver ON ver.new_id = n.doc_id
WHERE n.doc_id >= {_INC_SPLIT}
"""


# ---------------------------------------------------------------------------
# Batch windowed event dedup (batch twin of streaming_dedup)
# ---------------------------------------------------------------------------
def q_events_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse repeats: keep an event only if the same (user, type) did
    not fire within the preceding 5 minutes — the batch rendering of the
    watermarked streaming dedup (keyed lag window, no global state)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id", "event_type").orderBy(us, "event_id")
    prev = F.lag(us).over(w)
    return (
        ev.withColumn("__keep", prev.isNull() | (us - prev > 300 * 1_000_000))
        .filter("__keep")
        .select("event_id", "user_id", "event_type", us.alias("ts_us"))
    )


ORACLE_EVENTS_WINDOW_DEDUP = """
WITH x AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) AS prev_us
  FROM events
)
SELECT event_id, user_id, event_type, ts_us
FROM x WHERE prev_us IS NULL OR ts_us - prev_us > 300000000
"""


# ---------------------------------------------------------------------------
# Curation funnel: quality → repetition → dedup → split, per language
# ---------------------------------------------------------------------------
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel composing four operators, reported as
    per-language survivor counts at each stage:

      n_docs → n_quality (quality gate) → n_clean (+ repetition gate)
      → n_unique (exact dedup within clean) → n_train (deterministic split)

    The counts are exact ints, so the whole composition is
    value-hash-checkable; each stage is the actual operator, not a
    re-implementation."""
    from pyspark.sql import Window

    from exness_data_preprocess_spark.operators.textstats import (
        deterministic_split,
        quality_features,
        repetition_features,
    )
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    scored = repetition_features(quality_features(docs))

    # Plan economy (r9, tightened in the r10 optimization round): the
    # original five per-stage groupBy branches each re-derived their
    # upstream (the quality+repetition scoring ran three times, the
    # docs scan five); r9 cut that to two derivations (pre/post
    # branches joined on lang). This rendering is ONE derivation: the
    # exact-dedup rank is a window over (is_clean, content_md5) — for
    # clean rows identical to exact_dedup's rank over the clean-only
    # frame (the extra partition column only separates the dirty
    # stratum, and md5 is a high-cardinality key, so no hot
    # partition) — and deterministic_split is map-only, so all five
    # funnel counts fall out of a single conditional aggregate. Same
    # exact ints (hash-checked at three SFs); the scoring pass, the
    # dedup shuffle, and the lang agg are each paid once, and the
    # pre/post join disappears (guide §2.4).
    is_clean = (F.col("quality_flag") == 1) & (
        F.col("repetition_flag") == 1
    )
    w = Window.partitionBy(
        is_clean, F.md5(F.trim(F.col("text")))
    ).orderBy("doc_id")
    staged = deterministic_split(
        scored.withColumn("_clean", is_clean).withColumn(
            "_rn", F.row_number().over(w)
        )
    )
    is_uniq = F.col("_clean") & (F.col("_rn") == 1)
    return staged.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.count_if(F.col("quality_flag") == 1).alias("n_quality"),
        F.count_if(F.col("_clean")).alias("n_clean"),
        F.count_if(is_uniq).alias("n_unique"),
        F.count_if(is_uniq & (F.col("split") == "train")).alias(
            "n_train"
        ),
    )


def _curation_oracle() -> str:
    from exness_data_preprocess_spark.operators.textstats import STOPWORDS

    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH d AS (
  SELECT doc_id, lang, text, {_TOKS} AS toks, length(text) AS n_chars
  FROM documents
), f AS (
  SELECT doc_id, lang, text, toks,
         len(toks) AS n,
         round(CASE WHEN len(toks) > 0
               THEN n_chars::DOUBLE / len(toks) END, 6) AS avg_len,
         round(CASE WHEN n_chars > 0
               THEN len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE
                    / n_chars END, 6) AS punct_ratio,
         round(CASE WHEN len(toks) > 0
               THEN len(list_distinct(toks))::DOUBLE / len(toks) END, 6)
           AS distinct_ratio,
         CASE WHEN len(toks) > 0 THEN round(
           1.0 - len(list_distinct(toks))::DOUBLE / len(toks), 6) END
           AS dup_tok,
         CASE WHEN len(toks) > 0 THEN round(
           list_max(list_transform(list_distinct(toks),
             t -> len(list_filter(toks, x -> x = t))))::DOUBLE / len(toks), 6) END
           AS top_tok,
         CASE WHEN len(toks) - 1 > 0 THEN round(
           1.0 - (CASE WHEN len(toks) >= 2 THEN len(list_distinct(list_transform(
             generate_series(1, len(toks) - 1),
             i -> array_to_string(toks[i:i+1], ' ')))) ELSE 0 END)::DOUBLE
           / (len(toks) - 1), 6) END AS dup2
  FROM d
), flags AS (
  SELECT doc_id, lang, text,
         (n >= 5 AND avg_len >= 2.0 AND avg_len <= 20.0
          AND coalesce(punct_ratio, 0.0) <= 0.2
          AND coalesce(distinct_ratio, 0.0) >= 0.3)::INT AS q_flag,
         (coalesce(dup_tok, 0.0) <= 0.8 AND coalesce(top_tok, 1.0) <= 0.3
          AND coalesce(dup2, 0.0) <= 0.9)::INT AS r_flag,
         -- stopword_ratio is computed but unused by the gate (parity with
         -- quality_features); keep the list literal referenced:
         len(list_filter(toks, t -> list_contains([{en}], t))) AS _sw
  FROM f
), staged AS (
  SELECT doc_id, lang,
         q_flag,
         (q_flag = 1 AND r_flag = 1)::INT AS is_clean,
         CASE WHEN q_flag = 1 AND r_flag = 1 THEN row_number() OVER (
           PARTITION BY (q_flag = 1 AND r_flag = 1), md5(trim(text))
           ORDER BY doc_id
         ) END AS rn
  FROM flags
), final AS (
  SELECT doc_id, lang, q_flag, is_clean,
         (rn = 1)::INT AS is_unique,
         (rn = 1 AND (('0x' || substr(md5('split-v1' || doc_id::VARCHAR), 1, 8))
            ::BIGINT) % 100 < 80)::INT AS is_train
  FROM staged
)
SELECT lang,
       count(*) AS n_docs,
       sum(q_flag)::BIGINT AS n_quality,
       sum(is_clean)::BIGINT AS n_clean,
       coalesce(sum(is_unique), 0)::BIGINT AS n_unique,
       coalesce(sum(is_train), 0)::BIGINT AS n_train
FROM final GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Edit-distance near-dup pairs (character-level complement of Jaccard)
# ---------------------------------------------------------------------------
def q_dedup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.operators.dedup import levenshtein_pairs
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return levenshtein_pairs(docs, length_bucket=10, max_distance=10)


ORACLE_LEVENSHTEIN = """
WITH d AS (
  SELECT doc_id, lang, text, len(text) AS ln, (len(text) // 10) AS bkt
  FROM documents
), p AS (
  SELECT doc_id, lang, text, ln, u.b AS bkt
  FROM d, unnest([bkt, bkt + 1]) AS u(b)
)
SELECT DISTINCT a.lang, a.doc_id AS id_a, b.doc_id AS id_b,
       levenshtein(a.text, b.text) AS edit_distance
FROM p a JOIN p b ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id < b.doc_id
WHERE abs(a.ln - b.ln) <= 10 AND levenshtein(a.text, b.text) <= 10
"""


# ---------------------------------------------------------------------------
# Percentile-threshold quality curation (top-N% per language)
# ---------------------------------------------------------------------------
def q_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top 60% of docs per language by distinct-token count —
    percent_rank over a keyed window (adapts to each language's
    distribution; ties broken by doc_id)."""
    from exness_data_preprocess_spark.operators.textstats import (
        quality_percentile_filter,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select(
        "doc_id",
        "lang",
        F.size(F.array_distinct(F.split(F.lower(F.trim("text")), r"\s+"))).alias(
            "score"
        ),
    )
    return quality_percentile_filter(scored, "score", keep_fraction=0.6)


ORACLE_QUALITY_PCT = """
WITH s AS (
  SELECT doc_id, lang,
         len(list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')))
           AS score
  FROM documents
), r AS (
  SELECT doc_id, lang, score,
         percent_rank() OVER (
           PARTITION BY lang ORDER BY score DESC, doc_id ASC
         ) AS pr
  FROM s
)
SELECT doc_id, lang, score FROM r WHERE pr <= 0.6
"""


# ---------------------------------------------------------------------------
# ROLLUP reporting: per-(lang, source) + per-lang subtotals + grand total
# ---------------------------------------------------------------------------
def q_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets aggregation via ``DataFrame.rollup`` — subtotals and
    the grand total in one pass (Catalyst expands to a single Expand +
    aggregate; one shuffle for all three grouping levels, not three
    jobs). NULL group keys are rendered as sentinels so the differential
    can hash them (Spark and SQL agree on ROLLUP null semantics)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = (
        docs.rollup("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )
    return r.select(
        F.coalesce("lang", F.lit("<all>")).alias("lang"),
        F.coalesce("source", F.lit("<all>")).alias("source"),
        "n_docs",
        "total_chars",
    )


ORACLE_CORPUS_ROLLUP = """
SELECT coalesce(lang, '<all>') AS lang,
       coalesce(source, '<all>') AS source,
       count(*) AS n_docs,
       sum(len(text))::BIGINT AS total_chars
FROM documents
GROUP BY ROLLUP (lang, source)
"""


# ---------------------------------------------------------------------------
# Semi-structured extraction: JSON props → typed columns → rollup
# ---------------------------------------------------------------------------
def q_json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the JSON ``props`` column with a typed ``from_json`` schema
    (JVM-side Jackson parse under codegen — the Spark way to lift
    semi-structured payloads into columns; no regex, no Python), then a
    standard rollup. At 100 TB the parse is scan-fused; only the
    (event_type)-keyed aggregate shuffles."""
    ev = _events(spark, sf_dir)
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(F.col("k") > 50, 1).otherwise(0)).alias("n_k_gt_50"),
        )
    )


ORACLE_JSON_EXTRACT = """
WITH p AS (
  SELECT event_type, json_extract_string(props, '$.k')::INT AS k FROM events
)
SELECT event_type,
       count(*) AS n_events,
       sum(k)::BIGINT AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k,
       sum(CASE WHEN k > 50 THEN 1 ELSE 0 END)::BIGINT AS n_k_gt_50
FROM p GROUP BY 1
"""


# ---------------------------------------------------------------------------
# PII detection / redaction (privacy-scrub stage of a curation pipeline)
# ---------------------------------------------------------------------------
# The synthetic documents fixture contains no organic PII (its texts are
# Zipf words), so both PII entries run over a deterministically AUGMENTED
# corpus: docs with doc_id % 5 in {0,1,2,3} get one appended contact
# line (email / phone / IPv4 / SSN-shaped id) derived arithmetically
# from doc_id. The CASE below is rendered for both engines from one
# template (only `div` vs `//` and string-cast spelling differ), so the
# operator's regex machinery is exercised on real matches while the
# oracle reproduces every augmented byte. The operators themselves
# (operators/pii.py) take any text column — augmentation is fixture
# adaptation, not operator semantics.
_PII_AUG_CASE = (
    "CASE CAST(doc_id % 5 AS INT) "
    "WHEN 0 THEN concat(text, ' contact user', cast(doc_id as {st}), "
    "'@example.com') "
    "WHEN 1 THEN concat(text, ' call 555-', "
    "lpad(cast(doc_id % 1000 as {st}), 3, '0'), '-', "
    "lpad(cast(doc_id % 10000 as {st}), 4, '0')) "
    "WHEN 2 THEN concat(text, ' host 10.', cast(doc_id % 256 as {st}), "
    "'.', cast((doc_id {div} 7) % 256 as {st}), '.1') "
    "WHEN 3 THEN concat(text, ' id ', "
    "lpad(cast(doc_id % 1000 as {st}), 3, '0'), '-', "
    "lpad(cast(doc_id % 100 as {st}), 2, '0'), '-', "
    "lpad(cast(doc_id % 10000 as {st}), 4, '0')) "
    "ELSE text END"
)
_PII_AUG_SPARK = _PII_AUG_CASE.format(st="string", div="div")
_PII_AUG_DUCK = _PII_AUG_CASE.format(st="varchar", div="//")


def _pii_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return docs.select(
        "doc_id", "source", F.expr(_PII_AUG_SPARK).alias("text")
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-token PII redaction over the augmented corpus. Map-only
    chained ``regexp_replace`` (JVM regex under codegen, no shuffle);
    ``n_pii_redacted`` counts the tokens inserted."""
    from exness_data_preprocess_spark.operators.pii import redact_pii

    return redact_pii(_pii_augmented(spark, sf_dir)).select(
        "doc_id", "text_redacted", "n_pii_redacted"
    )


def q_pii_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII audit rollup (the privacy-review report): doc
    counts, docs with any PII, per-kind totals. One partial-aggregated
    shuffle on the low-cardinality source key."""
    from exness_data_preprocess_spark.operators.pii import pii_report

    r = pii_report(_pii_augmented(spark, sf_dir))
    return r.select(
        "source", "n_docs", "docs_with_pii", "total_pii",
        "total_email", "total_ipv4", "total_ssn", "total_phone",
    )


# Disjoint-count CTE chain mirroring operators/pii.py: each kind counted
# on text with all PRIOR kinds' matches space-masked, redaction applied
# in the same order with typed tokens. Patterns are byte-identical to
# PII_PATTERNS (Java-regex ∩ RE2 subset).
_PII_ORACLE_BASE = r"""
WITH aug AS (
  SELECT doc_id, source, {aug} AS text FROM documents
), m AS (
  SELECT doc_id, source, text,
    len(regexp_extract_all(text, '{em}')) AS n_email,
    regexp_replace(text, '{em}', ' ', 'g') AS t1
  FROM aug
), m2 AS (
  SELECT *, len(regexp_extract_all(t1, '{ip}')) AS n_ipv4,
    regexp_replace(t1, '{ip}', ' ', 'g') AS t2
  FROM m
), m3 AS (
  SELECT *, len(regexp_extract_all(t2, '{ssn}')) AS n_ssn,
    regexp_replace(t2, '{ssn}', ' ', 'g') AS t3
  FROM m2
), feats AS (
  SELECT *, len(regexp_extract_all(t3, '{ph}')) AS n_phone
  FROM m3
)
"""


def _pii_oracle_base() -> str:
    from exness_data_preprocess_spark.operators.pii import PII_PATTERNS

    pats = {kind: pat for kind, pat, _tok in PII_PATTERNS}
    return _PII_ORACLE_BASE.format(
        aug=_PII_AUG_DUCK,
        em=pats["email"],
        ip=pats["ipv4"],
        ssn=pats["ssn"],
        ph=pats["phone"],
    )


def _pii_redaction_oracle() -> str:
    from exness_data_preprocess_spark.operators.pii import PII_PATTERNS

    red = "text"
    for _kind, pat, tok in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{tok}', 'g')"
    return _pii_oracle_base() + f"""
SELECT doc_id, {red} AS text_redacted,
       (n_email + n_ipv4 + n_ssn + n_phone)::INT AS n_pii_redacted
FROM feats
"""


def _pii_stats_oracle() -> str:
    return _pii_oracle_base() + """
SELECT source, count(*) AS n_docs,
       sum(CASE WHEN n_email + n_ipv4 + n_ssn + n_phone > 0
           THEN 1 ELSE 0 END)::BIGINT AS docs_with_pii,
       sum(n_email + n_ipv4 + n_ssn + n_phone)::BIGINT AS total_pii,
       sum(n_email)::BIGINT AS total_email,
       sum(n_ipv4)::BIGINT AS total_ipv4,
       sum(n_ssn)::BIGINT AS total_ssn,
       sum(n_phone)::BIGINT AS total_phone
FROM feats GROUP BY source
"""


# ---------------------------------------------------------------------------
# Line-level dedup / boilerplate removal (operators/lines.py). The
# synthetic fixture is single-line, so the entries run over a
# deterministically line-shaped corpus: the token stream regrouped into
# 6-token lines, plus boilerplate header/footer lines at fixed doc_id
# residues (CCNet dedups paragraphs corpus-wide; C4 strips lines that
# repeat across many pages). Both engines render the same shaping.
# ---------------------------------------------------------------------------
_LINES_GROUP = 6
_BOILER_MIN_DOCS = 25

_LINES_HDR = "subscribe to our newsletter today"
_LINES_FTR0 = "all rights reserved example news network"
_LINES_FTR1 = "follow us for more updates"


def _lines_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    g = F.lit(_LINES_GROUP)
    n_groups = F.ceil(F.size(toks) / g.cast("double")).cast("int")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_groups - F.lit(1)),
            lambda i: F.array_join(F.slice(toks, i * g + 1, g), " "),
        ),
        "\n",
    )
    hdr = F.when(
        F.col("doc_id") % 3 == 0, F.lit(_LINES_HDR + "\n")
    ).otherwise(F.lit(""))
    ftr = (
        F.when(F.col("doc_id") % 2 == 0, F.lit("\n" + _LINES_FTR0))
        .when(F.col("doc_id") % 5 == 1, F.lit("\n" + _LINES_FTR1))
        .otherwise(F.lit(""))
    )
    return docs.select(
        "doc_id", F.concat(hdr, body, ftr).alias("text")
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-line removal, keep-first (CCNet §4.1):
    partial-aggregated min-(doc,pos) per normalized-line key + equi-join
    back — the skew-safe shape for boilerplate-hot keys."""
    from exness_data_preprocess_spark.operators.lines import line_dedup

    return line_dedup(_lines_augmented(spark, sf_dir)).select(
        "doc_id", "text_kept", "n_lines", "n_lines_kept"
    )


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate removal: every occurrence of a line present
    in ≥ 25 distinct docs is dropped (nav menus, footers)."""
    from exness_data_preprocess_spark.operators.lines import (
        strip_boilerplate,
    )

    return strip_boilerplate(
        _lines_augmented(spark, sf_dir), _BOILER_MIN_DOCS
    ).select("doc_id", "text_kept", "n_lines", "n_lines_kept")


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate audit: normalized lines by document frequency, the
    report a curator reads before picking the strip threshold."""
    from exness_data_preprocess_spark.operators.lines import (
        line_doc_frequency,
    )

    return line_doc_frequency(_lines_augmented(spark, sf_dir)).where(
        F.col("n_docs") >= _BOILER_MIN_DOCS
    ).select("line_norm", "n_docs", "n_occurrences")


# Shared oracle CTE chain: line-shaped corpus → positional line explode
# → CCNet normalization. list_slice is 1-based inclusive-end (== Spark
# slice(start, length) for length 6); range(0, n) is end-exclusive
# (== Spark sequence(0, n-1)).
_LINES_ORACLE_BASE = f"""
WITH aug AS (
  SELECT doc_id,
    concat(
      CASE WHEN doc_id % 3 = 0
           THEN '{_LINES_HDR}' || chr(10) ELSE '' END,
      array_to_string(
        list_transform(
          range(0, cast(ceil(len(string_split(text, ' ')) / {_LINES_GROUP}.0)
                        AS int)),
          i -> array_to_string(
                 list_slice(string_split(text, ' '),
                            i * {_LINES_GROUP} + 1,
                            i * {_LINES_GROUP} + {_LINES_GROUP}), ' ')),
        chr(10)),
      CASE WHEN doc_id % 2 = 0 THEN chr(10) || '{_LINES_FTR0}'
           WHEN doc_id % 5 = 1 THEN chr(10) || '{_LINES_FTR1}'
           ELSE '' END) AS text
  FROM documents
), lines AS (
  SELECT doc_id, i AS line_no, ls[i + 1] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM aug),
       unnest(range(0, len(ls))) AS u(i)
), keyed AS (
  SELECT doc_id, line_no, line,
         trim(regexp_replace(lower(line), '[^a-z]+', ' ', 'g')) AS nrm
  FROM lines
)"""

_LINES_ORACLE_TAIL = """
, docs_out AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text_kept,
         count(*) AS n_lines_kept
  FROM kept GROUP BY doc_id
)
SELECT a.doc_id, coalesce(d.text_kept, '') AS text_kept,
       len(string_split(a.text, chr(10)))::INT AS n_lines,
       coalesce(d.n_lines_kept, 0)::INT AS n_lines_kept
FROM aug a LEFT JOIN docs_out d USING (doc_id)
"""

ORACLE_LINE_DEDUP = _LINES_ORACLE_BASE + """
, kept AS (
  SELECT doc_id, line_no, line FROM (
    SELECT doc_id, line_no, line, nrm,
           row_number() OVER (PARTITION BY nrm
                              ORDER BY doc_id, line_no) AS rn
    FROM keyed WHERE nrm <> ''
  ) WHERE rn = 1
  UNION ALL
  SELECT doc_id, line_no, line FROM keyed WHERE nrm = ''
)""" + _LINES_ORACLE_TAIL

ORACLE_BOILERPLATE_STRIP = _LINES_ORACLE_BASE + f"""
, hot AS (
  SELECT nrm FROM keyed WHERE nrm <> ''
  GROUP BY nrm HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
), kept AS (
  SELECT doc_id, line_no, line FROM keyed
  WHERE nrm = '' OR nrm NOT IN (SELECT nrm FROM hot)
)""" + _LINES_ORACLE_TAIL

def q_incremental_line_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ingest-shaped line dedup: the batch (doc_id % 10 == 0) loses
    every line already present in the corpus (the rest), then
    keep-first within the batch. Corpus side reduces to its distinct
    key set — one partial-agg shuffle, no corpus self-join."""
    from exness_data_preprocess_spark.operators.lines import (
        incremental_line_dedup,
    )

    aug = _lines_augmented(spark, sf_dir)
    batch = aug.where(F.col("doc_id") % 10 == 0)
    corpus = aug.where(F.col("doc_id") % 10 != 0)
    return incremental_line_dedup(batch, corpus).select(
        "doc_id", "text_kept", "n_lines", "n_lines_kept"
    )


ORACLE_INCREMENTAL_LINE_DEDUP = _LINES_ORACLE_BASE + """
, corpus_keys AS (
  SELECT DISTINCT nrm FROM keyed WHERE doc_id % 10 <> 0 AND nrm <> ''
), kept AS (
  SELECT doc_id, line_no, line FROM (
    SELECT doc_id, line_no, line,
           row_number() OVER (PARTITION BY nrm
                              ORDER BY doc_id, line_no) AS rn
    FROM keyed
    WHERE doc_id % 10 = 0 AND nrm <> ''
      AND nrm NOT IN (SELECT nrm FROM corpus_keys)
  ) WHERE rn = 1
  UNION ALL
  SELECT doc_id, line_no, line FROM keyed
  WHERE doc_id % 10 = 0 AND nrm = ''
), docs_out AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text_kept,
         count(*) AS n_lines_kept
  FROM kept GROUP BY doc_id
)
SELECT a.doc_id, coalesce(d.text_kept, '') AS text_kept,
       len(string_split(a.text, chr(10)))::INT AS n_lines,
       coalesce(d.n_lines_kept, 0)::INT AS n_lines_kept
FROM aug a LEFT JOIN docs_out d USING (doc_id)
WHERE a.doc_id % 10 = 0
"""


ORACLE_BOILERPLATE_LINES = _LINES_ORACLE_BASE + f"""
SELECT nrm AS line_norm, count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occurrences
FROM keyed WHERE nrm <> ''
GROUP BY nrm HAVING count(DISTINCT doc_id) >= {_BOILER_MIN_DOCS}
"""


# ---------------------------------------------------------------------------
# URL/domain analytics (operators/urls.py) + weighted sampling
# (textstats.weighted_sample). The fixture has no URLs, so the domain
# entries run over a deterministically URL-augmented corpus rendered
# from one CASE template for both engines (the PII-entry pattern).
# ---------------------------------------------------------------------------
_URL_AUG_CASE = (
    "CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN concat(text, ' see https://news-', "
    "cast(doc_id % 7 as {st}), '.example.com/a/', cast(doc_id as {st})) "
    "WHEN 1 THEN concat(text, ' via http://blog.example.org/p/', "
    "cast(doc_id as {st}), ' and https://ads.tracker.example/x') "
    "WHEN 2 THEN concat(text, ' ref https://Cdn.Assets.example.net/i.png') "
    "ELSE text END"
)
_URL_AUG_SPARK = _URL_AUG_CASE.format(st="string")
_URL_AUG_DUCK = _URL_AUG_CASE.format(st="varchar")
_URL_BLOCKLIST = ["tracker.example", "blog.example.org"]

# oracle regex interpolated from the operator's pattern so the two can
# never drift (r10: pattern gained a userinfo skip + underscore hosts)
from exness_data_preprocess_spark.operators.urls import (  # noqa: E402
    URL_PATTERN as _URL_PATTERN_SQL,
)
_WSAMPLE_K = 100


def _url_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return docs.select("doc_id", F.expr(_URL_AUG_SPARK).alias("text"))


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain provenance audit: one codegen'd regexp extract, one
    partial-aggregated shuffle on the (Zipfian) domain key."""
    from exness_data_preprocess_spark.operators.urls import domain_stats

    return domain_stats(_url_augmented(spark, sf_dir))


def q_url_blocklist_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb URL-filter stage, audit variant: per-doc blocked
    flag from a literal suffix-matching predicate — map-only, no join,
    no shuffle (subdomains of blocked domains count as blocked)."""
    from exness_data_preprocess_spark.operators.urls import (
        domain_blocklist_filter,
    )

    return domain_blocklist_filter(
        _url_augmented(spark, sf_dir), _URL_BLOCKLIST, keep_flagged=True
    ).select("doc_id", "blocked_domain")


# URL-keyed dedup fixture: six variants per doc keyed off doc_id so every
# normalization rule is exercised WITH real duplicate groups — cases 0/1/2
# normalize to the same canonical URL (case+punct, www+trailing-slash,
# tracking-only query), cases 3/4 to another (param sort + fragment vs
# tracking-param strip), case 5 has no URL (keyless pass-through).
_URLD_AUG_CASE = (
    "CASE CAST(doc_id % 6 AS INT) "
    "WHEN 0 THEN concat(text, ' read https://Example.com/item/', "
    "cast(doc_id % 20 as {st}), '.') "
    "WHEN 1 THEN concat(text, ' read https://www.example.com/item/', "
    "cast(doc_id % 20 as {st}), '/') "
    "WHEN 2 THEN concat(text, ' read https://example.com/item/', "
    "cast(doc_id % 20 as {st}), '?utm_source=feed&utm_medium=rss') "
    "WHEN 3 THEN concat(text, ' read https://example.com/item/', "
    "cast(doc_id % 20 as {st}), '?b=2&a=1#frag') "
    "WHEN 4 THEN concat(text, ' read https://example.com/item/', "
    "cast(doc_id % 20 as {st}), '?a=1&b=2&utm_campaign=x') "
    "ELSE text END"
)
_URLD_AUG_SPARK = _URLD_AUG_CASE.format(st="string")
_URLD_AUG_DUCK = _URLD_AUG_CASE.format(st="varchar")


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed keep-first dedup (the Common-Crawl front door): one
    map-only extract+normalize pass, one partial-aggregable shuffle on
    the canonical-URL key — the exact-dedup shape, no window/join."""
    from exness_data_preprocess_spark.operators.urls import url_dedup
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return url_dedup(
        docs.select("doc_id", F.expr(_URLD_AUG_SPARK).alias("text"))
    )


def _url_norm_ctes(sfx: str, src: str) -> str:
    """CTE chain ``u{sfx} → u1{sfx} → np{sfx}`` rendering the operator's
    URL normalization over ``src(doc_id, text)`` — ONE rendering shared
    by the url_dedup and incremental_url_dedup oracles (no drift)."""
    from exness_data_preprocess_spark.operators.urls import (
        FULL_URL_PATTERN,
        TRACKING_PARAM_PATTERN,
    )

    full = FULL_URL_PATTERN.replace("'", "''")
    return f"""u{sfx} AS (
  SELECT doc_id, regexp_extract(text, '{full}', 0) AS u0 FROM {src}
), u1{sfx} AS (
  SELECT doc_id, regexp_replace(u0, '[).,;:!]+$', '') AS uu FROM u{sfx}
  WHERE u0 <> ''
), np{sfx} AS (
  -- outer regexp_replace: the second trailing-punct strip on the
  -- canonical form (idempotence — mirrors normalize_url)
  SELECT doc_id,
         regexp_replace(
           regexp_replace(lower(regexp_extract(
               regexp_replace(uu, '[?#].*', ''),
               '^(?i)https?://[^/]*', 0)), '://www\\.', '://')
           || regexp_replace(regexp_extract(
               regexp_replace(uu, '[?#].*', ''),
               '^(?i)https?://[^/]*(.*)', 1), '/+$', '')
           || CASE WHEN qs = '' THEN '' ELSE '?' || qs END,
           '[).,;:!]+$', '') AS url_norm
  FROM (
    SELECT doc_id, uu,
           -- DuckDB: array_to_string of an EMPTY list is NULL (Spark's
           -- array_join is '') — coalesce restores the Spark semantics
           coalesce(array_to_string(list_sort(list_filter(
             string_split(regexp_extract(uu, '\\?([^#]*)', 1), '&'),
             p -> p <> '' AND NOT regexp_matches(
               p, '{TRACKING_PARAM_PATTERN}'))), '&'), '') AS qs
    FROM u1{sfx}
  )
)"""


def _url_dedup_oracle() -> str:
    return f"""
WITH aug AS (
  SELECT doc_id, {_URLD_AUG_DUCK} AS text FROM documents
), {_url_norm_ctes("", "aug")}
SELECT min(doc_id) AS doc_id, url_norm, count(*) AS n_url_dupes
FROM np GROUP BY url_norm
UNION ALL
SELECT doc_id, NULL AS url_norm, 1 AS n_url_dupes
FROM u WHERE u0 = ''
"""


def q_incremental_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest URL gate: batch (doc_id%10 ≥ 7) admitted against the
    corpus (doc_id%10 < 7) by canonical URL. The corpus reduces to its
    DISTINCT key set before any join — never a corpus self-join."""
    from exness_data_preprocess_spark.operators.urls import (
        incremental_url_dedup,
    )
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir).select(
        "doc_id", F.expr(_URLD_AUG_SPARK).alias("text")
    )
    corpus = docs.where(F.col("doc_id") % 10 < 7)
    batch = docs.where(F.col("doc_id") % 10 >= 7)
    return incremental_url_dedup(batch, corpus)


def _incremental_url_oracle() -> str:
    return f"""
WITH aug AS (
  SELECT doc_id, {_URLD_AUG_DUCK} AS text FROM documents
), corpus AS (
  SELECT * FROM aug WHERE doc_id % 10 < 7
), batch AS (
  SELECT * FROM aug WHERE doc_id % 10 >= 7
), {_url_norm_ctes("c", "corpus")}, {_url_norm_ctes("b", "batch")},
ck AS (
  SELECT DISTINCT url_norm FROM npc
), fi AS (
  SELECT url_norm, min(doc_id) AS first_id FROM npb GROUP BY 1
)
SELECT u.doc_id, npb.url_norm,
       CASE WHEN npb.url_norm IS NULL THEN 'kept'
            WHEN ck.url_norm IS NOT NULL THEN 'corpus_dup'
            WHEN u.doc_id = fi.first_id THEN 'kept'
            ELSE 'batch_dup' END AS status
FROM ub u
LEFT JOIN npb ON u.doc_id = npb.doc_id
LEFT JOIN ck ON npb.url_norm = ck.url_norm
LEFT JOIN fi ON npb.url_norm = fi.url_norm
"""


# Gopher-rule fixture: five variants keyed off doc_id so every rule fires
# in both directions — 0: stopword-enriched prose (passes or fails only on
# word count), 1: pure bullet list, 2: ellipsis-terminated lines, 3:
# symbol-heavy header prefix, 4: unmodified (usually fails the stopword
# rule — the synthetic vocabulary carries only 'the').
_GOPHER_AUG_CASE = (
    "CASE CAST(doc_id % 5 AS INT) "
    "WHEN 0 THEN concat(text, ' and so the story of it goes with that') "
    "WHEN 1 THEN concat('- alpha beta gamma', chr(10), "
    "'- delta epsilon zeta', chr(10), '- eta theta iota', chr(10), "
    "'- kappa lambda mu') "
    "WHEN 2 THEN concat('the results kept improving...', chr(10), "
    "'we shall see more of that soon...', chr(10), 'to be continued...') "
    "WHEN 3 THEN concat('# # heading # of # the # hash # marks # and # "
    "with # that # be # to # ', text) "
    "ELSE text END"
)


def q_gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-set document gates (Rae et al. 2021 table A1):
    map-only higher-order array expressions under codegen — a 100 TB
    corpus gate at scan speed, no shuffle, no UDF."""
    from exness_data_preprocess_spark.operators.textstats import (
        gopher_quality_flags,
    )
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir)
    return gopher_quality_flags(
        docs.select("doc_id", F.expr(_GOPHER_AUG_CASE).alias("text"))
    )


def _gopher_oracle() -> str:
    from exness_data_preprocess_spark.operators.textstats import (
        GOPHER_STOPWORDS,
    )

    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
WITH aug AS (
  SELECT doc_id, {_GOPHER_AUG_CASE} AS text FROM documents
), t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     t -> t <> '') AS tk,
         list_filter(string_split(text, chr(10)),
                     l -> trim(l) <> '') AS ln
  FROM aug
), m AS (
  SELECT doc_id,
         CAST(len(tk) AS INT) AS n_words,
         CASE WHEN len(tk) > 0 THEN
           list_sum(list_transform(tk, t -> len(t)))::DOUBLE / len(tk)
         END AS mean_word_len,
         CASE WHEN len(tk) > 0 THEN
           len(regexp_extract_all(text, '#|\\.\\.\\.|…'))::DOUBLE / len(tk)
         END AS symbol_ratio,
         CASE WHEN len(ln) > 0 THEN
           len(list_filter(ln,
               l -> regexp_matches(l, '^\\s*[-*•]')))::DOUBLE / len(ln)
         ELSE 0.0 END AS bullet_frac,
         CASE WHEN len(ln) > 0 THEN
           len(list_filter(ln,
               l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))::DOUBLE / len(ln)
         ELSE 0.0 END AS ellipsis_frac,
         CASE WHEN len(tk) > 0 THEN
           len(list_filter(tk, t -> regexp_matches(t, '[a-z]')))::DOUBLE
             / len(tk)
         END AS alpha_frac,
         CAST(len(list_filter([{stop_list}],
                              s -> list_contains(tk, s))) AS INT)
           AS n_stopwords
  FROM t
)
SELECT doc_id, n_words,
       round(mean_word_len, 6) AS mean_word_len,
       round(symbol_ratio, 6) AS symbol_ratio,
       round(bullet_frac, 6) AS bullet_frac,
       round(ellipsis_frac, 6) AS ellipsis_frac,
       round(alpha_frac, 6) AS alpha_frac,
       n_stopwords,
       CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END
         AS flag_word_count,
       CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
            THEN 1 ELSE 0 END AS flag_mean_word_len,
       CASE WHEN symbol_ratio < 0.1 THEN 1 ELSE 0 END AS flag_symbol_ratio,
       CASE WHEN bullet_frac < 0.9 THEN 1 ELSE 0 END AS flag_bullet,
       CASE WHEN ellipsis_frac < 0.3 THEN 1 ELSE 0 END AS flag_ellipsis,
       CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS flag_alpha,
       CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END AS flag_stopword,
       (CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END)
       * (CASE WHEN mean_word_len >= 3.0 AND mean_word_len <= 10.0
               THEN 1 ELSE 0 END)
       * (CASE WHEN symbol_ratio < 0.1 THEN 1 ELSE 0 END)
       * (CASE WHEN bullet_frac < 0.9 THEN 1 ELSE 0 END)
       * (CASE WHEN ellipsis_frac < 0.3 THEN 1 ELSE 0 END)
       * (CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END)
       * (CASE WHEN n_stopwords >= 2 THEN 1 ELSE 0 END) AS gopher_pass
FROM m
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k weighted sample without replacement (Efraimidis-Spirakis
    A-ES keys on a seeded-hash uniform); TakeOrderedAndProject top-k —
    per-partition bounded heaps, no global sort."""
    from exness_data_preprocess_spark.operators.textstats import (
        weighted_sample,
    )
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    docs = _docs_spread(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return weighted_sample(docs, _WSAMPLE_K, "n_chars")


_URL_ORACLE_BASE = f"""
WITH aug AS (
  SELECT doc_id, {_URL_AUG_DUCK} AS text FROM documents
)"""

ORACLE_DOMAIN_STATS = _URL_ORACLE_BASE + f"""
, ex AS (
  SELECT doc_id,
         lower(unnest(regexp_extract_all(
           text, '{_URL_PATTERN_SQL}', 1))) AS domain
  FROM aug
)
SELECT domain, count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_urls
FROM ex GROUP BY domain
"""

_URL_BLOCKED_PRED = " OR ".join(
    f"d = '{b}' OR d LIKE '%.{b}'" for b in sorted(_URL_BLOCKLIST)
)

ORACLE_URL_BLOCKLIST_AUDIT = _URL_ORACLE_BASE + f"""
SELECT doc_id,
       CASE WHEN len(list_filter(
              list_transform(regexp_extract_all(
                text, '{_URL_PATTERN_SQL}', 1), x -> lower(x)),
              d -> {_URL_BLOCKED_PRED})) > 0
            THEN 1 ELSE 0 END AS blocked_domain
FROM aug
"""

# A-ES key: ln(u)/w with u = (md5_h60(seed||id)+1)/(2^60+1); ORDER BY
# key DESC, id — byte-identical key derivation in both engines.
ORACLE_WEIGHTED_SAMPLE = f"""
WITH w AS (
  SELECT doc_id, lang, n_chars,
         ln((('0x' || substr(md5('wsample-v1' ||
               CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)::DOUBLE
            / {float(2**60 + 1)!r}) / n_chars::DOUBLE AS wkey
  FROM documents
  WHERE n_chars IS NOT NULL AND NOT isnan(n_chars::DOUBLE)
    AND n_chars > 0
)
SELECT doc_id, lang, n_chars FROM w
ORDER BY wkey DESC, doc_id LIMIT {_WSAMPLE_K}
"""


def build_pipeline_queries() -> dict:
    """name → (spark_fn, oracle_sql, description, bench).

    ``dup_connected_components`` is correctness-only (bench=False), the
    same exemption as the streaming drains: an iterative algorithm's
    wall-clock at sf0.1 is rounds × Spark's fixed per-job floor — it
    measures scheduling overhead, not plan quality. The per-round plan
    shape is guarded in tests/test_pipeline_ops.py instead.
    """
    return {
        "dup_connected_components": (
            q_dup_connected_components, ORACLE_DUP_CC,
            "near-dup pairs → clusters (min-label CC, recursive-CTE oracle)",
            False, SKIP_ITERATIVE),
        "dedup_keep_best": (
            q_dedup_keep_best, ORACLE_DEDUP_KEEP_BEST,
            "cluster resolution: keep-best doc per near-dup family",
            False, SKIP_ITERATIVE),
        "blocklist_filter": (
            q_blocklist_filter, ORACLE_BLOCKLIST,
            "C4-style blocklist screening: drop / redact decisions",
            True),
        "training_shards": (
            q_training_shards, ORACLE_TRAINING_SHARDS,
            "deterministic 64-shard manifest with id-list fingerprints",
            True),
        "jsonl_roundtrip": (
            q_jsonl_roundtrip, ORACLE_JSONL_ROUNDTRIP,
            "JSONL corpus sink→source round-trip, content-hash-verified",
            True),
        "sample_k_per_group": (
            q_sample_k_per_group, ORACLE_SAMPLE_K,
            "exact-k per-language quota sample (salted bounded top-k)",
            True),
        "cdc_apply": (
            q_cdc_apply, ORACLE_CDC_APPLY,
            "MERGE/CDC batch application: upserts + tombstones, seq wins",
            True),
        "streaming_cdc_snapshot": (
            q_streaming_cdc_snapshot, ORACLE_CDC_APPLY,
            "Streaming: foreachBatch CDC snapshot maintenance (batch twin)",
            False, SKIP_STREAMING_DRAIN),
        "interval_join_events": (
            q_interval_join_events, ORACLE_INTERVAL_JOIN,
            "bucketed range join: events into overlapping activity spans",
            True),
        "decontamination": (
            q_decontamination, ORACLE_DECONTAMINATION,
            "benchmark 3-gram overlap contamination flags",
            True),
        "rolling_user_stats": (
            q_rolling_user_stats, ORACLE_ROLLING,
            "per-user trailing-hour RANGE window features",
            True),
        "repetition_quality": (
            q_repetition_quality, ORACLE_REPETITION,
            "gopher-style repetition ratios + gate flag",
            True),
        "stratified_sample": (
            q_stratified_sample, _stratified_oracle(),
            "deterministic per-language downsampling",
            True),
        "embedding_quantize": (
            q_embedding_quantize, ORACLE_QUANTIZE,
            "symmetric int8 embedding quantization + audit scalars",
            True),
        "sessionize_events": (
            q_sessionize_events, ORACLE_SESSIONIZE,
            "batch gap-sessionization rolled up per session",
            True),
        "sequence_packing": (
            q_sequence_packing, ORACLE_PACKING,
            "token-budget sequence packing (pack id + offset per doc)",
            True),
        "validate_events": (
            q_validate_events, ORACLE_VALIDATE,
            "single-scan declarative data-quality audit",
            True),
        "analyze_events": (
            q_analyze_events, ORACLE_ANALYZE,
            "ANALYZE-style per-column min/max/null statistics",
            True),
        "pq_encode": (
            q_pq_encode, ORACLE_PQ_ENCODE,
            "product-quantization codes (4x16-dim subspaces, 16 codes)",
            True),
        "pq_ann_adc": (
            q_pq_ann_adc, ORACLE_PQ_ADC,
            "PQ asymmetric-distance top-k (decimal-exact LUT sums)",
            True),
        "pq_ann_adc_trained": (
            q_pq_ann_adc_trained, _trained_pq_oracle(),
            "PQ ADC top-k over TRAINED per-subspace k-means codebooks",
            True),
        "json_extract_stats": (
            q_json_extract_stats, ORACLE_JSON_EXTRACT,
            "typed from_json extraction + keyed rollup",
            True),
        "corpus_rollup": (
            q_corpus_rollup, ORACLE_CORPUS_ROLLUP,
            "ROLLUP grouping sets: subtotals + grand total in one pass",
            True),
        "quality_percentile_filter": (
            q_quality_percentile_filter, ORACLE_QUALITY_PCT,
            "top-60%-per-language percentile curation filter",
            True),
        "incremental_dedup": (
            q_incremental_dedup, _incremental_oracle(),
            "new-batch-vs-corpus dedup (exact digest + cross-side LSH)",
            True),
        "streaming_incremental_dedup": (
            q_streaming_incremental_dedup, _streaming_incremental_oracle(),
            "Streaming: ingest dedup gate vs persisted corpus index",
            False, SKIP_STREAMING_DRAIN),
        "temperature_mix_sample": (
            q_temperature_mix, ORACLE_TEMPERATURE_MIX,
            "α-smoothed temperature mixing rates + deterministic sample",
            True),
        "chunk_documents": (
            q_chunk_documents, ORACLE_CHUNK_DOCUMENTS,
            "overlapping token-window chunking (context-window prep)",
            True),
        "dedup_levenshtein": (
            q_dedup_levenshtein, ORACLE_LEVENSHTEIN,
            "length-blocked edit-distance near-dup pairs",
            True),
        "events_window_dedup": (
            q_events_window_dedup, ORACLE_EVENTS_WINDOW_DEDUP,
            "batch windowed dedup (keyed lag; streaming_dedup twin)",
            True),
        "curation_pipeline": (
            q_curation_pipeline, _curation_oracle(),
            "per-language curation funnel: quality→repetition→dedup→split",
            True),
        "pii_redaction": (
            q_pii_redaction, _pii_redaction_oracle(),
            "typed-token PII scrub (email/IP/SSN/phone), map-only",
            True),
        "pii_stats": (
            q_pii_stats, _pii_stats_oracle(),
            "per-source PII audit rollup (privacy-review report)",
            True),
        "line_dedup": (
            q_line_dedup, ORACLE_LINE_DEDUP,
            "corpus-wide duplicate-line removal, keep-first (CCNet §4.1)",
            True),
        "boilerplate_strip": (
            q_boilerplate_strip, ORACLE_BOILERPLATE_STRIP,
            "C4-style boilerplate-line removal (doc-frequency ≥ 25)",
            True),
        "boilerplate_lines": (
            q_boilerplate_lines, ORACLE_BOILERPLATE_LINES,
            "boilerplate audit: lines by document frequency",
            True),
        "incremental_line_dedup": (
            q_incremental_line_dedup, ORACLE_INCREMENTAL_LINE_DEDUP,
            "batch-vs-corpus line dedup (ingest shape, keep-first)",
            True),
        "domain_stats": (
            q_domain_stats, ORACLE_DOMAIN_STATS,
            "per-domain provenance audit (URL extraction + rollup)",
            True),
        "url_blocklist_audit": (
            q_url_blocklist_audit, ORACLE_URL_BLOCKLIST_AUDIT,
            "URL blocklist screening flags (suffix-matched, map-only)",
            True),
        "url_dedup": (
            q_url_dedup, _url_dedup_oracle(),
            "canonical-URL keep-first dedup (normalize + one key shuffle)",
            True),
        "gopher_quality_filter": (
            q_gopher_quality_filter, _gopher_oracle(),
            "Gopher rule-set document gates (map-only, codegen)",
            True),
        "incremental_url_dedup": (
            q_incremental_url_dedup, _incremental_url_oracle(),
            "ingest URL gate: batch vs corpus-distinct-keys anti shape",
            True),
        "weighted_sample": (
            q_weighted_sample, ORACLE_WEIGHTED_SAMPLE,
            "exact-k weighted sample without replacement (A-ES)",
            True),
    }
