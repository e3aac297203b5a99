"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

These are first-class training-data-pipeline components (not in the
reference, which is numeric tick data — its UDF surface is the pandas
enrichment layer, SURVEY.md §2.K). Everything here is built-in column
expressions → whole-stage codegen; a 100 TB corpus pass runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from exness_data_preprocess_spark.functions.hashing import md5_h32, md5_h60
from exness_data_preprocess_spark.operators.dedup import shingles_col, tokens_col

# Small per-language stopword lists (public knowledge) for the n-gram/
# stopword-hit language heuristic. Deterministic, oracle-reproducible.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"],
    "es": ["el", "los", "las", "y", "es", "un", "una", "no", "por", "como"],
    "zh": ["的", "是", "不", "了", "在", "我", "有", "和", "就", "人"],
}

# BPE-ish pre-tokenization: word runs or single non-word-non-space marks —
# the regex families GPT-style tokenizers use for pre-splitting.
BPE_SPLIT_REGEX = r"\w+|[^\w\s]"

PUNCT_REGEX = r"[.,;:!?]"


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish pre-token count (word runs + standalone punctuation)."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_REGEX))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append deterministic quality-scoring features:

    n_tokens, n_tokens_bpe, avg_token_len, punct_ratio, stopword_ratio
    (English list), distinct_token_ratio, and a composite ``quality_flag``
    (1 = passes the heuristic gates used by corpus-cleaning pipelines:
    enough tokens, sane token length, not punctuation-soup, some lexical
    diversity).
    """
    text = F.col(text_col)
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_distinct = F.size(F.array_distinct(toks))
    punct = F.regexp_count(text, F.lit(PUNCT_REGEX))
    stops = F.size(
        F.filter(toks, lambda t: t.isin([F.lit(s) for s in STOPWORDS["en"]]))
    )
    avg_len = F.round(
        F.when(n_tok > 0, n_chars.cast("double") / n_tok), 6
    )
    punct_ratio = F.round(
        F.when(n_chars > 0, punct.cast("double") / n_chars), 6
    )
    stop_ratio = F.round(
        F.when(n_tok > 0, stops.cast("double") / n_tok), 6
    )
    distinct_ratio = F.round(
        F.when(n_tok > 0, n_distinct.cast("double") / n_tok), 6
    )
    flag = (
        (n_tok >= 5)
        & (avg_len >= 2.0)
        & (avg_len <= 20.0)
        & (F.coalesce(punct_ratio, F.lit(0.0)) <= 0.2)
        & (F.coalesce(distinct_ratio, F.lit(0.0)) >= 0.3)
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        token_count_bpe(text).alias("n_tokens_bpe"),
        avg_len.alias("avg_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_token_ratio"),
        flag.cast("int").alias("quality_flag"),
    )


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language scores + argmax prediction.

    score_lang = |distinct tokens ∩ stopwords(lang)|; prediction = highest
    score, ties broken by language code (deterministic). The real-corpus
    upgrade is char-n-gram profiles — same shape, bigger dim tables.
    """
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    scored = df.select(
        "*",
        *[
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(s) for s in words]))
            ).alias(f"score_{lang}")
            for lang, words in STOPWORDS.items()
        ],
    )
    # argmax with (score desc, lang asc) tie-break via array_max over structs
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"score_{lang}").alias("s"),
                    F.lit(-i).alias("prio"),  # earlier lang code wins ties
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(sorted(STOPWORDS))
            ]
        )
    )
    return scored.withColumn("pred_lang", best["lang"])


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    rank_partitions: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus vocabulary: (token, tf, df, rank) — term frequency, document
    frequency, and a deterministic frequency rank (ties by token).

    The tokenizer-training / coverage-analysis primitive of a corpus
    pipeline. ONE explode + one partial-aggregated groupBy computes tf
    and df together (``count_distinct(id_col)`` ≡ the old
    distinct-per-doc second explode, exact because ``id_col`` is unique
    per document): the shuffle carries (token, partial counts), so
    100 TB of text reduces to vocabulary-sized state. The previous
    rendering paid a second corpus scan + tokenize for the df branch
    (optimization round 10, guide §2.4).

    The global rank deliberately avoids a single-partition
    ``Window.orderBy`` (a 10⁸-token web-corpus vocabulary would funnel
    through one task). Instead it uses the zipWithIndex decomposition in
    the DataFrame API: range-partition on the rank order, number rows
    inside each bounded partition, and add the cumulative row count of the
    preceding partitions. The per-partition count job touches
    ``rank_partitions`` rows on the driver — O(partitions), not O(vocab).
    The range-partitioned frame is localCheckpointed so the offset pass
    and the output pass share one stable materialization: range-boundary
    sampling is per-evaluation, and a plain ``persist()`` could be
    evicted under memory pressure and recomputed with DIFFERENT
    boundaries — silently desynchronizing ranks from the collected
    offsets (review find). Checkpoint blocks are released by the context
    cleaner when the returned frame is dropped; vocabulary-sized state
    (tokens, not documents) is small.
    """
    from pyspark.sql import Window

    ex = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(tokens_col(F.col(text_col))).alias("tok"),
    )
    vocab = (
        ex.groupBy("tok")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct("_doc").alias("df"),
        )
        .filter(F.col("tf") >= min_count)
    )

    ranged = (
        vocab.repartitionByRange(rank_partitions, F.desc("tf"), F.asc("tok"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):  # range partition ids ascend in rank order
        offsets[pid] = acc
        acc += sizes[pid]
    off_expr = (
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv])[
            F.col("_pid")
        ]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("tf"), F.asc("tok"))
    return ranged.select(
        F.col("tok").alias("token"),
        "tf",
        "df",
        (F.coalesce(off_expr, F.lit(0)) + F.row_number().over(w))
        .cast("int")
        .alias("rank"),
    )


URL_REGEX = r"https?://\S+"
EMAIL_REGEX = r"\S+@\S+\.\S+"


def clean_text(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    out_col: str = "text_clean",
) -> DataFrame:
    """Boilerplate scrub — the normalization stage ahead of dedup/tokenize
    in a corpus pipeline: strip URLs and emails, collapse whitespace,
    trim, optionally lowercase. Pure column expressions (regexp_replace is
    JVM-side); ``n_chars_removed`` records how much was stripped.

    Patterns stay in the regex subset Java regex and RE2 interpret
    identically, so the DuckDB oracle reproduces the result exactly.
    """
    orig = F.col(text_col)
    t = F.regexp_replace(orig, URL_REGEX, " ")
    t = F.regexp_replace(t, EMAIL_REGEX, " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    if lowercase:
        t = F.lower(t)
    return df.withColumn(out_col, t).withColumn(
        "n_chars_removed", F.length(orig) - F.length(F.col(out_col))
    )


def corpus_stats(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Per-(lang, source) corpus rollup — the reporting aggregate every
    curation pipeline runs after scoring: doc counts, token totals and
    extremes, and how many docs pass the quality gate.

    Only exact aggregates (counts, integer sums, min/max) so the output
    is bit-reproducible across engines; one partial-aggregated shuffle on
    the (low-cardinality) group key.
    """
    scored = quality_features(df, text_col)
    return (
        scored.groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("quality_flag").alias("n_quality_pass"),
        )
        .orderBy(*group_cols)
    )


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    buckets: int = 100,
    seed: str = "split-v1",
) -> DataFrame:
    """Append a reproducible ``split`` column (train/val/test) by hashing
    the document id with a seed string — the standard leakage-safe corpus
    split: membership depends only on (seed, id), never on partitioning,
    row order, or cluster size, so re-runs and incremental appends land
    every doc in the same split.

    bucket = md5(seed || id) mod ``buckets``; the first
    ``weights[0]·buckets`` buckets are train, then val, then test.
    """
    train_hi = int(round(weights[0] * buckets))
    val_hi = train_hi + int(round(weights[1] * buckets))
    bucket = md5_h32(F.concat(F.lit(seed), F.col(id_col).cast("string"))) % buckets
    split = (
        F.when(bucket < train_hi, F.lit("train"))
        .when(bucket < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al., arXiv:2112.11446 §A1.1):
    the fraction of a document that is repeated content.  Boilerplate and
    template spam repeat tokens/n-grams far above natural-language rates, so
    corpus filters gate on these ratios.

    Appends (all deterministic ratios, rounded like quality_features):
      dup_token_ratio    1 − |distinct tokens| / |tokens|
      top_token_ratio    occurrences of the most frequent token / |tokens|
      dup_2gram_ratio    1 − |distinct 2-grams| / |2-grams|
      dup_3gram_ratio    1 − |distinct 3-grams| / |3-grams|
      repetition_flag    1 = passes (below all repetition ceilings)

    Pure column expressions; nothing here shuffles.  The top-token count
    runs over the *sorted* token array as a run-length maximum — O(n log n)
    per doc instead of the naive O(distinct·n) rescan (measured 3× faster
    at sf0.1), and document-local either way, so it parallelizes
    embarrassingly.
    """
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n2 = n_tok - 1  # count of 2-gram positions
    n3 = n_tok - 2
    # distinct-shingle counts (shingles_col is already distinct)
    d1 = F.size(F.array_distinct(toks))
    d2 = F.size(shingles_col(F.col(text_col), 2))
    d3 = F.size(shingles_col(F.col(text_col), 3))

    # max run length in the sorted array == count of the most frequent
    # token: run starts → next-start deltas → max. Bind the sorted array
    # once as a lambda var (same CSE workaround as shingles_col).
    def top_of(srt: Column) -> Column:
        starts = F.filter(
            F.sequence(F.lit(0), F.size(srt) - 1),
            lambda i: (i == F.lit(0)) | (F.get(srt, i) != F.get(srt, i - 1)),
        )
        ends = F.concat(
            F.slice(starts, F.lit(2), F.size(starts) - 1),
            F.array(F.size(srt)),
        )
        return F.array_max(F.zip_with(starts, ends, lambda a, b: b - a))

    top_cnt = F.transform(F.array(F.array_sort(toks)), top_of)[0]
    r = lambda c: F.round(c, 6)  # noqa: E731
    dup_tok = r(F.when(n_tok > 0, 1.0 - d1.cast("double") / n_tok))
    top_tok = r(F.when(n_tok > 0, top_cnt.cast("double") / n_tok))
    dup2 = r(F.when(n2 > 0, 1.0 - d2.cast("double") / n2))
    dup3 = r(F.when(n3 > 0, 1.0 - d3.cast("double") / n3))
    flag = (
        (F.coalesce(dup_tok, F.lit(0.0)) <= 0.8)
        & (F.coalesce(top_tok, F.lit(1.0)) <= 0.3)
        & (F.coalesce(dup2, F.lit(0.0)) <= 0.9)
    )
    return df.select(
        "*",
        dup_tok.alias("dup_token_ratio"),
        top_tok.alias("top_token_ratio"),
        dup2.alias("dup_2gram_ratio"),
        dup3.alias("dup_3gram_ratio"),
        flag.cast("int").alias("repetition_flag"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = "sample-v1",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling — the language/domain
    rebalancing step of corpus curation (e.g. keep 100% of low-resource
    languages, 10% of English).

    Membership = md5(seed ‖ id) mod buckets < rate·buckets, so it depends
    only on (seed, id): re-runs, incremental appends, and cluster resizes
    keep exactly the same rows (same contract as deterministic_split).
    The rate table enters as a broadcast-joined literal dim; the filter is
    a scan-level predicate — no shuffle at any corpus size.
    """
    spark = df.sparkSession
    rate_dim = F.broadcast(
        spark.createDataFrame(
            [(k, int(round(v * buckets))) for k, v in sorted(rates.items())],
            f"{stratum_col} string, __keep_lt int",
        )
    )
    bucket = md5_h32(F.concat(F.lit(seed), F.col(id_col).cast("string"))) % buckets
    return (
        df.join(rate_dim, stratum_col, "left")
        .filter(
            bucket
            < F.coalesce(F.col("__keep_lt"), F.lit(int(round(default_rate * buckets))))
        )
        .drop("__keep_lt")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "wsample-v1",
) -> DataFrame:
    """Exact-k weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES) — the data-mixing primitive behind
    "sample 10M docs proportional to quality score". Each row gets the
    key u^(1/w) with u a deterministic (seed, id)-hashed uniform in
    (0,1); the k largest keys are the sample, and the selection is
    provably distributed as sequential weighted draws without
    replacement.

    Deterministic: membership depends only on (seed, id, w) — the same
    reproducibility contract as deterministic_split/stratified_sample.
    Comparison uses ln(u)/w (monotone in u^(1/w)), one `ln` per row —
    the single-transcendental determinism discipline collocation_pmi
    uses; ties broken by id. The top-k is `orderBy(...).limit(k)` which
    Spark executes as TakeOrderedAndProject: per-partition bounded
    heaps + one k-row merge at the driver — no global sort, no shuffle
    of the losers, at any corpus size.

    Rows with NULL, NaN, or non-positive weight never qualify (u^(1/w)
    is undefined there); filtered scan-side. The NaN exclusion is
    explicit (advisor find): Spark orders NaN ABOVE all doubles, so
    ``NaN > 0`` is true and a NaN weight would yield key = ln(u)/NaN =
    NaN, which sorts first under ``desc`` and hijacks the sample.

    Cross-engine determinism caveat: the key is ``ln(u)/w`` computed by
    java.lang.Math.log on the Spark side and the C library's log in the
    DuckDB oracle. Both are correctly-rounded in practice on these
    platforms, but a 1-ulp divergence at the exact k-th/(k+1)-th key
    boundary would flip one membership — a latent cross-engine flake,
    not a wrong sample (either answer is a valid draw). Integer-weight
    pipelines that need a transcendental-free key can rank by the
    order-equivalent pair (w, u^(1/w)) only within equal weights; here
    the measured fixtures are divergence-free at all three scales.
    """
    u_num = md5_h60(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    # u in (0,1): (h60 + 1) / (2^60 + 1) — never 0 (ln safe), never 1.
    u = (u_num + F.lit(1)).cast("double") / F.lit(float(2**60 + 1))
    wd = F.col(weight_col).cast("double")
    key = F.log(u) / wd
    return (
        df.where(
            F.col(weight_col).isNotNull()
            & ~F.isnan(wd)
            & (F.col(weight_col) > 0)
        )
        .withColumn("__wkey", key)
        .orderBy(F.col("__wkey").desc(), F.col(id_col))
        .limit(k)
        .drop("__wkey")
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window splitting step of LLM data prep (long docs become
    training-sized pieces; the overlap preserves cross-boundary context).

    One row per (doc, chunk): (doc_id, chunk_idx, tok_start, n_tokens,
    chunk_text). Chunks start every ``chunk_tokens − overlap_tokens``
    tokens; a doc not longer than one window yields exactly one chunk,
    and the final window is allowed to be short (no padding, no dropped
    tail). Pure per-row array expressions (split → sequence explode →
    slice → concat_ws): embarrassingly parallel, no shuffle at any
    corpus size, and exactly reproducible in SQL.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    step = chunk_tokens - overlap_tokens
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col), toks.alias("tk"), F.size(toks).alias("n")
    )
    # number of windows: 1 + ceil(max(0, n - chunk)/step) — integer math
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.lit(0), F.col("n") - F.lit(chunk_tokens))
        / F.lit(step)
    ).cast("int")
    return (
        base.withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))),
        )
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * step).alias("tok_start"),
            F.least(
                F.lit(chunk_tokens),
                F.col("n") - F.col("chunk_idx") * step,
            ).alias("n_tokens"),
            F.concat_ws(
                " ",
                F.slice(
                    "tk",
                    F.col("chunk_idx") * step + 1,
                    F.lit(chunk_tokens),
                ),
            ).alias("chunk_text"),
        )
    )


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    target_fraction: float = 0.5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix-v1",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Temperature-smoothed corpus mixing: per-stratum keep rates derived
    from the α-smoothed size distribution p_g ∝ n_g^α (the standard
    multilingual rebalancing recipe — α < 1 upsamples the share of
    low-resource strata relative to their raw frequency), targeting
    ``target_fraction`` of the corpus overall, then the same
    seeded-md5-bucket membership as :func:`stratified_sample`.

    Fully lazy: group sizes, the smoothed weights, and the rate table are
    broadcast-sized frames derived in-plan — no driver-side collect. The
    weight sum is quantized to DECIMAL before summing (order-free), so
    the derived rates — and therefore the exact sampled row set — are
    engine-reproducible. α=0.5 uses ``sqrt`` (IEEE correctly-rounded);
    other α go through ``pow``, which carries a last-ulp cross-engine
    caveat (document when using a non-default α with an external oracle).

    Rates cap at 1.0 per stratum: a stratum whose smoothed share exceeds
    its raw size keeps everything (the shortfall is NOT redistributed —
    matching the common implementation, which renormalizes at the epoch
    level instead).
    """
    n_g = F.col("n_g").cast("double")
    w = F.sqrt(n_g) if alpha == 0.5 else F.pow(n_g, F.lit(alpha))
    g = (
        df.groupBy(stratum_col)
        .agg(F.count("*").alias("n_g"))
        .withColumn("wq", w.cast("decimal(24,9)"))
    )
    s = g.agg(
        F.sum("wq").cast("double").alias("wsum"),
        F.sum("n_g").alias("n_total"),
    )
    rate = F.least(
        F.lit(1.0),
        (F.lit(target_fraction) * F.col("n_total").cast("double"))
        * (F.col("wq").cast("double") / F.col("wsum"))
        / n_g,
    )
    keep = (
        g.crossJoin(F.broadcast(s))
        .select(
            stratum_col,
            F.round(rate * buckets).cast("long").alias("__keep_lt"),
        )
    )
    bucket = md5_h32(F.concat(F.lit(seed), F.col(id_col).cast("string"))) % buckets
    # NULL-SAFE rate join (review find): the groupBy computes a rate for
    # a NULL stratum, but a plain equality join would never match it
    # back, silently excluding every NULL-stratum doc from the sample
    kr = F.broadcast(keep.withColumnRenamed(stratum_col, "__stratum"))
    return (
        df.join(kr, F.col(stratum_col).eqNullSafe(F.col("__stratum")))
        .filter(bucket < F.col("__keep_lt"))
        .drop("__keep_lt", "__stratum")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_overlap: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing word n-grams with
    an eval/benchmark set (the train/test-contamination check every LLM
    pipeline runs; n-gram matching per GPT-3 appendix C / PaLM §7).

    Returns (id, overlap_ngrams, contaminated).  The benchmark's distinct
    shingle set is tiny next to the corpus (eval suites are MBs, corpora are
    TBs), so the join is a broadcast semi-lookup: corpus shingles never
    shuffle, the pass is scan-bound.  ``min_overlap`` distinct matching
    n-grams gate the flag to suppress single-collision noise.
    """
    bench_sh = F.broadcast(
        benchmark.select(
            F.explode(shingles_col(F.col(text_col), shingle_n)).alias("s")
        ).distinct()
    )
    corpus_sh = corpus.select(
        F.col(id_col), F.explode(shingles_col(F.col(text_col), shingle_n)).alias("s")
    )
    overlaps = (
        corpus_sh.join(bench_sh, "s", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("overlap_ngrams"))  # shingles are distinct per doc
    )
    return (
        corpus.select(id_col)
        .join(overlaps, id_col, "left")
        .select(
            id_col,
            F.coalesce("overlap_ngrams", F.lit(0)).alias("overlap_ngrams"),
            (F.coalesce("overlap_ngrams", F.lit(0)) >= min_overlap)
            .cast("int")
            .alias("contaminated"),
        )
    )


def quality_percentile_filter(
    df: DataFrame,
    score_col: str,
    keep_fraction: float = 0.6,
    part_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_fraction`` of rows per stratum by score — the
    percentile-threshold curation step ("keep the best 60% per language"),
    which adapts to each stratum's score distribution instead of a global
    absolute cutoff.

    ``percent_rank`` over a (stratum)-keyed window: one shuffle on the
    stratum key, sort within partitions; ties broken by id so membership
    is deterministic. At extreme per-stratum cardinality, swap the exact
    window for an approxQuantile threshold + scan-level filter (two
    passes, no sort) — same contract, documented trade.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(part_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__pr", F.percent_rank().over(w))
        .filter(F.col("__pr") <= keep_fraction)
        .drop("__pr")
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "lang",
    budget: int = 512,
) -> DataFrame:
    """Sequence packing: lay documents end-to-end (in ``id_col`` order,
    within ``part_col``) into fixed ``budget``-token training sequences,
    and report where each doc lands — the batch-construction step of a
    pretraining pipeline (docs are concatenated and the stream is cut
    every ``budget`` tokens; GPT-style packing).

    Appends:
      n_tokens     whitespace token count (docs longer than ``budget``
                   contribute exactly ``budget`` tokens — head truncation)
      pack_id      0-based index of the sequence holding the doc's first
                   token (docs may straddle into pack_id+1)
      pack_offset  position of the doc's first token inside that sequence

    One keyed running-sum window: shuffle on ``part_col``, sort within
    partitions.  At 100 TB a single partition key would still be one
    task's sort — shard the partition column further (e.g. (lang,
    split-bucket)) exactly like the vocabulary rank decomposition;
    packing only needs a deterministic order, not a single global one.
    """
    tok = token_count_ws(F.col(text_col))
    capped = F.least(tok, F.lit(budget))
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(capped).over(w)
    start = cum - capped  # tokens laid down before this doc
    return (
        df.withColumn("n_tokens", tok)
        .withColumn("pack_id", F.floor(start / budget))
        .withColumn("pack_offset", start % budget)
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc fingerprints: full-content md5, 60-bit content hash, and the
    min-shingle-hash (rolling-hash analog used for container-level dedup
    keys)."""
    text = F.col(text_col)
    norm = F.lower(F.trim(text))
    min_shingle = F.array_min(
        F.transform(shingles_col(text, 3), lambda s: md5_h32(s))
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("content_md5"),
        md5_h60(norm).alias("content_h60"),
        min_shingle.alias("min_shingle_h32"),
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    row_source: DataFrame | None = None,
) -> DataFrame:
    """Corpus-trained bigram-LM fluency score — the CCNet-style quality
    signal (Wenzek et al., 2020 score with a KenLM model and bucket by
    perplexity; this is the same shape with the LM trained on the corpus
    itself, so it needs no external artifact).

    Per doc: mean log P(w_i | w_{i-1}) under a Laplace-``alpha`` bigram
    model, P = (c(w1,w2) + α) / (c(w1) + α·|V|). Low scores = disfluent
    or out-of-distribution text (the filter/bucket key); docs with < 2
    tokens score NULL.

    Determinism: per-bigram log-probs quantize to DECIMAL(20,6) before
    the order-free exact sum (the retrieval.py/finance.py contract), so
    engine ``ln`` ulp disagreement stays below the 6-decimal output
    rounding.

    Scale shape: transitions aggregate to (doc, w1, w2, multiplicity)
    map-side before any join, so the count tables join a frame bounded
    by per-doc DISTINCT bigrams; the unigram/bigram count tables are
    vocabulary-sized (AQE broadcasts them when small, shuffles on the
    uniform bigram key when not), and |V| is a broadcast 1-row scalar.
    No corpus self-join, no global window.

    Plan economy (optimization round 10, guide §2.4): ``bi`` is derived
    from ``per_doc_bg`` (c2 = Σ m over docs) and ``v`` from ``uni``
    *through an expression that references c1*, so each derived branch
    shares its parent's shuffle — both consumers sit above the SAME
    canonicalized partial-aggregate + Exchange subtree and AQE's
    runtime stage reuse computes the corpus scan + tokenize + explode
    ONCE per exchange. The naive rendering (bi and vocab each from
    their own groupBy over the raw token stream) re-tokenized the
    corpus four times: canonical equality breaks as soon as column
    pruning specializes each branch's scan, which is exactly what the
    plain ``uni.agg(count(*))`` did (pruning dropped c1's partial
    count from the vocab copy, forking the exchange). Verified in the
    final AQE plan at sf0.1: 4 parquet scans + 4 Generates → 2, two
    ReusedExchange nodes; identical hashes at three SFs
    (OPTIMIZATION_r10.md for the wall numbers).
    """
    # un-repartitioned twin for the bare id-reattach scan (callers that
    # spread ``df`` for explode parallelism skip that exchange here)
    rows = df if row_source is None else row_source
    toks = df.select(
        F.col(id_col).alias("doc"), tokens_col(F.col(text_col)).alias("tk")
    )
    trans = toks.filter(F.size("tk") >= 2).select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 2),
                lambda i: F.struct(
                    F.col("tk")[i].alias("w1"),
                    F.col("tk")[i + 1].alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc", "bg.w1", "bg.w2")

    uni = (
        toks.select(F.explode("tk").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    # count(c1 >= 1 rows) == count(*) (group counts are >= 1 by
    # construction); the c1 reference keeps this branch's copy of the
    # uni exchange canonical-identical to the join's so the stage is
    # reused instead of re-scanning the corpus
    vocab = uni.agg(
        F.count(F.when(F.col("c1") >= 1, 1)).cast("double").alias("v")
    )
    per_doc_bg = trans.groupBy("doc", "w1", "w2").agg(
        F.count("*").alias("m")
    )
    # corpus bigram counts re-aggregated from the per-doc multiplicities
    # (Σ m ≡ count(*) over raw transitions) — shares per_doc_bg's
    # exchange instead of paying a second tokenize+explode pass
    bi = per_doc_bg.groupBy("w1", "w2").agg(F.sum("m").alias("c2"))

    # Quantize each log-prob at scale 6 BEFORE the sum: engine ``ln``
    # disagreement is ~1 ulp (1e-15 absolute here), so a per-value
    # 6-decimal boundary hit is ~1e-9-rare — whereas rounding the
    # accumulated scale-10 sum at the output edge crossed a 1e-6
    # boundary for ~0.5% of docs (measured at sf0.01).
    logp = F.round(
        F.log(
            (F.col("c2") + F.lit(alpha))
            / (F.col("c1") + F.lit(alpha) * F.col("v"))
        ),
        6,
    ).cast("decimal(20,6)")
    scored = (
        per_doc_bg.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc")
        .agg(
            F.sum(F.col("m") * logp).alias("s"),
            F.sum("m").alias("n_transitions"),
        )
        .select(
            "doc",
            "n_transitions",
            # The cross-engine-exact column is the DECIMAL sum itself
            # (scale-6 addends, order-free exact). The avg re-divides in
            # binary floating point and can land 1 ulp apart across
            # engines, so it is the convenience column, not the hashed
            # one.
            F.col("s").cast("double").alias("logprob_sum"),
            (F.col("s").cast("double") / F.col("n_transitions")).alias(
                "logprob_avg"
            ),
        )
    )
    # NULL-SAFE join key, deliberately: with a plain equi-key the
    # optimizer infers IsNotNull(doc_id) on the scored side and pushes
    # it into that branch's scan — which makes the per_doc_bg copy
    # under the join canonically DIFFERENT from the copy bi derives
    # from, so AQE stage reuse never fires and the corpus pays a third
    # tokenize+explode pass (observed: two ShuffleQueryStages with
    # identical statistics materialized separately). doc_id is the
    # table's primary key, so the inferred filter was vacuous; <=>
    # blocks the inference and the two branches collapse into one
    # reused stage.
    return (
        rows.select(F.col(id_col))
        .join(
            scored.withColumnRenamed("doc", "_sdoc"),
            F.col(id_col).eqNullSafe(F.col("_sdoc")),
            "left",
        )
        .select(
            id_col,
            F.coalesce(F.col("n_transitions"), F.lit(0)).alias("n_transitions"),
            "logprob_sum",
            "logprob_avg",
        )
    )


def blocklist_screen(
    df: DataFrame,
    terms: list[str],
    drop_threshold: int = 8,
    text_col: str = "text",
    replacement: str = "[REDACTED]",
) -> DataFrame:
    """C4-style blocklist screening: count blocklisted-term occurrences
    per document and decide drop / redact / keep.

    The curation rule every public web-corpus pipeline applies in some
    form (C4's "bad words" filter; Dolma's taggers): documents saturated
    with blocklisted terms are dropped outright, light offenders are kept
    with the terms masked, clean documents pass through untouched.

    Adds three columns:
      - ``n_blocklist_hits`` — non-overlapping whole-word match count,
      - ``screen_action`` — 'drop' (hits ≥ threshold), 'redact'
        (1..threshold-1), or 'keep' (0),
      - ``redacted_text`` — the masked text for redacted docs, the
        original for kept docs, NULL for dropped docs (their content
        never leaves the filter).

    Pure built-in expressions (``regexp_count`` / ``regexp_replace``) —
    one codegen'd scan pass, no shuffle, no Python; the 100 TB cost is
    the read itself. The alternation pattern compiles once per task.
    Terms must START AND END with a word character (validated, raising
    ``ValueError`` otherwise): matching is whole-word via ``\\b``
    anchors, and ``\\b`` between a non-word edge (e.g. the ``+`` in
    ``c++``) and a following space can never match — such a term would
    be silently dead, not safely escaped (advice find). ``\\b`` on
    word-edged terms is identical in Java regex and RE2, so the DuckDB
    oracle reproduces counts bit-for-bit; RE2 has no lookarounds, which
    is why the fix is validation rather than ``(?<!\\w)term(?!\\w)``.
    """
    if not terms:
        raise ValueError("blocklist_screen requires at least one term")
    import re as _re

    # escape so regex metacharacters inside a term are literal; reject
    # terms whose edges defeat the \b anchors outright
    bad = [t for t in terms if not _re.fullmatch(r"\w(.*\w)?", t, _re.DOTALL)]
    if bad:
        raise ValueError(
            "blocklist terms must begin and end with a word character "
            f"(\\b cannot anchor a non-word edge): {bad!r}"
        )
    pat = r"\b(" + "|".join(_re.escape(t) for t in terms) + r")\b"
    hits = F.regexp_count(F.col(text_col), F.lit(pat))
    action = (
        F.when(hits >= drop_threshold, F.lit("drop"))
        .when(hits > 0, F.lit("redact"))
        .otherwise(F.lit("keep"))
    )
    redacted = F.when(
        F.col("screen_action") == "drop", F.lit(None).cast("string")
    ).when(
        F.col("screen_action") == "redact",
        F.regexp_replace(F.col(text_col), pat, replacement),
    ).otherwise(F.col(text_col))
    return (
        df.withColumn("n_blocklist_hits", hits)
        .withColumn("screen_action", action)
        .withColumn("redacted_text", redacted)
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 64,
    seed: str = "shard-v1",
    id_col: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Deterministic training-shard assignment + per-shard manifest.

    Training jobs consume a corpus as N fixed shards; the assignment must
    be a pure function of (seed, id) — never of partitioning or row order
    — so that re-runs, incremental appends, and cluster resizes reproduce
    the same shards (same contract as :func:`deterministic_split`).

    shard_id = md5(seed ‖ id) mod ``n_shards``. The manifest row per
    shard carries doc count, total payload size, the id range, and a
    content fingerprint: md5 over the comma-joined ascending id list —
    the checksum a downstream trainer can verify its shard against.

    Scale shape: one shuffle on the uniform shard hash (N tiny groups,
    no skew by construction); ``collect_list`` state per group is the
    shard's id list — at 100 TB one keeps the fingerprint per *file*
    within the shard instead, same plan one level down. No driver state.
    """
    shard = md5_h32(
        F.concat(F.lit(seed), F.col(id_col).cast("string"))
    ) % n_shards
    return (
        df.select(
            shard.alias("shard_id"),
            F.col(id_col).alias("_id"),
            F.col(size_col).alias("_sz"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_sz").alias("total_chars"),
            F.min("_id").alias("min_doc_id"),
            F.max("_id").alias("max_doc_id"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("ids_md5"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus-analysis family (round 5): novelty, entropy, OOV, source overlap
# ---------------------------------------------------------------------------
def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc n-gram NOVELTY: the fraction of a document's distinct
    n-grams whose first corpus occurrence (lowest ``id_col`` among docs
    containing the gram) is this document.

    The memorization-side complement of span dedup (Lee et al. 2022):
    low novelty late in a corpus = the doc is mostly re-assembled from
    earlier text; a training-data audit ranks/filters on it.

    Scale shape: explode distinct grams → ONE shuffle on the gram →
    join gram-firsts back to (gram, doc) pairs → one doc-id agg. No
    self-join, no pair blowup; cost is linear in total distinct
    (doc, gram) pairs. ``novelty`` is an exact single IEEE division of
    two counts — hash-stable cross-engine unrounded.

    Plan economy (optimization round 10, guide §2.4): the gram-keyed
    exchange is established ONCE with an explicit ``repartition`` and
    both consumers derive from it — ``firsts`` aggregates in place (the
    frame already satisfies the gram distribution, so no second
    exchange and no separate scan), and the join probe reads the same
    shuffle output via runtime stage reuse. The previous rendering
    referenced the raw explode from both branches, paying the corpus
    scan + tokenize + explode twice (Spark duplicates referenced
    subtrees; the firsts branch's partial-agged exchange and the join
    branch's raw exchange canonicalize differently, so ReuseExchange
    could never fire). The join side shuffled every raw (gram, doc)
    row by gram ALREADY, so the shared exchange moves no extra bytes
    — it only deletes the second tokenize pass and the firsts
    shuffle. Hot-gram skew is unchanged (same rows landed on the same
    key before).
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_col(F.col(text_col), n)).alias("gram"),
    ).repartition("gram")
    firsts = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count_if(F.col("first_doc") == F.col("doc_id")).alias(
                "novel_grams"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "novel_grams",
        (F.col("novel_grams") / F.col("n_grams")).alias("novelty"),
    )


def doc_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc unigram (word) Shannon entropy in nats — the Gopher-rule
    family's diversity feature: near-zero entropy = degenerate repetition,
    max ln(n_words) = all-distinct.

    H = ln(N) − (Σ c·ln c)/N over per-word counts c. Computed from exact
    integer counts; the Σ c·ln c float sum is order-dependent across
    engines, so ``entropy`` ships rounded to 6 dp (the jaccard
    convention) while the integer columns stay exact.

    Plan shape (optimization round 10, guide §2.4): the per-word counts
    are run lengths of the SORTED token array, evaluated IN-ROW — the
    same run-length device as ``repetition_features``' top-token count —
    so the whole operator is a map-only projection with zero exchanges.
    The previous shape exploded every token and paid two shuffles
    ((doc, word) count, then the doc re-aggregation) for per-document
    state that never needed to leave its row (interleaved A/B at sf0.1:
    1.40-2.01 → 0.95-1.56 s). The in-row Σ c·ln c accumulates in sorted
    word order — a deterministic order, where the exploded aggregation's
    order was engine-internal; both live under the 6-dp round.
    Edge parity: NULL-text docs produced no exploded rows and were
    absent — size(NULL) is NULL, so the ``n >= 1`` filter reproduces
    that; blank text is the [''] one-token array either way.
    """
    srt = F.array_sort(tokens_col(F.col(text_col)))

    def _feats(s: Column) -> Column:
        starts = F.filter(
            F.sequence(F.lit(0), F.size(s) - 1),
            lambda i: (i == F.lit(0)) | (F.get(s, i) != F.get(s, i - 1)),
        )
        ends = F.concat(
            F.slice(starts, F.lit(2), F.size(starts) - 1),
            F.array(F.size(s)),
        )
        runs = F.zip_with(starts, ends, lambda a, b: b - a)
        clnc = F.aggregate(
            runs,
            F.lit(0.0),
            lambda a, c: a + c.cast("double") * F.log(c.cast("double")),
        )
        return F.struct(
            F.size(s).alias("n"),
            F.size(starts).alias("d"),
            clnc.alias("clnc"),
        )

    st = F.transform(F.array(srt), _feats)[0]
    return (
        df.select(F.col(id_col).alias("doc_id"), st.alias("_st"))
        .filter(F.col("_st.n") >= 1)
        .select(
            "doc_id",
            F.col("_st.n").cast("long").alias("n_words"),
            F.col("_st.d").cast("long").alias("distinct_words"),
            F.round(
                F.log(F.col("_st.n")) - F.col("_st.clnc") / F.col("_st.n"), 6
            ).alias("entropy"),
        )
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc out-of-vocabulary rate against the corpus' own top-V
    vocabulary (count desc, word asc — deterministic ties).

    The tokenizer-coverage audit run before committing a vocab size:
    docs with high OOV under the candidate vocabulary either carry rare
    content worth keeping or noise worth dropping — either way they need
    eyes. Plan: one token-count shuffle for the vocabulary, top-V kept
    via a single ORDER BY LIMIT on V bounded rows (broadcast-joined
    back), one per-doc agg. ``oov`` is an exact count division.
    """
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("word"),
    )
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(vocab_size)
        .select("word", F.lit(1).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_if(F.col("in_vocab").isNull()).alias("oov_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "oov_tokens",
            (F.col("oov_tokens") / F.col("n_tokens")).alias("oov"),
        )
    )


def source_overlap(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise source-overlap matrix: for every source pair (a < b),
    how many distinct n-grams they share — the provenance audit that
    catches mirrored/cross-posted corpora BEFORE doc-level dedup runs
    (two sources sharing half their grams are one source twice).

    Scale shape: ONE gram-keyed shuffle folds the (source, gram)
    dedup and the per-gram source set into a single ``collect_set``
    aggregation; the a<b pairs are expanded from the per-gram set
    in-row (bounded: sources are an enumerable dimension — ≤ #sources²
    pairs per gram, 20 sources here) and summed on the pair key. The
    previous rendering materialized distinct (source, gram) rows and
    self-joined them on gram — two extra gram-keyed exchanges and a
    join for the same bounded pair expansion (optimization round 10,
    guide §2.4; hashes identical at three SFs, plan diff in
    OPTIMIZATION_r10.md). Per-gram set size is capped
    by the source dimension, so ``collect_set`` state is bounded and
    the plan stays corpus-LINEAR, never doc².
    """
    per_gram = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(shingles_col(F.col(text_col), n)).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.sort_array(F.collect_set("src")).alias("srcs"))
    )
    pairs = per_gram.select(
        F.explode(
            F.flatten(
                F.transform(
                    "srcs",
                    lambda a, i: F.transform(
                        F.slice(
                            "srcs", i + 2, F.size("srcs") - (i + 1)
                        ),
                        lambda b: F.struct(
                            a.alias("src_a"), b.alias("src_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.groupBy("p.src_a", "p.src_b").agg(
        F.count("*").alias("shared_grams")
    )


def collocation_pmi(
    df: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` collocations (adjacent token pairs) by pointwise mutual
    information — the corpus-statistics classic (Church & Hanks, 1990)
    behind phrase mining and tokenizer-merge analysis.

    PMI(w1, w2) = ln( P(w1,w2) / (P(w1)·P(w2)) ) with bigram probability
    over transitions (N2) and unigram probabilities over tokens (N1);
    pairs below ``min_count`` transitions are pruned before scoring (the
    standard sparse-count guard). Output is totally ordered by
    ``(pmi DESC, w1, w2)`` — PMI is rounded to 6dp first, so the
    cross-engine ordering is exact.

    Determinism: PMI is ONE ln of a ratio of exact integer counts; both
    engines evaluate the identical double expression, so the rounded
    value matches bit-for-bit (no sum-order exposure at all).

    Scale shape: the transition extraction is the bigram-LM pass
    (map-side explode, groupBy on the uniform (w1, w2) key); unigram
    counts join back on w1/w2 (vocabulary-sized sides, AQE-broadcast);
    N1/N2 are 1-row broadcast scalars computed from bare ``size(split)``
    scans — NOT re-aggregations of the exploded frames, which would
    duplicate the tokenize+explode subtree per branch (the plan-economy
    rule classify.py documents). The final top-k is a LIMIT over the
    pruned pair table — bounded output, no global window.
    """
    toks = df.select(tokens_col(F.col(text_col)).alias("tk"))
    trans = toks.filter(F.size("tk") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 2),
                lambda i: F.struct(
                    F.col("tk")[i].alias("w1"), F.col("tk")[i + 1].alias("w2")
                ),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    # scalar totals without an explode: N1 = all tokens, N2 = all
    # transitions (= size-1 per doc, floored at 0)
    n1 = toks.agg(F.sum(F.size("tk")).cast("double").alias("n1"))
    n2 = toks.agg(
        F.sum(F.greatest(F.size("tk") - 1, F.lit(0)))
        .cast("double")
        .alias("n2")
    )
    bi = (
        trans.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .filter(F.col("c2") >= min_count)
    )
    return (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c1").alias("c1a")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c1").alias("c1b")), "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .select(
            "w1",
            "w2",
            F.col("c2").alias("pair_count"),
            F.round(
                F.log(
                    (F.col("c2") * F.col("n1") * F.col("n1"))
                    / (F.col("n2") * F.col("c1a") * F.col("c1b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def zipf_fit(
    df: DataFrame,
    top_r: int = 100,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source Zipf fit: OLS slope of ln(freq) on ln(rank) over the
    top-``top_r`` tokens — the corpus-health audit (natural text runs
    slope ≈ -1; templated/boilerplate-heavy or synthetic-vocabulary
    sources flatten or steepen it, so drift per source is a generator/
    contamination alarm).

    Output: ``source, n_terms, zipf_slope, r2``.

    Determinism: ln(rank)/ln(freq) quantize to DECIMAL(20,6) per term,
    the five OLS sums accumulate exactly (order-free), and ONLY the
    final closed-form arithmetic runs in binary doubles — the identical
    expression both engines evaluate on identical inputs. Ranks sit on a
    total order (count DESC, token ASC).

    Scale shape: per-source token counts (uniform shuffle), then the
    top-``top_r`` per source via the salted bounded top-k; the ranking
    window runs AFTER the prune, over ≤ top_r rows per source — never a
    per-group sort of the full vocabulary.
    """
    from exness_data_preprocess_spark.operators.skew import (
        topk_per_group_bounded,
    )

    counts = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(
                F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
            ).alias("tok"),
        )
        .groupBy("src", "tok")
        .agg(F.count("*").alias("c"))
    )
    top = topk_per_group_bounded(
        counts.withColumn("negc", -F.col("c")),
        ("src",),
        ("negc", "tok"),
        top_r,
    )
    # the bounded top-k carries only (group, order) columns; the count
    # rides inside the order key as its negation
    w = Window.partitionBy("src").orderBy(F.col("negc").asc(), F.col("tok").asc())
    ranked = top.withColumn("rank", F.row_number().over(w))
    xy = ranked.select(
        "src",
        F.round(F.log(F.col("rank").cast("double")), 6)
        .cast("decimal(20,6)")
        .alias("x"),
        F.round(F.log((-F.col("negc")).cast("double")), 6)
        .cast("decimal(20,6)")
        .alias("y"),
    )
    sums = xy.groupBy("src").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return sums.select(
        F.col("src").alias("source"),
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(cov / varx, 6).alias("zipf_slope"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


# Gopher rule set (Rae et al. 2021, table A1 — public): the document-level
# heuristic gates applied before model-based quality scoring. The
# repetition rules of the same table live in repetition_features().
GOPHER_STOPWORDS = ["and", "be", "have", "of", "that", "the", "to", "with"]


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher quality-rule flags per document (Rae et al. 2021):

    * ``flag_word_count`` — word count in [min_words, max_words]
    * ``flag_mean_word_len`` — mean word length in [3, 10]
    * ``flag_symbol_ratio`` — (# '#' + ellipsis occurrences) / words < 0.1
    * ``flag_bullet`` — < 90% of lines start with a bullet mark
    * ``flag_ellipsis`` — < 30% of lines end with an ellipsis
    * ``flag_alpha`` — ≥ 80% of words contain an alphabetic character
    * ``flag_stopword`` — ≥ 2 distinct Gopher stopwords present
    * ``gopher_pass`` — every flag passes

    (The two repetition rules of the same table are
    :func:`repetition_features` — compose both for the full gate.)

    Map-only: one pass of higher-order array expressions under
    whole-stage codegen — no shuffle, no UDF; a 100 TB corpus gate runs
    at scan speed. Ratios are exact small-int IEEE divisions rounded to
    6 dp, reproducible across engines; a doc with zero words fails the
    word-dependent rules and zero-line docs pass the line rules (both
    directions pinned in the DuckDB oracle).
    """
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    n_words = F.size(toks)
    nw = F.when(n_words > 0, n_words.cast("double"))
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    mean_len = sum_len.cast("double") / nw
    n_symbols = F.regexp_count(
        F.col(text_col), F.lit(r"#|\.\.\.|…")
    ).cast("double")
    symbol_ratio = n_symbols / nw
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != ""
    )
    n_lines = F.size(lines)
    nl = F.when(n_lines > 0, n_lines.cast("double"))
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))).cast(
            "double"
        )
        / nl
    )
    ellipsis_frac = (
        F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
        ).cast("double")
        / nl
    )
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double")
        / nw
    )
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(toks, s),
        )
    )

    def _flag(cond) -> Column:
        return F.when(cond, 1).otherwise(0)

    flags = {
        "flag_word_count": _flag(
            (n_words >= min_words) & (n_words <= max_words)
        ),
        "flag_mean_word_len": _flag((mean_len >= 3.0) & (mean_len <= 10.0)),
        "flag_symbol_ratio": _flag(symbol_ratio < 0.1),
        "flag_bullet": _flag(F.coalesce(bullet_frac, F.lit(0.0)) < 0.9),
        "flag_ellipsis": _flag(F.coalesce(ellipsis_frac, F.lit(0.0)) < 0.3),
        "flag_alpha": _flag(alpha_frac >= 0.8),
        "flag_stopword": _flag(n_stop >= 2),
    }
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(F.coalesce(bullet_frac, F.lit(0.0)), 6).alias("bullet_frac"),
        F.round(F.coalesce(ellipsis_frac, F.lit(0.0)), 6).alias(
            "ellipsis_frac"
        ),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        *[c.alias(n) for n, c in flags.items()],
    )
    pass_expr = None
    for n in flags:
        pass_expr = (
            F.col(n) if pass_expr is None else pass_expr * F.col(n)
        )
    return out.withColumn("gopher_pass", pass_expr)


def ccnet_fluency_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    row_source: DataFrame | None = None,
) -> DataFrame:
    """CCNet head/middle/tail buckets (Wenzek et al. 2020 §4.3): rank
    each language's documents by LM fluency and split into terciles —
    the signature CCNet move (train on "head", inspect "tail").

    Fluency is the corpus-trained bigram score of
    :func:`bigram_logprob_score`. The rank ORDERS by the unrounded
    mean log-prob (the decimal sum's double cast is cross-engine
    bit-stable — the `lm_fluency_score` hash proves it — and IEEE
    division keeps it so; ties break on doc id), while the OUTPUT
    carries the exact decimal `logprob_sum` — a 6-dp rounded ratio
    here split engines at a .5 boundary at sf0.1 (the known
    round-half class), so the convenience ratio is deliberately NOT
    emitted. Bucket boundaries are PURE INTEGER math on the
    per-language rank — ``3·(r−1) < n`` → head, ``< 2n`` → middle —
    so no float threshold can straddle engines. Docs with < 2 tokens
    are labeled ``unscored`` and excluded from the tercile counts.

    Scale note: the per-language rank is a keyed window — one ordered
    pass per language partition (the `quality_percentile_filter`
    precedent). A 100 TB corpus with few languages should swap the
    exact rank for sampled per-language score thresholds (CCNet itself
    buckets against thresholds from a sample); the tercile CONTRACT
    here — integer boundaries on an ordered rank — is unchanged by
    that substitution.

    Plan economy (optimization round 10, guide §2.4): the original
    rendering split scored vs unscored docs into two branches and
    UNION'd them back — and Spark duplicates a referenced subtree per
    branch, so the entire bigram-LM scoring pipeline (corpus scans,
    tokenize+explode passes, count-table joins) ran TWICE, once under
    each union arm. One pass instead: the window partitions on
    ``(lang, n_transitions > 0)``, so within the scored stratum rank
    and count are unchanged, and the unscored stratum takes the
    constant label without re-deriving its input. Same rows, same
    values (hash-checked at three SFs).
    """
    rows = df if row_source is None else row_source
    scored = bigram_logprob_score(
        df, text_col, id_col, row_source=row_source
    ).select(id_col, "n_transitions", "logprob_sum", "logprob_avg")
    langs = rows.select(F.col(id_col), F.col(lang_col))
    joined = langs.join(scored, id_col).withColumn(
        "_scored", F.col("n_transitions") > 0
    )
    w = Window.partitionBy(lang_col, "_scored").orderBy(
        F.desc("logprob_avg"), F.asc(id_col)
    )
    wc = Window.partitionBy(lang_col, "_scored")
    r = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wc)
    return joined.select(
        id_col,
        lang_col,
        "n_transitions",
        # the left join inside bigram_logprob_score already yields NULL
        # logprob_sum exactly for n_transitions = 0 docs
        "logprob_sum",
        F.when(~F.col("_scored"), "unscored")
        .when(3 * (r - 1) < n, "head")
        .when(3 * (r - 1) < 2 * n, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def bpe_pair_counts(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide adjacent-character-pair frequencies — the first BPE
    merge step (Sennrich et al. 2016), i.e. tokenizer training over the
    training corpus itself. Returns the top-k ``(left, right,
    pair_count)`` by weighted frequency (ties on the pair strings).

    Scale shape: the corpus collapses to its VOCABULARY first (one
    token-key shuffle with map-side combine), pairs explode over the
    vocabulary only — O(|V| · word_len), corpus-size-independent —
    then one partial-aggregable shuffle on the pair key and a bounded
    ``TakeOrderedAndProject`` top-k. Hot pairs ('e','r'…) combine
    map-side; the corpus text is scanned exactly once.
    """
    words = df.select(
        F.explode(
            F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
        ).alias("word")
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        wc.where(F.length("word") >= 2)
        .select(
            "c",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.struct(
                        F.substring(F.col("word"), i, 1).alias("left"),
                        F.substring(F.col("word"), i + 1, 1).alias(
                            "right"
                        ),
                    ),
                )
            ).alias("p"),
        )
        .select("p.left", "p.right", "c")
    )
    return (
        pairs.groupBy("left", "right")
        .agg(F.sum("c").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        .limit(k)
    )
