"""Corpus retrieval / keyword scoring: BM25 top-k and per-group TF-IDF.

Rounds out the training-data curation family (dedup / quality /
decontamination, SURVEY.md §2 extensions): production pipelines retrieve
"more like this" slices with BM25 and summarize domain mixes with
distinctive keywords before choosing sampling weights.

Scale shape:
- query terms and corpus-level scalars (N, avgdl) are broadcast-sized;
  only the (doc, term) tf pass shuffles — once on `term` for the
  document-frequency window, once on `doc` for the score sum. The
  corpus is never self-joined, and each query is ONE self-contained
  plan: nothing is persisted, so repeated calls in a long-lived
  session leave no cached partitions behind.
- per-group TF-IDF windows partition by the group/term columns —
  bounded state per task, no global sort.

Determinism: the only transcendental is the idf ``ln`` — kept OUT of the
exact-sum path by quantizing each per-term score to DECIMAL before the
order-free sum (the finance.py contract); engine ``ln`` disagreement is
below the 6-decimal rounding at the output edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from exness_data_preprocess_spark.operators.dedup import tokens_col


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k documents for a bag of query terms.

    idf uses the always-positive BM25+ variant ``ln(1 + (N - df + 0.5) /
    (df + 0.5))``. Term scores quantize to DECIMAL(20,10) and sum exactly
    per doc (order-free); ranking is (score desc, id asc) on the
    6-rounded score so the top-k set is engine-reproducible.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        # drop the '' token a whitespace split of empty/blank text
        # yields (review find: it scored as a real term and padded dl)
        F.filter(
            tokens_col(F.col(text_col)), lambda t: t != ""
        ).alias("tk"),
    ).select("doc", "tk", F.size("tk").cast("double").alias("dl"))

    # query terms pass through the SAME normalization as the corpus
    # tokenizer (review find: 'Spark' silently matched nothing because
    # tokens_col lowercases — a case-differing term scored 0 everywhere)
    query_terms = [t.strip().lower() for t in query_terms]
    terms = F.array(*[F.lit(t) for t in query_terms])
    # array_intersect dedups, so hit carries exactly one row per
    # (matching doc, term): per-term document frequency is a plain
    # count(*) window over hit itself. That keeps the whole query ONE
    # self-contained plan — no persist, nothing cached across calls —
    # at the cost of a shuffle on `term` over the tiny hit frame.
    # stats is a second, column-pruned corpus scan (it needs every
    # doc's length, hits or not).
    hit = toks.select(
        "doc",
        "dl",
        F.explode(F.array_intersect(terms, F.col("tk"))).alias("term"),
        "tk",
    ).select(
        "doc",
        "dl",
        "term",
        F.size(F.filter("tk", lambda x: x == F.col("term")))
        .cast("double")
        .alias("tf"),
    )

    stats = toks.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl") / F.count("*")).alias("avgdl"),
    )
    w_term = Window.partitionBy("term")

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + (F.lit(b) * F.col("dl")) / F.col("avgdl")
    )
    term_score = (idf * ((F.col("tf") * F.lit(k1 + 1.0)) / denom)).cast(
        "decimal(20,10)"
    )

    scored = (
        hit.withColumn("df", F.count("*").over(w_term).cast("double"))
        .crossJoin(F.broadcast(stats))
        .groupBy("doc")
        .agg(F.sum(term_score).alias("s"), F.count("*").alias("n_terms"))
        .select(
            F.col("doc").alias(id_col),
            F.round(F.col("s").cast("double"), 6).alias("bm25"),
            "n_terms",
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


def rrf_fuse(
    legs: list[DataFrame],
    id_col: str = "doc_id",
    score_cols: list[str] | None = None,
    k0: int = 60,
    k: int = 10,
    query_col: str | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of bounded retrieval legs (the standard
    hybrid-search combiner: BM25 ⊕ dense cosine, Cormack et al. 2009).

    Each leg is ``(id, score)`` — or ``(query, id, score)`` when
    ``query_col`` is set (the batch serving shape: every query's legs
    fuse independently). A leg's rank is ``row_number`` over
    (score desc, id asc), per query when batched — total and
    engine-reproducible. Fused score = Σ 1/(k0 + rank_i) over the legs
    that ranked the id (an id missing from a leg contributes 0, the RRF
    convention). Output: [query,] id, one ``rank_<i>`` per leg (NULL
    when unranked), ``rrf`` rounded to 6; top-k per query.

    Scale contract: legs must already be BOUNDED top-N frames per query
    (every retrieval operator here ends in a bounded top-k) — the rank
    windows and the fusion join run on ≤ N rows per (leg, query), and
    batched mode partitions every window by the query key, so per-task
    state stays ≤ N however many queries are in flight. The heavy
    lifting stays in the legs, which scan the corpus with their own
    scale-safe plans. The final per-query top-k is a keyed window
    (batched) or a global ``limit`` (single query) over ≤ legs·N rows.
    1/(k0+rank) is an exact small-int IEEE division, bit-identical
    across engines; the ≤-few-term sum is ordered by coalesce chain, so
    the 6-dp round never straddles.
    """
    if score_cols is None:
        score_cols = ["score"] * len(legs)
    keys = ([query_col] if query_col else []) + [id_col]
    fused = None
    rank_names = []
    for i, (leg, sc) in enumerate(zip(legs, score_cols)):
        rname = f"rank_{i}"
        rank_names.append(rname)
        w = (
            Window.partitionBy(query_col) if query_col else Window
        ).orderBy(F.desc(sc), F.asc(id_col))
        ranked = leg.select(
            *keys, F.row_number().over(w).alias(rname)
        )
        fused = ranked if fused is None else fused.join(
            ranked, keys, "full_outer"
        )
    rrf = None
    for rname in rank_names:
        term = F.when(
            F.col(rname).isNotNull(),
            F.lit(1.0) / (F.lit(float(k0)) + F.col(rname).cast("double")),
        ).otherwise(F.lit(0.0))
        rrf = term if rrf is None else rrf + term
    scored = fused.select(*keys, *rank_names, F.round(rrf, 6).alias("rrf"))
    if query_col is None:
        return scored.orderBy(F.desc("rrf"), F.asc(id_col)).limit(k)
    wq = Window.partitionBy(query_col).orderBy(
        F.desc("rrf"), F.asc(id_col)
    )
    return (
        scored.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= k)
        .drop("_r")
    )


def tfidf_top_terms(
    df: DataFrame,
    group_col: str = "source",
    k: int = 5,
    text_col: str = "text",
    min_tf: int = 2,
) -> DataFrame:
    """Top-k distinctive terms per group by TF-IDF over group "documents"
    (all texts of a group concatenated, the domain-mix reporting shape).

    tf = term occurrences within the group; idf = ln(N_groups /
    groups_containing_term) — ubiquitous terms score exactly 0 and never
    outrank group-specific vocabulary. Ranking is (rounded score desc,
    term asc): ties broken on the string, reproducible anywhere.
    """
    ex = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
        ).alias("term"),
    )
    # tf is vocabulary-sized, one row per (group, term) — so the
    # group-frequency of a term is count(*) over a term-partitioned
    # window on tf itself. The window MUST precede the min_tf filter
    # (a term rare in one group still counts toward that group's gdf),
    # and keeps the query one self-contained plan: the corpus
    # tokenization pass runs once with no persist to leak.
    w_term = Window.partitionBy("term")
    tf = (
        ex.groupBy("grp", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("gdf", F.count("*").over(w_term))
    )
    # group count as a broadcast 1-row frame, not a driver-side action —
    # the plan stays fully lazy and submits as one job. Counted from the
    # SOURCE frame, not from tf: a group whose every text is NULL has no
    # token rows but still counts toward N (matching `count(DISTINCT
    # group)` over the table in any external SQL engine).
    ng = df.agg(
        F.count_distinct(F.col(group_col)).cast("double").alias("n_groups")
    )

    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("n_groups") / F.col("gdf").cast("double")),
        6,
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.filter(F.col("tf") >= min_tf)
        .crossJoin(F.broadcast(ng))
        .select("grp", "term", "tf", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumnRenamed("grp", group_col)
        .select(group_col, "term", "tf", "score", "rank")
    )
