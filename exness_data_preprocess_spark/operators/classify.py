"""In-plan trained text classifier (hashed-feature multinomial Naive Bayes).

The production pattern behind CCNet / DCLM-style corpus curation is a
cheap linear classifier over hashed token features (fastText-shaped)
scoring every document — for language, domain, or quality routing. This
module expresses the whole train-then-score loop as ONE declarative plan:

* features are hashed token buckets (md5-derived, ``functions/hashing.py``),
  so the feature space is fixed at ``n_buckets`` regardless of vocabulary
  — the weight table is bounded and broadcastable;
* training is the multinomial-NB closed form (per-class bucket counts +
  Dirichlet/Laplace smoothing) — pure aggregation, no iterative fit, which
  is what makes it derivable inside a SQL oracle as well;
* scoring quantizes every log-weight to DECIMAL(20,6) before the order-free
  exact sum (the repo-wide cross-engine contract: engine ``ln`` may differ
  by 1 ulp, DECIMAL addition may not), so the argmax tie-break
  ``(score DESC, class ASC)`` is a total order both engines agree on.

Scale shape: token->bucket aggregation is map-side partial; the weight
grid is ``n_classes x n_buckets`` rows (KBs) and broadcasts; per-doc
scoring joins doc bucket-counts to the grid on ``bucket`` (expansion
factor = n_classes, bounded and documented) and reduces per (doc, class).
No corpus self-join, no global window — the argmax window partitions by
doc_id (uniform key).

Reference parity: the reference has no trained classifier (its curation
is rule-based flags); this is a scale-path addition in the spirit of its
quality gates, trained on the corpus itself so no external artifact is
required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from exness_data_preprocess_spark.functions.hashing import md5_h32
from exness_data_preprocess_spark.operators.dedup import tokens_col

NB_BUCKETS = 1024
NB_ALPHA = 1.0


def nb_train_score(
    df: DataFrame,
    class_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = NB_BUCKETS,
    alpha: float = NB_ALPHA,
    row_source: DataFrame | None = None,
) -> DataFrame:
    """Train multinomial NB on ``(text, class)`` and score every doc.

    Output: ``doc_id, pred_class, score, is_correct`` — the posterior
    log-score (DECIMAL-exact sum, surfaced as DOUBLE) of the argmax
    class and whether it matches the training label (the in-corpus
    accuracy audit; on held-out data you'd drop ``is_correct``).

    Plan economy: Spark duplicates a referenced subtree per branch (no
    common-subexpression reuse across joins), so every frame here is
    built from the CHEAPEST possible scan — exactly ONE pass pays the
    tokenize+explode cost (the per-doc feature aggregation; the
    per-(class, bucket) training counts are RE-aggregated from it,
    c = Σ m, so both consumers sit above the same canonicalized
    partial-aggregate + Exchange subtree and AQE stage reuse computes
    the scan + tokenize + explode once — optimization round 10, guide
    §2.4); class totals come from ``size(split)`` without an explode,
    and classes/priors from bare row scans. Measured dead end:
    GROUPING SETS over (doc, cls, bucket)/(cls, bucket) does NOT fuse
    the two passes — Catalyst pushes the grouping-id filters below the
    aggregate, splitting the branches again, each now paying the Expand
    (3.45s vs 3.09s at sf0.1; ReuseExchange never fires). Deriving cb
    from feat is the fusion GROUPING SETS couldn't express: the shared
    exchange is keyed (doc, cls, bucket) and the (cls, bucket) rollup
    is a second, vocabulary-bounded aggregation above it.
    """
    # ``row_source``: an un-repartitioned twin of ``df`` for the frames
    # that never tokenize (classes, priors, doc counts, the id reattach)
    # — callers that spread ``df`` for explode parallelism would
    # otherwise pay the round-robin exchange on every bare row scan too
    # (optimization round 10, guide §2.4)
    rows = df if row_source is None else row_source
    tok_arr = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    # Explicit not-null filter on BOTH keys, deliberately: the feat
    # frame feeds two consumers (the scoring join and the cb rollup),
    # and constraint inference pushes a DIFFERENT IsNotNull into each
    # copy's scan (doc_id from the reattach join, cls from the grid's
    # class join) — canonically forking the subtrees so AQE stage
    # reuse never fires and the corpus pays a second tokenize+explode
    # pass. Stating both conditions up front makes the copies
    # identical; for valid corpora (id and class are key columns,
    # never null) the filter drops nothing. Null-key rows never
    # reached the weight grid anyway (equi-joins drop null keys) —
    # they now also skip feature extraction.
    toks = (
        df.filter(
            F.col(id_col).isNotNull() & F.col(class_col).isNotNull()
        )
        .select(
            F.col(id_col).alias("doc"),
            F.col(class_col).alias("cls"),
            F.explode(tok_arr).alias("tok"),
        )
        .withColumn("bucket", F.pmod(md5_h32(F.col("tok")), F.lit(n_buckets)))
    )

    # the ONE tokenize+explode pass: per-doc bucket multiplicities
    feat = toks.groupBy("doc", "cls", "bucket").agg(
        F.count("*").alias("m")
    )
    # training counts per (class, bucket) re-aggregated from feat
    # (Σ m ≡ count(*) over the raw token stream) — shares feat's
    # exchange via AQE stage reuse instead of a second tokenize pass
    cb = feat.groupBy("cls", "bucket").agg(F.sum("m").alias("c"))
    # class token totals WITHOUT an explode: one size(split) scan
    ct = df.groupBy(F.col(class_col).alias("cls")).agg(
        F.sum(F.size(tok_arr)).alias("t")
    )
    classes = rows.select(F.col(class_col).alias("cls")).distinct()

    # class log-priors from document counts (bare scans; the corpus total
    # is a lazy 1-row broadcast so the whole query stays ONE action with
    # parallel stages — an eager df.count() here serializes a job into
    # the critical path)
    n_docs = rows.agg(F.count("*").cast("double").alias("n_docs"))
    prior = (
        rows.groupBy(F.col(class_col).alias("cls"))
        .agg(F.count("*").alias("nd"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "cls",
            F.round(F.log(F.col("nd") / F.col("n_docs")), 6)
            .cast("decimal(20,6)")
            .alias("lp"),
        )
    )

    # dense weight grid over classes x ALL n_buckets buckets: the
    # ln/round/DECIMAL cast runs once per (class, bucket) — n_classes x
    # n_buckets rows — NOT once per scored doc-feature row (measured
    # ~1.2s slower at sf0.1 when inlined post-join). Buckets come from
    # spark.range (free): rows for never-observed buckets simply never
    # match a doc feature, so the fixed universe is harmless
    grid = (
        classes.crossJoin(
            df.sparkSession.range(n_buckets).select(
                F.col("id").alias("bucket")
            )
        )
        .join(cb, ["cls", "bucket"], "left")
        .join(ct, "cls")
        .select(
            "cls",
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                    / (F.col("t") + F.lit(alpha * n_buckets))
                ),
                6,
            )
            .cast("decimal(20,6)")
            .alias("w"),
        )
    )

    # per-doc features scored against every class through the broadcast
    # grid (bounded x n_classes)
    doc_feat = feat.select(
        "doc", F.col("cls").alias("true_cls"), "bucket", "m"
    )
    scored = (
        doc_feat.join(F.broadcast(grid), "bucket")
        .groupBy("doc", "true_cls", "cls")
        .agg(F.sum(F.col("m") * F.col("w")).alias("like"))
        .join(F.broadcast(prior), "cls")
        .withColumn("s", F.col("like") + F.col("lp"))
    )
    w_arg = Window.partitionBy("doc").orderBy(
        F.col("s").desc(), F.col("cls").asc()
    )
    winners = (
        scored.withColumn("rn", F.row_number().over(w_arg))
        .filter(F.col("rn") == 1)
        .select("doc", "cls", "s")
    )

    # contract: EVERY doc gets a prediction. A doc with zero non-empty
    # tokens has no feature rows, so its posterior is the bare prior —
    # NB math, not a fallback hack: fill from the argmax-prior class
    # (total order (lp DESC, cls) — lp is DECIMAL-exact)
    best_prior = (
        prior.orderBy(F.col("lp").desc(), F.col("cls").asc())
        .limit(1)
        .select(F.col("cls").alias("bp_cls"), F.col("lp").alias("bp_lp"))
    )
    all_docs = rows.select(
        F.col(id_col).alias("doc"), F.col(class_col).alias("true_cls")
    )
    return (
        all_docs.join(winners, "doc", "left")
        .crossJoin(F.broadcast(best_prior))
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("cls", "bp_cls").alias("pred_class"),
            F.coalesce("s", "bp_lp").cast("double").alias("score"),
            (F.coalesce("cls", "bp_cls") == F.col("true_cls"))
            .cast("int")
            .alias("is_correct"),
        )
    )


def nb_oracle_sql(
    toks_sql: str,
    class_col: str,
    n_buckets: int = NB_BUCKETS,
    alpha: float = NB_ALPHA,
) -> str:
    """DuckDB rendering of :func:`nb_train_score` over the documents
    table — re-derives the training counts, smoothed weights, priors and
    the DECIMAL-exact argmax from the same hash family.

    ``toks_sql`` is the DuckDB expression for the token array of ``text``.
    """
    from exness_data_preprocess_spark.functions.hashing import md5_h32_sql

    h = md5_h32_sql("tok")
    return f"""
WITH tk AS (
  SELECT doc_id AS doc, {class_col} AS cls,
         ({h}) % {n_buckets} AS bucket
  FROM (
    SELECT doc_id, {class_col}, unnest(list_filter({toks_sql}, t -> t <> '')) AS tok
    FROM documents
  )
),
cb AS (SELECT cls, bucket, count(*) AS c FROM tk GROUP BY 1, 2),
-- class universe and token totals from DOCUMENTS, not from the token
-- counts: a class whose docs are all token-less must still get its
-- smoothed-floor weights and participate in the argmax (the Spark plan
-- derives classes/totals from bare document scans)
ct AS (
  SELECT {class_col} AS cls,
         sum(len(list_filter({toks_sql}, t -> t <> ''))) AS t
  FROM documents GROUP BY 1
),
grid AS (
  SELECT cl.cls, b.bucket,
         CAST(round(ln((coalesce(cb.c, 0) + {alpha!r})
                       / (ct.t + {float(alpha * n_buckets)!r})), 6)
              AS DECIMAL(20,6)) AS w
  FROM (SELECT DISTINCT {class_col} AS cls FROM documents) cl
  CROSS JOIN (SELECT DISTINCT bucket FROM cb) b
  LEFT JOIN cb ON cb.cls = cl.cls AND cb.bucket = b.bucket
  JOIN ct ON ct.cls = cl.cls
),
prior AS (
  SELECT {class_col} AS cls,
         CAST(round(ln(count(*)::DOUBLE
                       / (SELECT count(*) FROM documents)), 6)
              AS DECIMAL(20,6)) AS lp
  FROM documents GROUP BY 1
),
feat AS (
  SELECT doc, cls AS true_cls, bucket, count(*) AS m
  FROM tk GROUP BY 1, 2, 3
),
scored AS (
  SELECT f.doc, f.true_cls, g.cls,
         sum(f.m * g.w) + any_value(p.lp) AS s
  FROM feat f
  JOIN grid g USING (bucket)
  JOIN prior p ON p.cls = g.cls
  GROUP BY 1, 2, 3
),
win AS (
  SELECT doc, cls, s FROM scored
  QUALIFY row_number() OVER (PARTITION BY doc ORDER BY s DESC, cls) = 1
),
bp AS (
  SELECT cls AS bp_cls, lp AS bp_lp FROM prior
  ORDER BY lp DESC, cls LIMIT 1
)
SELECT d.doc_id,
       coalesce(w.cls, bp.bp_cls) AS pred_class,
       coalesce(w.s, bp.bp_lp)::DOUBLE AS score,
       (coalesce(w.cls, bp.bp_cls) = d.{class_col})::INT AS is_correct
FROM documents d
LEFT JOIN win w ON w.doc = d.doc_id
CROSS JOIN bp
"""
