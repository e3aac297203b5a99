"""Similarity search over embedding columns (array<float>).

Two paths, as a production ANN stack would structure them:

- **Brute-force cosine top-k** — the exact baseline. Query vectors are a
  tiny broadcast side; the corpus side streams through one
  whole-stage-codegen'd projection (zip_with dot product), then a
  per-query top-k window. At 100 TB the scan dominates and parallelizes
  perfectly; no shuffle of the corpus.
- **LSH-bucketed ANN** — random-hyperplane signatures restrict candidate
  generation to matching buckets (multi-probe via band split). Hyperplanes
  are generated driver-side from a fixed seed and inlined as literals, so
  results are deterministic and oracle-reproducible.

All dot products are computed in float64 after casting, in left-to-right
order, so an ANSI-SQL oracle reproduces them to the last ulp (outputs are
still rounded as belt-and-braces).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, neighbor_id, cosine, rank). Self-matches are
    excluded; ties on the rounded cosine break by neighbor id so ranking
    is total and deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        _norm(_as_double(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
        _norm(_as_double(vec_col)).alias("cn"),
    )
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    # Bounded top-k FIRST (review find): a bare row_number window
    # partitioned by query_id funnels every scored corpus row for a
    # query through ONE reducer — the single-partition-window
    # anti-pattern this repo polices elsewhere. topk_per_group_bounded
    # prunes to ≤ k rows per query with partial-aggregable state
    # (negated cosine gives the ascending order it needs; negation of a
    # rounded double is exact), and the rank window then runs over k
    # rows per query instead of the corpus.
    from exness_data_preprocess_spark.operators.skew import (
        topk_per_group_bounded,
    )

    bounded = topk_per_group_bounded(
        scored.select(
            "query_id", (-F.col("cosine")).alias("_negcos"), "neighbor_id"
        ),
        ("query_id",),
        ("_negcos", "neighbor_id"),
        k,
    ).withColumn("cosine", -F.col("_negcos"))  # negation round-trips exactly
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        bounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (fixed-seed Gaussian, rounded so
    literal SQL rendering is exact)."""
    rng = np.random.RandomState(seed)
    return [
        [round(float(x), 6) for x in rng.randn(dim)] for _ in range(n_planes)
    ]


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit_j = 1 iff <v, plane_j> >= 0."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(p) for p in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        * F.lit(1 << j)
        for j, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def train_ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> list[list[float]]:
    """Real k-means centroids via ``pyspark.ml.clustering.KMeans``
    (feature-gated: raises ImportError where pyspark.ml is unavailable).

    Returns plain Python lists so the result can feed ``ivf_topk``'s
    ``centroids`` argument (driver-side literals, broadcast-shaped) and be
    persisted/shipped like any trained index artifact.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(_as_double(vec_col)).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _ivf_centroid_frame(
    corpus: DataFrame,
    n_cells: int,
    centroids: list[list[float]] | None,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """Broadcast-sized (cell_id, cent_v, cent_n) frame: trained centroid
    literals when given, else the deterministic lowest-id stand-in."""
    spark = corpus.sparkSession
    if centroids is not None:
        return spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids, 1)],
            "cell_id int, cent_v array<double>",
        ).select("cell_id", "cent_v", _norm(F.col("cent_v")).alias("cent_n"))
    # Centroid selection is a bounded "training" step (n_cells rows), so
    # the ids come to the driver — exactly where trained k-means centroids
    # would live — and cell numbering is a literal map, not a window. This
    # keeps the assignment scans window-free (no single-partition
    # WindowExec).
    cent_ids = [
        r[0] for r in corpus.select(id_col).orderBy(id_col).limit(n_cells).collect()
    ]
    id_to_cell = F.create_map(
        *[F.lit(v) for i, cid in enumerate(cent_ids, 1) for v in (cid, i)]
    )
    return corpus.filter(F.col(id_col).isin(cent_ids)).select(
        id_to_cell[F.col(id_col)].cast("int").alias("cell_id"),
        _as_double(vec_col).alias("cent_v"),
        _norm(_as_double(vec_col)).alias("cent_n"),
    )


def ivf_assign_cells(
    df: DataFrame,
    centroid_frame: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, v, nrm, cell_id): argmax-cosine IVF cell assignment against a
    broadcast (cell_id, cent_v, cent_n) frame — round(·, 6) with ties to
    the lowest cell id, the same contract as :func:`ivf_topk`'s inline
    assignment and every IVF oracle. One codegen'd scan per call; the
    centroid frame is n_cells rows and broadcasts.
    """
    side = df.select(
        F.col(id_col).alias("id"),
        _as_double(vec_col).alias("v"),
        _norm(_as_double(vec_col)).alias("nrm"),
    )
    cos = F.round(
        _dot(F.col("v"), F.col("cent_v")) / (F.col("nrm") * F.col("cent_n")),
        6,
    )
    return (
        side.crossJoin(F.broadcast(centroid_frame))
        .groupBy("id")
        .agg(
            F.max_by(
                "cell_id",
                F.struct(cos.alias("c"), (-F.col("cell_id")).alias("t")),
            ).alias("cell_id"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into ``n_cells`` cells,
    then search only the query's cell (nprobe=1).

    ``centroids`` (e.g. from :func:`train_ivf_centroids`) selects the
    trained path; by default centroids are the ``n_cells`` lowest-id
    corpus vectors — a deterministic, oracle-reproducible stand-in with
    the identical plan shape. Assignment is argmax-cosine with ties to
    the lowest cell id.

    Recall/cost trade: at nprobe=1, recall depends on how often a query
    and its true neighbors co-locate, not on cell balance alone — on
    near-uniform corpora the stand-in's skewed cells can out-recall
    balanced k-means cells (measured in
    tests/test_dedup_similarity.py::test_ivf_trained_vs_standin_recall);
    trained centroids pay off when the corpus actually clusters, and the
    standard production answer to low nprobe=1 recall is multi-probe
    (union several nearest cells at the call site).

    Scale shape: centroids broadcast (n_cells rows); each side is
    assigned in one codegen'd scan; the search join shuffles on cell_id
    only — the corpus is never compared globally.
    """
    cents = _ivf_centroid_frame(corpus, n_cells, centroids, vec_col, id_col)

    def assign(df: DataFrame, out_id: str, out_v: str, out_n: str) -> DataFrame:
        side = df.select(
            F.col(id_col).alias(out_id),
            _as_double(vec_col).alias(out_v),
            _norm(_as_double(vec_col)).alias(out_n),
        )
        cos = F.round(
            _dot(F.col(out_v), F.col("cent_v")) / (F.col(out_n) * F.col("cent_n")),
            6,
        )
        return (
            side.crossJoin(F.broadcast(cents))
            .groupBy(out_id)
            .agg(
                F.max_by(
                    "cell_id", F.struct(cos.alias("c"), (-F.col("cell_id")).alias("t"))
                ).alias("cell_id"),
                F.first(out_v).alias(out_v),
                F.first(out_n).alias(out_n),
            )
        )

    c = assign(corpus, "neighbor_id", "cv", "cn")
    q = assign(queries, "query_id", "qv", "qn")
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    scored = (
        F.broadcast(q)
        .join(c, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "cell_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Multi-probe IVF: each query searches its ``nprobe`` nearest cells
    instead of one — the standard recall knob of an IVF index (recall
    rises with nprobe at proportional candidate cost; nprobe=n_cells
    degenerates to exact brute force).

    Scale shape matches :func:`ivf_topk`: the corpus is still assigned to
    exactly one cell (one codegen'd scan), only the tiny query side fans
    out ×nprobe, and the search join still shuffles on cell_id alone. The
    probe-ranking window partitions by vector id over ``n_cells`` rows —
    bounded state per task.
    """
    cents = _ivf_centroid_frame(corpus, n_cells, centroids, vec_col, id_col)

    def assign(df: DataFrame, out_id: str, out_v: str, out_n: str,
               probes: int) -> DataFrame:
        side = df.select(
            F.col(id_col).alias(out_id),
            _as_double(vec_col).alias(out_v),
            _norm(_as_double(vec_col)).alias(out_n),
        )
        acos = F.round(
            _dot(F.col(out_v), F.col("cent_v")) / (F.col(out_n) * F.col("cent_n")),
            6,
        )
        w = Window.partitionBy(out_id).orderBy(F.desc("acos"), F.asc("cell_id"))
        return (
            side.crossJoin(F.broadcast(cents))
            .select(out_id, out_v, out_n, "cell_id", acos.alias("acos"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= probes)
            .drop("acos", "rn")
        )

    c = assign(corpus, "neighbor_id", "cv", "cn", 1)
    q = assign(queries, "query_id", "qv", "qn", nprobe)
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    scored = (
        F.broadcast(q)
        .join(c, "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucketed_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    n_planes: int = 8,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: compare only vectors whose sign signature matches
    the query's bucket. Recall trades against bucket size via n_planes;
    multi-probe = union over several plane sets at the call site.
    """
    planes = hyperplanes(dim, n_planes, seed)
    sig = lambda col: lsh_signature(_as_double(col), planes)  # noqa: E731
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("cv"),
        _norm(_as_double(vec_col)).alias("cn"),
        sig(vec_col).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        _norm(_as_double(vec_col)).alias("qn"),
        sig(vec_col).alias("bucket"),
    )
    cos = F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6)
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the storage/
    bandwidth step ahead of large-scale ANN (an int8 corpus is 4x smaller
    on disk and in shuffle than float32; IVF/PQ systems quantize exactly
    like this before indexing).

    Per vector: scale = max|x| / 127; q_i = round(x_i / scale) in
    [-127, 127].  Emits audit scalars — the quantized array's md5 /
    sum / sum-of-squares, the float norm, and the max absolute
    reconstruction error — all deterministic double arithmetic (the same
    IEEE mult/div/round in any engine), so the operator value-hash
    reproduces bit-for-bit.  Pure column expressions; no shuffle,
    scan-bound at any corpus size.
    """
    base = df.select(
        F.col(id_col),
        _as_double(vec_col).alias("v"),
        (F.array_max(F.transform(_as_double(vec_col), F.abs)) / F.lit(127.0)).alias(
            "scale"
        ),
    )
    q = F.transform(F.col("v"), lambda x: F.round(x / F.col("scale")).cast("int"))
    staged = base.select(id_col, "v", "scale", q.alias("q"))
    deq = F.transform(F.col("q"), lambda x: x.cast("double") * F.col("scale"))
    err = F.array_max(F.zip_with("v", deq, lambda x, y: F.abs(x - y)))
    return staged.select(
        id_col,
        F.round("scale", 6).alias("q_scale"),
        F.md5(F.array_join(F.col("q"), ",")).alias("q_md5"),
        F.aggregate("q", F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(
            "q", F.lit(0).cast("long"), lambda a, x: a + x.cast("long") * x
        ).alias("q_sumsq"),
        F.round(
            F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)), 6
        ).alias("norm_f32"),
        F.round(err, 6).alias("max_abs_err"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — encode + asymmetric-distance top-k
# ---------------------------------------------------------------------------
def pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Deterministic stand-in codebooks: the ``k`` lowest-id vectors'
    subvectors, one codebook per subspace (``[sub][code][dim/m]``).

    The oracle-reproducible analog of trained per-subspace k-means
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI'11); swap in pyspark.ml KMeans per subspace exactly like
    train_ivf_centroids — the plan shape below does not change.
    """
    rows = (
        corpus.select(id_col, _as_double(vec_col).alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    dim = len(rows[0]["v"])
    d_sub = dim // m
    return [
        [list(r["v"][s * d_sub:(s + 1) * d_sub]) for r in rows]
        for s in range(m)
    ]


def _codebook_frame(spark, books: list[list[list[float]]]) -> DataFrame:
    data = [
        (s, c, books[s][c])
        for s in range(len(books))
        for c in range(len(books[s]))
    ]
    return spark.createDataFrame(data, "sub int, code int, cvec array<double>")


def pq_encode(
    corpus: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector as ``m`` codebook indices (nearest centroid per
    subspace, squared-L2, ties to the lowest code).

    Returns (id, sub, code) — the exploded layout ADC search consumes; a
    64-dim float32 vector compresses to m=4 bytes of codes. Scale shape:
    the codebook is a broadcast dim (m·k rows); encoding is one scan of
    the corpus fanned out ×m, aggregated back by (id, sub) with map-side
    partial min_by — no shuffle wider than one row per (vector, sub).
    """
    m = len(books)
    d_sub = len(books[0][0])
    cb = F.broadcast(_codebook_frame(corpus.sparkSession, books))
    sub = corpus.select(
        F.col(id_col),
        _as_double(vec_col).alias("v"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        id_col,
        "sub",
        F.slice("v", F.col("sub") * d_sub + 1, d_sub).alias("sv"),
    )
    dist = F.aggregate(
        F.zip_with("sv", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        sub.join(cb, "sub")
        .groupBy(id_col, "sub")
        .agg(F.min_by("code", F.struct(dist.alias("d"), F.col("code"))).alias("code"))
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    topk: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: exact query-to-centroid lookup tables,
    summed over each corpus vector's codes.

    Determinism: per-subspace partial distances are quantized to
    DECIMAL(28,12) before the cross-row sum, so the total is exact and
    independent of aggregation order (float sums would associate
    differently between engines and break both the value hash and,
    at ties, the ranking). Scale shape: the LUT is queries × m·k rows —
    a broadcast dim; the corpus side joins on (sub, code) and shuffles
    once on the vector id for the sum; top-k is a per-query window over
    candidate rows.
    """
    m = len(books)
    d_sub = len(books[0][0])
    enc = pq_encode(corpus, books, vec_col, id_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    cb = F.broadcast(_codebook_frame(queries.sparkSession, books))
    q_sub = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(vec_col).alias("qv"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
    ).select(
        "query_id",
        "sub",
        F.slice("qv", F.col("sub") * d_sub + 1, d_sub).alias("qsv"),
    )
    pdist = F.aggregate(
        F.zip_with("qsv", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = F.broadcast(
        q_sub.join(cb, "sub").select(
            "query_id", "sub", "code",
            pdist.cast("decimal(28,12)").alias("pd"),
        )
    )
    cand = (
        enc.join(lut, ["sub", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pd").alias("adc"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id", "neighbor_id",
            F.col("adc").cast("double").alias("adc_dist"), "rank",
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = "label",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Flag corpus vectors semantically too close to any benchmark/eval
    vector (cosine ≥ ``threshold``) — the embedding-space complement of
    the 3-gram decontamination (textstats.decontaminate): catches the
    paraphrased eval leakage token overlap misses.

    Cross-side only — the benchmark is never self-joined and, being an
    eval set (tiny vs the corpus), broadcasts. Blocking picks the
    at-scale compare set, in precedence order:

    - ``centroids`` (e.g. from :func:`train_ivf_centroids`): both sides
      are IVF-cell-assigned (argmax cosine vs the broadcast centroid
      frame, ties to the lowest cell — :func:`ivf_topk`'s assignment)
      and compared within cells. Data-independent: no label column
      needed, one codegen'd assignment scan per side, the compare join
      shuffles on cell_id only. The usual IVF recall trade applies: a
      benchmark twin quantized into a different cell is missed, so size
      cells to the eval set's dispersion.
    - ``block_col``: pre-labeled corpora compare within the label.
    - neither: every corpus vector compares against the full broadcast
      benchmark — corpus-linear (the benchmark side is tiny), but pays
      |benchmark| compares per vector.

    Output one row per corpus vector: (id, contaminated, best_cosine);
    vectors whose block/cell holds no benchmark vector — or an empty
    benchmark altogether — get best_cosine NULL and contaminated 0.
    """
    use_cells = centroids is not None

    def prep(df: DataFrame, out_id: str, out_v: str, out_n: str) -> DataFrame:
        v = _as_double(vec_col)
        keep_block = block_col and not use_cells
        return df.select(
            *([F.col(block_col)] if keep_block else []),
            F.col(id_col).alias(out_id),
            v.alias(out_v),
            _norm(v).alias(out_n),
        )

    c = prep(corpus, "cid", "cv", "cn")
    b = prep(benchmark, "bid", "bv", "bn")
    if use_cells:
        cents = _ivf_centroid_frame(
            corpus, len(centroids), centroids, vec_col, id_col
        )

        def assign(df: DataFrame, out_id: str, out_v: str, out_n: str) -> DataFrame:
            # the one argmax-cosine cell assignment (shared contract:
            # round-6, ties to lowest cell id), just renamed per side
            return ivf_assign_cells(df, cents, vec_col, id_col).select(
                F.col("id").alias(out_id),
                F.col("v").alias(out_v),
                F.col("nrm").alias(out_n),
                "cell_id",
            )

        c = assign(corpus, "cid", "cv", "cn")
        b = assign(benchmark, "bid", "bv", "bn")
        on = ["cell_id"]
    elif block_col:
        on = [block_col]
    else:
        # Constant-key LEFT join, not a crossJoin: corpus rows must
        # survive an empty benchmark (contaminated=0, best_cosine NULL).
        c = c.withColumn("_k", F.lit(1))
        b = b.withColumn("_k", F.lit(1))
        on = ["_k"]
    cos = F.round(
        _dot(F.col("cv"), F.col("bv")) / (F.col("cn") * F.col("bn")), 6
    )
    return (
        c.join(F.broadcast(b), on, "left")
        .select("cid", cos.alias("cos"))
        .groupBy("cid")
        .agg(F.max("cos").alias("best_cosine"))
        .select(
            F.col("cid").alias(id_col),
            F.when(F.col("best_cosine") >= threshold, 1)
            .otherwise(0)
            .alias("contaminated"),
            "best_cosine",
        )
    )
