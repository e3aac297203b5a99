"""Streaming ingest dedup gate: flag every arriving document against a
precomputed corpus DedupIndex (operators/dedup.py::build_dedup_index)
without recomputing corpus artifacts — the streaming twin of
``incremental_dedup`` and the steady-state shape of dedup at 100 TB:
corpus signatures are written once at ingest; each micro-batch pays only
its own hashing plus stream-static joins against the index.

Streaming-specific plan shape (vs the batch twin):

- The batch operator derives minhash via explode → groupBy-min (map-side
  partials, one shuffle). A streaming query allows only ONE aggregation,
  which the final per-doc flag rollup needs — so signatures here are
  per-row array expressions (``array_min`` over a hashed shingle array):
  zero shuffles, no state, and exactly the right cost model for an
  ingest gate where the incoming micro-batch is small. The md5 per
  shingle is evaluated once (hashes bound as their own projected column
  before the permutation transforms).
- All corpus-side joins (digest lookup, banded LSH join, shingle verify)
  are stream-static — stateless, no watermark required.
- The single streaming aggregation folds the evidence union (exact hits,
  verified near hits, and a baseline row per doc) into one row per
  arriving doc; min/max aggregates make multi-band candidate repeats
  idempotent, so no streaming dropDuplicates state is needed.
- The degenerate-bucket cap is computed over the CORPUS side only (a
  static aggregation): the global both-sides count the batch operator
  uses would be a second streaming aggregation. At steady state the
  corpus dwarfs any micro-batch, so the corpus-side cap is the binding
  one anyway.

Values are bit-compatible with the batch operator (same md5-derived hash
family, same band keys, same round-6 Jaccard), so the DuckDB oracle for
the drained stream is the same SQL as the batch twin's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from exness_data_preprocess_spark.functions.hashing import (
    MERSENNE_P,
    md5_h32,
    minhash_coeffs,
)
from exness_data_preprocess_spark.operators.dedup import (
    DedupIndex,
    shingles_col,
)


def _row_minhash_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    bands: int,
    shingle_n: int,
) -> DataFrame:
    """(new_id, sh_n, band_idx, band_key) via per-row expressions only —
    value-identical to the batch explode/groupBy path (same hash family,
    same concat_ws band keys), but stateless and shuffle-free."""
    if num_perm % bands != 0:
        # same guard as the batch paths (review find: silently dropping
        # the trailing permutations yields band keys from a DIFFERENT
        # family that never match the corpus index — every near-dup
        # missed, no error)
        raise ValueError(
            f"num_perm ({num_perm}) must be divisible by bands ({bands}); "
            "band keys from a truncated signature never match the index"
        )
    rows_per_band = num_perm // bands
    base = df.select(
        F.col(id_col).alias("new_id"),
        shingles_col(F.col(text_col), shingle_n).alias("sh_n"),
    ).withColumn("hs", F.transform("sh_n", lambda s: md5_h32(s)))
    sig_cols = [
        F.array_min(
            F.transform(
                "hs", lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)
            )
        ).alias(f"m{j}")
        for j, (a, b) in enumerate(minhash_coeffs(num_perm))
    ]
    sigs = base.filter(F.size("sh_n") > 0).select("new_id", "sh_n", *sig_cols)
    return sigs.select(
        "new_id",
        "sh_n",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"m{i}").cast("string")
                            for i in range(
                                b * rows_per_band, (b + 1) * rows_per_band
                            )
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_key"),
    )


def stream_incremental_dedup(
    new_stream: DataFrame,
    corpus_index: DedupIndex,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 1,
    jaccard_threshold: float = 0.8,
    corpus_bucket_cap: int | None = 1000,
) -> DataFrame:
    """One row per arriving doc: (doc_id, exact_dup, near_dup,
    best_match_id, keep) — the batch twin's output schema, produced by a
    single complete-mode streaming aggregation.

    Drain with ``run_available_now_to_memory(..., "complete")`` for
    backfills. For a LONG-RUNNING live gate, do not run this complete-
    mode aggregation open-ended (review find: the unwatermarked
    aggregate keeps one state row per doc forever and complete mode
    re-emits everything each batch; file sinks reject it outright) —
    wire the *pre-aggregation* evidence through ``foreachBatch`` and
    apply the per-batch rollup there (the ``streaming_cdc_snapshot``
    pattern), or drain in bounded availableNow windows.
    """
    t = float(jaccard_threshold)

    corp_bands = corpus_index.bands
    if corpus_bucket_cap is not None:
        ok = (
            corp_bands.groupBy("band_idx", "band_key")
            .count()
            .filter(F.col("count") <= corpus_bucket_cap)
            .drop("count")
        )
        corp_bands = corp_bands.join(ok, ["band_idx", "band_key"], "left_semi")
    corp_min = corpus_index.digests.groupBy("k").agg(
        F.min("cid").alias("exact_id")
    )

    # evidence branch 1: exact digest hits (tag 1)
    exact = (
        new_stream.select(
            F.col(id_col).alias("new_id"),
            F.md5(F.trim(F.col(text_col))).alias("k"),
        )
        .join(corp_min, "k")  # stream-static inner: only hits survive
        .select("new_id", F.col("exact_id").alias("cid"), F.lit(1).alias("tag"))
    )

    # evidence branch 2: banded LSH candidates, Jaccard-verified (tag 0)
    banded = _row_minhash_bands(
        new_stream, text_col, id_col, num_perm, bands, shingle_n
    )
    near = (
        banded.join(corp_bands, ["band_idx", "band_key"])  # stream-static
        .join(corpus_index.shingles, "cid")
        .withColumn("inter", F.size(F.array_intersect("sh_n", "sh_c")))
        .withColumn(
            "jac",
            F.col("inter")
            / (F.size("sh_n") + F.size("sh_c") - F.col("inter")),
        )
        .filter(F.round("jac", 6) >= t)
        .select("new_id", "cid", F.lit(0).alias("tag"))
    )

    # evidence branch 3: baseline row per doc (keeps no-hit docs in
    # output). The NULL cid takes its type from the index itself — a
    # corpus with string doc ids would otherwise hit ANSI union-typing
    # against the exact/near branches' cid column.
    cid_type = corpus_index.digests.schema["cid"].dataType
    baseline = new_stream.select(
        F.col(id_col).alias("new_id"),
        F.lit(None).cast(cid_type).alias("cid"),
        F.lit(None).cast("int").alias("tag"),
    )

    ev = exact.unionByName(near).unionByName(baseline)
    agg = ev.groupBy("new_id").agg(
        F.max(F.when(F.col("tag") == 1, 1).otherwise(0)).alias("exact_dup"),
        F.max(F.when(F.col("tag") == 0, 1).otherwise(0)).alias("near_dup"),
        F.min(F.when(F.col("tag") == 1, F.col("cid"))).alias("exact_id"),
        F.min(F.when(F.col("tag") == 0, F.col("cid"))).alias("near_id"),
    )
    return agg.select(
        F.col("new_id").alias(id_col),
        "exact_dup",
        "near_dup",
        F.least("exact_id", "near_id").alias("best_match_id"),
        (F.col("exact_id").isNull() & F.col("near_id").isNull())
        .cast("int")
        .alias("keep"),
    )
