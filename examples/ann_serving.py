#!/usr/bin/env python
"""ANN serving end-to-end — the round-6 Arrow/BLAS similarity surface,
composed the way a serving stack uses it:

1. Train the coarse quantizer ONCE (``train_ivf_centroids_spherical`` —
   deterministic spherical k-means; the centroids are a persistable
   index artifact, here just held in memory) and build PQ codebooks —
   both the lowest-id stand-in and the trained per-subspace Lloyd
   k-means (``train_pq_codebooks``).
2. Serve a query batch five ways and compare recall against the exact
   brute-force baseline:
   - IVF nprobe=1 (cheapest), IVF multi-probe (the recall knob),
   - LSH sign-bucketed,
   - PQ asymmetric-distance top-k over the compressed codes, with
     stand-in and trained codebooks.
   Every path is ONE zero-shuffle scan of the corpus: the query batch,
   centroids, hyperplanes, and codebooks ride into the kernel closure,
   and at most k candidate rows per (query, Arrow batch) leave an
   executor.
3. Screen the corpus against an eval set with
   ``semantic_decontaminate`` (cell-blocked) and int8-quantize the
   corpus for storage (``quantize_embeddings``).

    python examples/ann_serving.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None):
    from pyspark.sql import functions as F

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_topk_multiprobe,
        lsh_bucketed_neighbors,
        pq_adc_topk,
        pq_codebooks,
        quantize_embeddings,
        semantic_decontaminate,
        train_ivf_centroids_spherical,
        train_pq_codebooks,
    )

    spark = spark or get_spark("ann-serving")
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 10)
    dim = len(corpus.select("embedding").first()[0])

    # -- index build (once per corpus snapshot; persist like any artifact)
    centroids = train_ivf_centroids_spherical(corpus, n_cells=16, iters=5)
    books = pq_codebooks(corpus, m=4, k=16)
    trained_books = train_pq_codebooks(corpus, m=4, k=16, iters=3)
    print(f"index: {len(centroids)} IVF cells, "
          f"{len(books)}x{len(books[0])} PQ codebooks over {dim}-d vectors")

    # -- serve + recall vs exact
    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    exact = pairs(cosine_topk(corpus, queries, k=5))
    for name, df in [
        ("ivf nprobe=1", ivf_topk(corpus, queries, k=5, centroids=centroids)),
        ("ivf nprobe=4", ivf_topk_multiprobe(
            corpus, queries, k=5, nprobe=4, centroids=centroids)),
        ("lsh 8-bit", lsh_bucketed_neighbors(
            corpus, queries, dim=dim, n_planes=8, k=5)),
        ("pq adc", pq_adc_topk(corpus, queries, books, topk=5)),
        # trained per-subspace Lloyd codebooks: lower quantization MSE;
        # on tiny corpora recall can trail the data-point stand-in
        # (cluster means collapse nearby vectors to one code)
        ("pq adc trained", pq_adc_topk(corpus, queries, trained_books, topk=5)),
    ]:
        got = pairs(df)
        rec = len(exact & got) / len(exact) if exact else 1.0
        print(f"{name:12s} recall@5 vs exact: {rec:.2f} ({len(got)} rows)")

    # -- decontamination screen + storage quantization
    bench = corpus.filter(F.col("vec_id") < 25)
    body = corpus.filter(F.col("vec_id") >= 25)
    flagged = (
        semantic_decontaminate(
            body, bench, threshold=0.5, centroids=centroids, block_col=None
        )
        .filter(F.col("contaminated") == 1)
        .count()
    )
    q = quantize_embeddings(corpus)
    err = q.agg(F.max("max_abs_err")).first()[0]
    print(f"decontamination: {flagged} corpus vectors flagged >= 0.5 "
          f"against the eval set")
    print(f"int8 quantization: max reconstruction error {err:.6f}")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    raise SystemExit(main(ap.parse_args().sf_dir))
