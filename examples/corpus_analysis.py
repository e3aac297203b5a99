#!/usr/bin/env python
"""Corpus analysis + embedding dedup + external-oracle validation — the
round-5 surfaces, composed the way an audit runs them:

1. Corpus-analysis family over ``documents``:
   - n-gram NOVELTY (how much of each doc first appears here — the
     memorization audit),
   - unigram ENTROPY (Gopher-style diversity feature),
   - OOV rate against the corpus' own top-V vocabulary
     (tokenizer-coverage audit),
   - pairwise SOURCE overlap (mirrored/cross-posted corpus detection).
2. Embedding near-dup pairs two ways over ``embeddings``:
   - corpus-scaled KMeans-IVF cells (``CorpusCurator.dedup_embeddings``,
     the production default), and
   - banded signed-random-projection blocking (``srp_banded_pairs``,
     constant per-row hash cost — the high-threshold linear path).
   Both run inside the curator's context manager, which releases every
   pass's cached intermediates at scope exit.
3. External-oracle day validation: ``validate_against_source`` fetches
   the original archive (injectable fetcher — stubbed here), re-queries
   the store for the same day, and full-outer-diffs at 1e-10.

    python examples/corpus_analysis.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import io
import tempfile
import zipfile
from pathlib import Path


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None):
    from pyspark.sql import functions as F

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.curator import CorpusCurator
    from exness_data_preprocess_spark.operators.dedup import srp_banded_pairs
    from exness_data_preprocess_spark.operators.textstats import (
        doc_entropy,
        ngram_novelty,
        oov_rate,
        source_overlap,
    )

    owns_spark = spark is None
    if owns_spark:
        spark = get_spark("corpus-analysis-example")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # -- 1. corpus analysis ---------------------------------------------------
    nov = ngram_novelty(docs, n=3)
    low_novelty = nov.orderBy("novelty", "doc_id").limit(3).collect()
    print("least-novel docs (likely re-assembled from earlier text):")
    for r in low_novelty:
        print(f"  doc {r['doc_id']}: novelty={r['novelty']:.3f}")

    ent = doc_entropy(docs).agg(
        F.round(F.avg("entropy"), 3).alias("mean_entropy")
    ).first()
    print("mean unigram entropy:", ent["mean_entropy"], "nats")

    oov = oov_rate(docs, vocab_size=1000).agg(
        F.round(F.avg("oov"), 4).alias("mean_oov")
    ).first()
    print("mean OOV rate vs top-1000 vocab:", oov["mean_oov"])

    top_overlap = (
        source_overlap(docs, n=3)
        .orderBy(F.desc("shared_grams"))
        .limit(3)
        .collect()
    )
    print("most-overlapping source pairs:")
    for r in top_overlap:
        print(f"  {r['src_a']} ~ {r['src_b']}: {r['shared_grams']} shared 3-grams")

    # -- 1b. the sketch family: what the same audits cost at 100 TB ----------
    # (bounded-state estimates with their exact audit columns alongside)
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_distinct_sketch,
        kmv_source_overlap,
    )
    from exness_data_preprocess_spark.operators.dedup import tokens_col
    from exness_data_preprocess_spark.operators.textstats import zipf_fit

    toks = docs.select(
        "source",
        F.explode(
            F.filter(tokens_col(F.col("text")), lambda t: t != "")
        ).alias("tok"),
    )
    sk = kmv_distinct_sketch(toks, "source", "tok").orderBy(
        F.desc("rel_err")
    ).first()
    print(
        f"KMV distinct tokens, worst source: {sk['source']} "
        f"exact={sk['n_exact']} est={sk['est_distinct']:.1f} "
        f"(rel_err={sk['rel_err']:.3f})"
    )
    ov = (
        kmv_source_overlap(toks, "source", "tok")
        .orderBy(F.desc("est_jaccard"), "src_a", "src_b")
        .first()
    )
    print(
        f"sketch-estimated closest sources: {ov['src_a']} ~ {ov['src_b']} "
        f"jaccard~{ov['est_jaccard']:.3f}"
    )
    zf = zipf_fit(docs).orderBy("zipf_slope").first()
    print(
        f"steepest Zipf source: {zf['source']} slope={zf['zipf_slope']:.3f} "
        f"r2={zf['r2']:.3f}"
    )

    # -- 2. embedding near-dup pairs, scoped cache ---------------------------
    with CorpusCurator(spark) as cur:
        ivf_pairs = cur.dedup_embeddings(emb, threshold=0.5).count()
        srp_pairs = srp_banded_pairs(emb, threshold=0.5).count()
        print(f"near-dup pairs >= 0.5: IVF-trained={ivf_pairs}, SRP={srp_pairs}")
    # curator scope exit released the passes' cached intermediates

    # -- 3. external-oracle validation (stub fetcher) ------------------------
    from exness_data_preprocess_spark.processor import SparkDataProcessor
    from exness_data_preprocess_spark.sources.ingest import load_ticks_zip

    def stub_fetcher(instrument, variant, year, month, landing):
        lines = ["Timestamp,Bid,Ask"]
        for m in range(3):
            lines.append(f"{year}-{month:02d}-01 00:0{m}:00.500,1.1,1.1001")
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(f"{instrument}_{year}_{month:02d}.csv", "\n".join(lines))
        p = Path(landing) / f"{instrument}_{variant}_{year}_{month:02d}.zip"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(buf.getvalue())
        return p

    with tempfile.TemporaryDirectory() as tmp:
        proc = SparkDataProcessor(spark, tmp, fetcher=stub_fetcher)
        zp = proc.download_exness_zip("EURUSD", "raw_spread", 2024, 6)
        proc.insert_ticks(load_ticks_zip(spark, str(zp), "EURUSD"), "raw_spread")
        res = proc.validate_against_source("EURUSD", "2024-06-01")
        print(res.summary())
        assert res.passed

    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    main(sf_dir=args.sf_dir)
