#!/usr/bin/env python
"""Training-data curation walkthrough — the operator families the engine
adds beyond reference parity, composed the way a corpus pipeline runs
them:

1. Quality gates: heuristic features + corpus-trained bigram-LM fluency
2. Exact + MinHash-LSH near-dup removal (keep the lowest id per cluster)
3. Exact-substring span dedup (strip verbatim 15-token repeats)
4. Benchmark decontamination: doc-level 3-gram flags AND span-level
   13-gram strip
5. Incremental ingest: build a persisted dedup index once, gate a new
   batch against it (the 100 TB steady-state path)
6. Temperature-smoothed language mixing of the survivors
7. Blocklist screening, an exact-k per-language eval holdout, and the
   sharded JSONL training export (manifest fingerprints included)

Runs on the driver-generated test fixture (default sf0.001) or any
directory holding a ``documents.parquet`` with (doc_id, text, lang,
source):

    python examples/corpus_curation.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None, base_dir=None):
    from pyspark.sql import functions as F

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.operators.dedup import (
        exact_dedup,
        exact_substring_spans,
        minhash_lsh_pairs,
        strip_contaminated_spans,
    )
    from exness_data_preprocess_spark.operators.textstats import (
        bigram_logprob_score,
        decontaminate,
        quality_features,
        temperature_sample,
    )
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    owns_spark = spark is None
    if owns_spark:
        spark = get_spark("corpus-curation-example")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"Example 1 — quality gates over {n0} docs")
    gated = quality_features(docs).filter(F.col("quality_flag") == 1)
    fluency = bigram_logprob_score(docs).filter(
        F.col("logprob_avg").isNotNull()
    )
    cutoff = fluency.approxQuantile("logprob_avg", [0.05], 0.01)[0]
    keep_ids = fluency.filter(F.col("logprob_avg") >= cutoff).select("doc_id")
    gated = gated.join(keep_ids, "doc_id", "semi")
    print(f"  survived heuristics + bottom-5% fluency cut: {gated.count()}")

    print("Example 2 — exact + MinHash-LSH dedup")
    uniq = exact_dedup(gated.select("doc_id", "text", "lang", "source"))
    pairs = minhash_lsh_pairs(uniq)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    deduped = uniq.join(losers, "doc_id", "anti")
    print(f"  after exact + near-dup removal: {deduped.count()}")

    print("Example 3 — exact-substring span strip (Lee et al.)")
    spans = exact_substring_spans(deduped)
    flagged = spans.filter(F.col("covered_tokens") > 0).count()
    print(f"  docs containing duplicated 15-token spans: {flagged}")

    print("Example 4 — benchmark decontamination (src0 as the eval set)")
    bench = docs.filter(F.col("source") == "src0")
    doc_flags = decontaminate(deduped, bench)
    n_flag = doc_flags.filter(F.col("contaminated") == 1).count()
    stripped = strip_contaminated_spans(deduped, bench)
    n_span = stripped.filter(F.col("covered_tokens") > 0).count()
    print(f"  doc-level 3-gram flags: {n_flag}; span-stripped docs: {n_span}")

    print("Example 5 — incremental ingest gate via the catalog dedup index")
    base = base_dir or tempfile.mkdtemp(prefix="curation_demo_")
    proc = SparkDataProcessor(spark, base)
    proc.build_dedup_index(deduped)
    batch = docs.limit(20).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    gate = proc.dedup_new_batch(batch)
    admitted = gate.filter(F.col("keep") == 1).count()
    print(f"  new batch of 20: {admitted} admitted, {20 - admitted} blocked")

    print("Example 6 — temperature-smoothed language mixing (α=0.5)")
    mixed = temperature_sample(deduped, alpha=0.5, target_fraction=0.5)
    before = {
        r["lang"]: r["n"]
        for r in deduped.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    after = {
        r["lang"]: r["n"]
        for r in mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang in sorted(before):
        print(f"  {lang}: {before[lang]} -> {after.get(lang, 0)}")

    print("Example 7 — blocklist screen, eval quota sample, sharded export")
    from exness_data_preprocess_spark.operators.skew import sample_k_per_group
    from exness_data_preprocess_spark.operators.textstats import (
        blocklist_screen,
        shard_manifest,
    )
    from exness_data_preprocess_spark.sources.corpus_io import (
        export_training_shards,
    )

    screened = blocklist_screen(mixed, ["slow", "big"], drop_threshold=8)
    final = screened.filter(F.col("screen_action") != "drop").select(
        "doc_id",
        F.col("redacted_text").alias("text"),
        "lang",
        "source",
        F.length("redacted_text").cast("long").alias("n_chars"),
    )
    print(f"  post-blocklist corpus: {final.count()}")
    eval_ids = sample_k_per_group(final, k=5, group_cols=("lang",))
    train = final.join(eval_ids.select("doc_id"), "doc_id", "anti")
    print(f"  held-out eval docs: {eval_ids.count()}; train: {train.count()}")
    out_dir = str(Path(base) / "train_shards")
    export_training_shards(train, out_dir, n_shards=4)
    manifest = shard_manifest(train, n_shards=4).orderBy("shard_id").collect()
    for r in manifest:
        print(
            f"  shard {r['shard_id']}: {r['n_docs']} docs, "
            f"{r['total_chars']} chars, md5 {r['ids_md5'][:10]}…"
        )
    print("done")
    if owns_spark:
        spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    main(sf_dir=args.sf_dir)
