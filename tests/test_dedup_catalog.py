"""Catalog-managed dedup index: the production surface of the 100 TB
steady-state ingest-dedup path. The index artifacts live as managed
warehouse tables (sources/catalog.py) built through the facade
(SparkDataProcessor.build_dedup_index), and both the batch and streaming
gates read them back — outputs must be identical to the self-contained
operator path (reference analog: incremental state maintained in storage,
clickhouse_gap_detector.py:57-139).
"""

from __future__ import annotations

import pytest

from exness_data_preprocess_spark.processor import SparkDataProcessor

CORPUS_ROWS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "one two three four five six"),
    (3, "lorem ipsum dolor sit amet words"),
]
NEW_ROWS = [
    (10, "alpha beta gamma delta epsilon"),        # exact dup of 1
    (11, "one two three four five six seven"),     # near dup of 2
    (12, "completely different content here now"),  # unique
]
DOC_SCHEMA = "doc_id long, text string"


@pytest.fixture()
def proc(spark, tmp_path):
    p = SparkDataProcessor(spark, tmp_path / "warehouse")
    yield p
    p.close()


def test_facade_index_matches_self_contained(spark, proc):
    from exness_data_preprocess_spark.operators.dedup import incremental_dedup

    corpus = spark.createDataFrame(CORPUS_ROWS, DOC_SCHEMA)
    new = spark.createDataFrame(NEW_ROWS, DOC_SCHEMA)

    params = proc.build_dedup_index(corpus)
    assert proc.catalog.has_dedup_index()
    assert proc.catalog.dedup_index_params() == params

    from_catalog = sorted(map(tuple, proc.dedup_new_batch(new).collect()))
    self_contained = sorted(
        map(tuple, incremental_dedup(new, corpus, jaccard_threshold=0.8).collect())
    )
    assert from_catalog == self_contained
    # and the flags are what the fixture encodes
    by_id = {r[0]: r for r in from_catalog}
    assert by_id[10][1] == 1  # exact_dup
    assert by_id[11][2] == 1  # near_dup
    assert by_id[12][4] == 1  # keep


def test_facade_stream_gate_matches_batch(spark, proc, tmp_path):
    from exness_data_preprocess_spark.streaming import run_available_now_to_memory

    corpus = spark.createDataFrame(CORPUS_ROWS, DOC_SCHEMA)
    new = spark.createDataFrame(NEW_ROWS, DOC_SCHEMA)
    proc.build_dedup_index(corpus)

    landing = str(tmp_path / "landing")
    new.write.parquet(landing)
    stream = (
        spark.readStream.format("parquet")
        .schema(new.schema)
        .load(landing)
    )
    gate = proc.stream_dedup_gate(stream)
    drained = run_available_now_to_memory(
        gate, "t_catalog_gate", "complete"
    ).toPandas()

    batch = proc.dedup_new_batch(new).toPandas()
    key = ["doc_id", "exact_dup", "near_dup", "best_match_id", "keep"]
    got = sorted(map(tuple, drained[key].fillna(-1).itertuples(index=False)))
    want = sorted(map(tuple, batch[key].fillna(-1).itertuples(index=False)))
    assert got == want


def test_append_grows_index_and_enforces_params(spark, proc):
    corpus = spark.createDataFrame(CORPUS_ROWS, DOC_SCHEMA)
    proc.build_dedup_index(corpus)

    # a doc not yet indexed passes the gate...
    fresh = spark.createDataFrame(
        [(20, "totally novel sentence about spark")], DOC_SCHEMA
    )
    assert proc.dedup_new_batch(fresh).collect()[0]["keep"] == 1

    # ...until its slice is appended to the index, then its twin is caught
    proc.build_dedup_index(fresh, mode="append")
    twin = spark.createDataFrame(
        [(21, "totally novel sentence about spark")], DOC_SCHEMA
    )
    row = proc.dedup_new_batch(twin).collect()[0]
    assert (row["exact_dup"], row["best_match_id"], row["keep"]) == (1, 20, 0)

    # appending under a different signature family must refuse
    with pytest.raises(ValueError, match="params mismatch"):
        proc.build_dedup_index(fresh, num_perm=32, bands=8, mode="append")


def test_missing_index_raises_with_guidance(spark, proc):
    new = spark.createDataFrame(NEW_ROWS, DOC_SCHEMA)
    with pytest.raises(FileNotFoundError, match="build_dedup_index"):
        proc.dedup_new_batch(new)


def test_download_zip_facade_uses_injected_fetcher(spark, tmp_path):
    """Facade parity with the reference's public one-shot download helper
    (processor.py:264-281): routed through the injectable fetcher, landing
    in the facade's landing dir, validation applied to pair/variant."""
    calls = []

    def fake_fetcher(pair, variant, year, month, dest_dir):
        calls.append((pair, variant, year, month))
        p = dest_dir / f"{pair}_{variant}_{year}_{month:02d}.zip"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"zip")
        return p

    proc = SparkDataProcessor(
        spark, tmp_path / "wh", fetcher=fake_fetcher
    )
    out = proc.download_exness_zip("eurusd", "raw_spread", 2024, 3)
    assert calls == [("EURUSD", "raw_spread", 2024, 3)]
    assert out.exists() and out.parent == proc.landing

    with pytest.raises(ValueError, match="variant"):
        proc.download_exness_zip("EURUSD", "bogus", 2024, 3)
    proc.close()
