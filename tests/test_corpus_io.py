"""JSONL corpus source/sink + sharded training export.

The registry's ``jsonl_roundtrip`` oracle proves content fidelity at
fixture scale; these tests cover the failure paths it can't: corrupt-line
quarantine (PERMISSIVE read) and the export sink's agreement with the
shard-manifest assignment contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exness_data_preprocess_spark.operators.textstats import shard_manifest
from exness_data_preprocess_spark.sources.corpus_io import (
    audit_corrupt_lines,
    export_training_shards,
    read_documents_jsonl,
    write_documents_jsonl,
)


def _docs(spark, n=50):
    return spark.createDataFrame(
        [(i, f"doc text {i}", "en", f"src{i % 3}", 10 + i) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_jsonl_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "jl")
    write_documents_jsonl(_docs(spark), out, n_files=3)
    assert audit_corrupt_lines(spark, out).count() == 0
    rows = {r["doc_id"]: r for r in read_documents_jsonl(spark, out).collect()}
    assert len(rows) == 50
    assert rows[7]["text"] == "doc text 7" and rows[7]["n_chars"] == 17


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    d = tmp_path / "jl"
    d.mkdir()
    (d / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        '{"doc_id": 3, "text": unquoted garbage}\n'
    )
    clean = read_documents_jsonl(spark, str(d))
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    bad_lines = sorted(r["raw_line"] for r in audit_corrupt_lines(spark, str(d)).collect())
    assert len(bad_lines) == 2
    assert any("not json" in b for b in bad_lines)
    assert any("garbage" in b for b in bad_lines)


def test_export_training_shards_matches_manifest(spark, tmp_path):
    docs = _docs(spark, 200)
    out = str(tmp_path / "shards")
    export_training_shards(docs, out, n_shards=8, seed="shard-v1")
    manifest = {
        r["shard_id"]: r
        for r in shard_manifest(docs, n_shards=8, seed="shard-v1").collect()
    }
    back = spark.read.json(out)  # shard_id recovered as partition column
    got = (
        back.groupBy("shard_id")
        .agg(
            F.count("*").alias("n"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list(F.col("doc_id").cast("long"))),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("ids_md5"),
        )
        .collect()
    )
    assert len(got) == len(manifest)
    for r in got:
        m = manifest[int(r["shard_id"])]
        assert r["n"] == m["n_docs"]
        assert r["ids_md5"] == m["ids_md5"]  # same membership, same ids


def test_jsonl_clean_reader_count_drops_malformed(spark, tmp_path):
    # DROPMALFORMED must hold under empty-projection plans too: count()
    # prunes every column, and a parser that skips validation there
    # would count garbage lines
    d = tmp_path / "jl"
    d.mkdir()
    (d / "p.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "garbage line\n"
        '{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}\n'
    )
    df = read_documents_jsonl(spark, str(d))
    assert df.count() == 2 == len(df.collect())


def test_jsonl_clean_reader_consistent_on_type_mismatch(spark, tmp_path):
    """Review find (verified): DROPMALFORMED counted a type-mismatched
    line ({"doc_id": "abc"}) that then vanished at materialization —
    count() and collect() disagreed on the same frame. The PERMISSIVE +
    required-field filter makes every plan see the same row set."""
    d = tmp_path / "jl2"
    d.mkdir()
    (d / "p.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "not json at all\n"
        '{"doc_id": "abc", "text": "bad id", "lang": "en", "source": "s", "n_chars": 6}\n'
        '{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}\n'
    )
    df = read_documents_jsonl(spark, str(d))
    n_count = df.count()
    n_rows = len(df.collect())
    n_proj = df.select("doc_id").count()
    assert n_count == n_rows == n_proj == 2
