"""Corpus interchange I/O: JSONL source/sink + sharded training export.

JSON-Lines is the de-facto interchange format for LLM training corpora
(one document object per line — the layout of public corpus releases and
of every major curation pipeline's intermediate dumps). The reference's
I/O surface is ZIP/CSV tick archives (tick_loader.py:37-67); this module
is the corpus-side analog of that source/sink family, Spark-native:

* the JSON source/sink is the built-in distributed reader/writer — a
  directory of line files splits across executors, schema enforced up
  front (no inference scan over 100 TB), corrupt lines quarantined to a
  column instead of failing the job;
* the training export writes one directory per deterministic shard
  (``partitionBy`` on the seed-hash shard id, the assignment contract of
  :func:`~exness_data_preprocess_spark.operators.textstats.shard_manifest`)
  so a trainer's data loader addresses shards as plain file listings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from exness_data_preprocess_spark.functions.hashing import md5_h32

__all__ = [
    "DOCUMENTS_SCHEMA",
    "read_documents_jsonl",
    "audit_corrupt_lines",
    "write_documents_jsonl",
    "export_training_shards",
]

# The documents-table contract (TESTDATA.md); JSONL files carry exactly
# these fields per line object. Derived from the canonical
# schema.DOCUMENTS_SCHEMA (review find: a hand-copied twin with
# different nullability would silently drift on the next field change)
# with every field nullable — the JSON source cannot enforce
# non-nullability at parse time, so honesty over aspiration here.
from exness_data_preprocess_spark.schema import (
    DOCUMENTS_SCHEMA as _CANONICAL_DOCS_SCHEMA,
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField(f.name, f.dataType, True)
        for f in _CANONICAL_DOCS_SCHEMA.fields
    ]
)

_CORRUPT_COL = "_corrupt_record"


def write_documents_jsonl(
    df: DataFrame, path: str, n_files: int | None = None
) -> None:
    """Write a documents frame as a JSONL directory (one object per line).

    ``n_files`` bounds the output file count (a shuffle); default keeps
    the frame's partitioning — at scale, size output files via upstream
    partitioning, not a global repartition here.
    """
    out = df.repartition(n_files) if n_files else df
    out.write.mode("overwrite").json(path)


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Read a JSONL corpus directory with the schema enforced; returns
    CLEAN rows only (malformed lines excluded here — audit them with
    :func:`audit_corrupt_lines`).

    A malformed line is skipped, never kills the job — the 100 TB-safe
    posture (one bad line in a billion). Mechanically this is PERMISSIVE
    parse + an explicit required-field filter rather than DROPMALFORMED
    (review find, verified: under DROPMALFORMED a ``count()`` plan
    parses with an empty required schema, so type-mismatched lines were
    COUNTED but vanished when rows materialized — the same frame gave
    different row sets per plan). The filter references real data
    columns, so every plan — count included — agrees on the row set;
    corrupt or type-mismatched lines null out doc_id/text and drop.
    Carrying a ``_corrupt_record`` column instead would trip Spark's
    corrupt-column-only query restriction on plain ``count()`` plans,
    which is also why the audit lives in a separate text+``from_json``
    function.
    """
    req = [f.name for f in schema.fields[:2]]  # doc_id, text
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    cond = None
    for c in req:
        cur = F.col(c).isNotNull()
        cond = cur if cond is None else (cond & cur)
    return df.filter(cond)


def audit_corrupt_lines(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Raw malformed lines from a JSONL directory, one row each.

    Reads through the (splittable) text source and parses with the
    ``from_json`` *expression* — unlike the JSON file source, an
    expression has no corrupt-column-only restriction, so counting or
    collecting the bad lines is a plain query. A line is corrupt iff
    Jackson could not parse it against the schema (the corrupt field of
    the parsed struct is populated).
    """
    full = T.StructType(
        schema.fields + [T.StructField(_CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT_COL},
        ).alias("d"),
    )
    return parsed.filter(
        F.col(f"d.{_CORRUPT_COL}").isNotNull()
    ).select("raw_line")


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int = 64,
    seed: str = "shard-v1",
    id_col: str = "doc_id",
    fmt: str = "json",
) -> None:
    """Write the corpus as ``out_dir/shard_id=K/`` directories using the
    deterministic seed-hash assignment shared with ``shard_manifest`` —
    the manifest describes exactly what this sink writes.

    ``repartition(shard_id)`` co-locates each shard into its writer tasks
    (one shuffle on the uniform hash — no skew by construction, no
    small-file explosion from every input task writing to every shard).
    """
    shard = md5_h32(
        F.concat(F.lit(seed), F.col(id_col).cast("string"))
    ) % n_shards
    (
        df.withColumn("shard_id", shard)
        .repartition(n_shards, "shard_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(fmt)
        .save(out_dir)
    )
