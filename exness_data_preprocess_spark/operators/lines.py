"""Line-level corpus dedup and boilerplate removal — the paragraph-hash
stage web-corpus pipelines run before document-level dedup (CCNet §4.1
drops duplicate paragraphs corpus-wide; C4 drops boilerplate lines that
repeat across many pages: nav menus, cookie banners, footers).

Reference scope note: the reference engine has no text-curation surface;
this module is part of the LLM-data-pipeline families this repo adds
beyond reference parity, alongside ``operators/pii.py`` and
``operators/textstats.py``.

Design for 100 TB:

* Lines are exploded map-side (``posexplode(split(...))``) and keyed by
  ``md5`` of a normalized form (lower, non-letter runs collapsed to one
  space, trimmed) — the CCNet normalization, expressed as two chained
  JVM regexps under codegen.
* Keep-first resolution is ``groupBy(line_key).agg(min(struct(doc,
  pos)))`` — partially aggregable, so a boilerplate line present in 40%
  of all documents combines map-side instead of melting one reducer —
  followed by an equi-join back on ``line_key``. No window over the
  line key: a window would sort the hot key's entire occurrence list in
  one task; the agg+join shape is the skew-safe twin and AQE can split
  the join's hot partition besides.
* Document reconstruction is one ``groupBy(doc_id)`` with
  ``array_sort(collect_list(struct(pos, line)))`` — per-doc state is
  bounded by the doc's own line count.
* Blank lines (normalized form empty) are never dedup candidates: they
  carry no content and dropping "all blank lines but the corpus-first"
  would mangle formatting. They are kept in place, always.

Total: three shuffles (key-agg, key-join, doc-regroup), all on keys
with map-side combine or AQE skew splitting. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "split_lines",
    "line_dedup",
    "line_doc_frequency",
    "strip_boilerplate",
    "incremental_line_dedup",
]


def _norm(line: Column) -> Column:
    """CCNet-style normalization: lowercase, collapse every run of
    non-letters to a single space, trim. Confined to the regex subset
    Java regex and RE2/DuckDB interpret identically."""
    return F.trim(F.regexp_replace(F.lower(line), "[^a-z]+", " "))


def split_lines(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Explode documents into ``(id, line_no, line, line_key)`` rows.

    ``line_no`` is 0-based position within the document; ``line_key``
    is ``md5`` of the normalized line, NULL for blank-normalized lines
    (which the dedup/boilerplate passes always keep).
    """
    n = _norm(F.col("line"))
    return df.select(
        F.col(id_col).alias("_lid"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "line_no", "line"
        ),
    ).select(
        F.col("_lid").alias(id_col),
        "line_no",
        "line",
        F.when(n != "", F.md5(n)).alias("line_key"),
    )


def _reassemble(
    kept: DataFrame, doc_ids: DataFrame, id_col: str
) -> DataFrame:
    """Regroup kept ``(id, line_no, line)`` rows back into documents.

    Docs whose every line was dropped come back with empty text and
    ``n_lines_kept = 0`` (the caller filters or audits them); the left
    join against the original id set guarantees one output row per
    input document.
    """
    docs_out = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_kept"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    return (
        doc_ids.join(docs_out, id_col, "left")
        .withColumn("text_kept", F.coalesce("text_kept", F.lit("")))
        .withColumn(
            "n_lines_kept",
            F.coalesce("n_lines_kept", F.lit(0)).cast("int"),
        )
    )


def line_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide duplicate-line removal, keep-first (CCNet §4.1).

    Every line whose normalized form already occurred earlier in the
    corpus — ordered by ``(id, line_no)`` — is dropped, including
    repeats inside the same document. Returns one row per input doc:
    ``(id, text_kept, n_lines, n_lines_kept)``.
    """
    lines = split_lines(df, text_col, id_col)
    keyed = lines.where(F.col("line_key").isNotNull())
    firsts = keyed.groupBy("line_key").agg(
        F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("first")
    )
    kept_keyed = (
        keyed.join(firsts, "line_key")
        .where(
            (F.col(id_col) == F.col("first")[id_col])
            & (F.col("line_no") == F.col("first.line_no"))
        )
        .select(id_col, "line_no", "line")
    )
    blanks = lines.where(F.col("line_key").isNull()).select(
        id_col, "line_no", "line"
    )
    n_lines = (
        F.size(F.split(F.col(text_col), "\n")).cast("int").alias("n_lines")
    )
    doc_ids = df.select(F.col(id_col), n_lines)
    return _reassemble(kept_keyed.unionByName(blanks), doc_ids, id_col)


def incremental_line_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Line-dedup a NEW batch against an EXISTING corpus (the ingest
    shape: the corpus is already line-deduped, the batch arrives
    later). A batch line is dropped if its normalized form occurs
    anywhere in the corpus (left-anti join on ``line_key`` — the
    corpus side reduces to its DISTINCT key set, one partial-agg
    shuffle, never a corpus self-join), then keep-first WITHIN the
    batch for lines new to the corpus. Returns one row per batch doc:
    ``(id, text_kept, n_lines, n_lines_kept)``.

    Composes with :func:`line_dedup`: running it on the corpus first
    and this on each increment equals one :func:`line_dedup` over
    corpus+batch, restricted to the batch rows.
    """
    corpus_keys = (
        split_lines(corpus, text_col, id_col)
        .where(F.col("line_key").isNotNull())
        .select("line_key")
        .distinct()
    )
    lines = split_lines(batch, text_col, id_col)
    fresh = lines.where(F.col("line_key").isNotNull()).join(
        corpus_keys, "line_key", "left_anti"
    )
    firsts = fresh.groupBy("line_key").agg(
        F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("first")
    )
    kept_keyed = (
        fresh.join(firsts, "line_key")
        .where(
            (F.col(id_col) == F.col("first")[id_col])
            & (F.col("line_no") == F.col("first.line_no"))
        )
        .select(id_col, "line_no", "line")
    )
    blanks = lines.where(F.col("line_key").isNull()).select(
        id_col, "line_no", "line"
    )
    n_lines = (
        F.size(F.split(F.col(text_col), "\n")).cast("int").alias("n_lines")
    )
    doc_ids = batch.select(F.col(id_col), n_lines)
    return _reassemble(kept_keyed.unionByName(blanks), doc_ids, id_col)


def line_doc_frequency(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-line document frequency: ``(line_key, line_norm, n_docs,
    n_occurrences)`` for every distinct non-blank normalized line.

    ``n_docs`` counts distinct documents containing the line (the C4
    boilerplate signal); ``n_occurrences`` counts total appearances.
    ``line_norm`` is the normalized text itself (deterministic — every
    occurrence normalizes to the same bytes), kept for reporting.
    """
    lines = split_lines(df, text_col, id_col).where(
        F.col("line_key").isNotNull()
    )
    return lines.groupBy("line_key").agg(
        F.min(_norm(F.col("line"))).alias("line_norm"),
        F.countDistinct(F.col(id_col)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


def strip_boilerplate(
    df: DataFrame,
    min_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every occurrence of lines that appear in ``min_docs`` or
    more distinct documents (C4's boilerplate rule with an absolute
    threshold; divide by the corpus doc count for a fraction rule).

    Unlike :func:`line_dedup` this removes ALL occurrences — a cookie
    banner is noise in its first document too. Returns one row per
    input doc: ``(id, text_kept, n_lines, n_lines_kept)``.
    """
    lines = split_lines(df, text_col, id_col)
    hot = (
        lines.where(F.col("line_key").isNotNull())
        .groupBy("line_key")
        .agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("line_key")
    )
    kept = lines.join(hot, "line_key", "left_anti").select(
        id_col, "line_no", "line"
    )
    n_lines = (
        F.size(F.split(F.col(text_col), "\n")).cast("int").alias("n_lines")
    )
    doc_ids = df.select(F.col(id_col), n_lines)
    return _reassemble(kept, doc_ids, id_col)
