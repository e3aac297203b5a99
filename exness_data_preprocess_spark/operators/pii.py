"""PII detection and redaction — the privacy-scrub stage of a training
corpus pipeline (the step pipelines like C4/RefinedWeb/Dolma run between
quality filtering and dedup).

Reference scope note: the reference engine has no PII stage; this module
is part of the LLM-data-pipeline surface this repo adds beyond
reference parity (SURVEY.md §2 "beyond the reference" families), in the
same spirit as ``operators/textstats.clean_text``.

Design for 100 TB:

* Pure column expressions — ``regexp_count`` / ``regexp_replace`` are
  JVM-side and stay inside whole-stage codegen; no Python UDFs, no
  shuffle (the scan partitioning is preserved; redaction is map-only).
* Patterns are confined to the regex subset Java regex and RE2/DuckDB
  interpret identically (no lookaround, no backreferences, no lazy
  quantifiers), so the DuckDB oracles reproduce every count and every
  redacted byte exactly.
* Redaction order is load-bearing and mirrored by the oracle: emails
  first (an email is consumed atomically, so digit runs inside its
  local part — e.g. ``123-45-6789@corp.example.org`` — cannot seed the
  later numeric patterns), then IPv4, then SSN-shaped ids (3-2-4, more
  specific than phones), then phones (3-3-4). The four patterns are
  mutually non-overlapping after that ordering, so per-kind counts
  taken BEFORE redaction equal the tokens inserted BY redaction. An
  IP-literal mail domain (``root@10.11.12.13``) is not an email match
  (alphabetic TLD required) — its quad is still scrubbed, as ``<IP>``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement token) in redaction order. Patterns use
# only \d, \b, literal classes and bounded repetition — identical
# semantics in java.util.regex and RE2 (DuckDB).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)


def pii_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts: one ``n_<kind>`` column per pattern plus
    the total ``n_pii``. Counts are taken on the raw text in the same
    order the redactor consumes matches, so ``n_pii`` equals the number
    of replacement tokens :func:`redact_pii` inserts.

    Counting masks each pattern's matches before counting the next
    (cheap chained ``regexp_replace`` on a throwaway expression), which
    makes the per-kind counts disjoint — an SSN inside an already
    counted phone-shaped string is not double-counted.
    """
    masked: Column = F.col(text_col)
    out = df
    total: Column | None = None
    for kind, pat, _tok in PII_PATTERNS:
        c = F.regexp_count(masked, F.lit(pat))
        out = out.withColumn(f"n_{kind}", c)
        total = c if total is None else total + c
        masked = F.regexp_replace(masked, pat, " ")
    return out.withColumn("n_pii", total)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """Replace every PII match with its typed token (``<EMAIL>``,
    ``<IP>``, ``<ID>``, ``<PHONE>``) and record ``n_pii_redacted``.
    Map-only; the input partitioning is preserved.
    """
    redacted: Column = F.col(text_col)
    total: Column | None = None
    masked: Column = F.col(text_col)
    for kind, pat, tok in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, tok)
        c = F.regexp_count(masked, F.lit(pat))
        total = c if total is None else total + c
        masked = F.regexp_replace(masked, pat, " ")
    return df.withColumn(out_col, redacted).withColumn(
        "n_pii_redacted", total
    )


def pii_report(
    df: DataFrame,
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Per-group PII audit rollup: doc counts, docs containing any PII,
    and per-kind totals. One partial-aggregated shuffle on the
    (low-cardinality) group key — the reporting shape every privacy
    review asks for before a corpus ships.
    """
    feats = pii_features(df, text_col)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_pii") > 0, 1).otherwise(0)).alias(
            "docs_with_pii"
        ),
        F.sum("n_pii").alias("total_pii"),
    ]
    aggs += [
        F.sum(f"n_{kind}").alias(f"total_{kind}")
        for kind, _p, _t in PII_PATTERNS
    ]
    return feats.groupBy(*[F.col(c) for c in group_cols]).agg(*aggs)
