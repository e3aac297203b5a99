"""URL / domain analytics over document text — the provenance stage of
web-corpus curation (C4 and RefinedWeb gate pages on their source
domain: blocklists, per-domain caps, domain-frequency audits).

Reference scope note: the reference engine has no text-curation surface;
this module is part of the LLM-data-pipeline families this repo adds
beyond reference parity.

Design for 100 TB:

* URL extraction is one `regexp_extract_all` under codegen (the pattern
  is confined to the Java-regex ∩ RE2 subset so DuckDB oracles
  reproduce every match); domains are lowercased capture groups —
  map-only until the explode.
* `domain_stats` shuffles once on the domain key with partial
  aggregation (map-side combine absorbs the hot domains that make this
  distribution Zipfian).
* `domain_blocklist_filter` keeps the blocklist driver-side as ONE
  lowercased literal `isin`-style predicate when it is small (the
  normal case: blocklists are thousands of entries, not millions), so
  the filter runs scan-side with zero shuffle. Suffix matching covers
  subdomains: `ads.tracker.example` is blocked by `tracker.example`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["URL_PATTERN", "extract_domains", "domain_stats",
           "domain_blocklist_filter"]

# Group 1 captures the host. No lookaround, no lazy quantifiers —
# identical semantics in java.util.regex and RE2 (DuckDB).
URL_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_domains(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``domains``: the lowercased host of every URL in the text,
    in order of appearance (duplicates preserved — callers decide
    whether occurrences or distinct hosts matter)."""
    return df.withColumn(
        "domains",
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 1),
            F.lower,
        ),
    )


def domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain audit: ``(domain, n_docs, n_urls)`` — distinct
    documents linking to the domain and total URL occurrences. The
    report curators read before writing blocklists or per-domain caps."""
    ex = extract_domains(df, text_col).select(
        F.col(id_col), F.explode("domains").alias("domain")
    )
    return ex.groupBy("domain").agg(
        F.countDistinct(F.col(id_col)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
    )


def _blocked_expr(domain: Column, blocked: list[str]) -> Column:
    """True when ``domain`` equals a blocked entry or is a subdomain of
    one. Pure literal predicate — evaluates scan-side."""
    hit = F.lit(False)
    for b in sorted({d.lower() for d in blocked}):
        hit = hit | (domain == b) | domain.endswith("." + b)
    return hit


def domain_blocklist_filter(
    df: DataFrame,
    blocked: list[str],
    text_col: str = "text",
    keep_flagged: bool = False,
) -> DataFrame:
    """Drop documents that link to any blocked domain (subdomains
    included) — the C4/RefinedWeb URL-filter stage. With
    ``keep_flagged=True`` returns all docs with a ``blocked_domain``
    flag instead of filtering (the audit variant).

    The blocklist becomes one literal boolean expression over the
    extracted domain array (`exists`), so the whole filter is map-only:
    no join, no shuffle, pushdown-friendly.
    """
    flagged = extract_domains(df, text_col).withColumn(
        "blocked_domain",
        F.exists("domains", lambda d: _blocked_expr(d, blocked)).cast(
            "int"
        ),
    ).drop("domains")
    if keep_flagged:
        return flagged
    return flagged.where(F.col("blocked_domain") == 0).drop(
        "blocked_domain"
    )
