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

__all__ = ["URL_PATTERN", "FULL_URL_PATTERN", "extract_domains",
           "domain_stats", "domain_blocklist_filter", "normalize_url",
           "url_dedup", "TRACKING_PARAM_PATTERN"]

# Group 1 captures the host; the optional non-capturing prefix skips a
# userinfo component (advisor find: without it, 'https://foo@evil.example'
# captured 'foo' and the blocked host was never seen — a trivial
# blocklist bypass). Underscores are accepted in hostnames (seen in the
# wild despite RFC 952). No lookaround, no lazy quantifiers — identical
# semantics in java.util.regex and RE2 (DuckDB).
URL_PATTERN = r"https?://(?:[^/@\s]*@)?([A-Za-z0-9._-]+)"


# Whole-URL variant of URL_PATTERN (group 0 = the full URL up to
# whitespace / angle bracket / double quote). Same Java∩RE2 discipline;
# (?i) catches uppercase schemes (HTTPS://…) — an inline flag both
# engines support identically.
FULL_URL_PATTERN = r'(?i)https?://[^\s<>"]+'

# Query parameters that never identify content — the strip list CC-style
# pipelines apply before URL-keyed dedup (utm_* campaign tags plus the
# big ad-click ids). Anchored to the parameter NAME position by the
# split-param normalization below, not by regex context.
TRACKING_PARAM_PATTERN = r"^(utm_[a-z0-9_]+|gclid|fbclid|msclkid)="


def normalize_url(url: Column) -> Column:
    """Canonical form of one URL for identity comparison:

    * fragment dropped; trailing prose punctuation ``).,;:!`` dropped
    * scheme+host lowercased (path case preserved — it is significant),
      a leading ``www.`` label dropped, trailing ``/`` on the path
      dropped
    * query string split on ``&``; tracking parameters
      (:data:`TRACKING_PARAM_PATTERN`) removed; survivors SORTED and
      re-joined — parameter order never distinguishes two URLs

    Pure column expressions (split / filter / array_sort / array_join /
    regexp ops), map-only under codegen; every regex stays in the
    Java ∩ RE2 subset with no backreference replacements, so a DuckDB
    oracle reproduces the normalization byte-for-byte.
    """
    u = F.regexp_replace(url, r"[).,;:!]+$", "")
    base = F.regexp_replace(u, r"[?#].*", "")
    head = F.regexp_replace(
        F.lower(F.regexp_extract(base, r"^(?i)https?://[^/]*", 0)),
        r"://www\.",
        "://",
    )
    path = F.regexp_replace(
        F.regexp_extract(base, r"^(?i)https?://[^/]*(.*)", 1), r"/+$", ""
    )
    params = F.filter(
        F.split(F.regexp_extract(u, r"\?([^#]*)", 1), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_PATTERN),
    )
    query = F.array_join(F.array_sort(params), "&")
    # strip trailing prose punctuation AGAIN on the canonical form: the
    # first strip runs before fragment/query removal, so punctuation
    # masked by a dropped component ('https://x.#frag' → 'https://x.')
    # would otherwise survive one pass and vanish on the next —
    # canonical forms must be fixed points (hypothesis-found case,
    # idempotence pinned in tests/test_pipeline_property.py)
    return F.regexp_replace(
        F.concat(
            head,
            path,
            F.when(query == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), query)
            ),
        ),
        r"[).,;:!]+$",
        "",
    )


def url_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """URL-keyed keep-first document dedup — the Common-Crawl front door
    (dedup by canonical source URL before any content pass).

    Each document's FIRST URL, normalized by :func:`normalize_url`, is
    its identity key; documents with no URL have no key and always pass.
    Output: ``(doc_id, url_norm, n_url_dupes)`` — the kept (minimum-id)
    document of every URL group with the group size, plus every keyless
    document with ``n_url_dupes = 1``.

    Scale shape: one map-only extract+normalize pass, then ONE
    partial-aggregable shuffle on the URL key (``min(id), count``) —
    the same digest-groupBy shape as exact dedup; no window, no join,
    no skew risk beyond the key histogram itself (hot canonical URLs
    combine map-side)."""
    keyed = df.select(
        F.col(id_col),
        F.when(
            F.regexp_extract(F.col(text_col), FULL_URL_PATTERN, 0) == "",
            F.lit(None),
        )
        .otherwise(
            normalize_url(
                F.regexp_extract(F.col(text_col), FULL_URL_PATTERN, 0)
            )
        )
        .alias("url_norm"),
    )
    kept = (
        keyed.where(F.col("url_norm").isNotNull())
        .groupBy("url_norm")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_url_dupes"),
        )
        .select(id_col, "url_norm", "n_url_dupes")
    )
    keyless = keyed.where(F.col("url_norm").isNull()).select(
        id_col, "url_norm", F.lit(1).cast("long").alias("n_url_dupes")
    )
    return kept.unionByName(keyless)


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


#: above this many blocklist entries the literal predicate is replaced
#: by a broadcast join (advisor find: a chained boolean expression with
#: thousands of comparisons can exceed whole-stage-codegen limits and
#: costs O(entries x domains) per row; the join is O(labels) per domain)
BLOCKLIST_JOIN_THRESHOLD = 256


def _blocked_expr(domain: Column, blocked: list[str]) -> Column:
    """True when ``domain`` equals a blocked entry or is a subdomain of
    one. Pure literal predicate — evaluates scan-side. Small-list path
    only; see :func:`_flag_blocked_via_join` for large lists."""
    hit = F.lit(False)
    for b in sorted({d.lower() for d in blocked}):
        hit = hit | (domain == b) | domain.endswith("." + b)
    return hit


def _domain_suffixes(domain: Column) -> Column:
    """All dot-suffixes of a host, longest first: ``a.b.c`` →
    ``[a.b.c, b.c, c]`` — suffix-match against a blocklist becomes an
    equi-join on these (bounded by the label count, ≤127 by RFC)."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(
            F.slice(parts, i, n - i + F.lit(1)), "."
        ),
    )


def _flag_blocked_via_join(
    flagged_base: DataFrame, blocked: list[str], id_cols: list[str]
) -> DataFrame:
    """Large-blocklist path: explode each doc's domain suffixes and
    broadcast-equi-join the deduped blocklist — O(labels) candidate
    rows per domain instead of O(entries) comparisons, and the hot
    (Zipfian) domains hash across the join's partitions. Returns the
    input columns plus ``blocked_domain``."""
    spark = flagged_base.sparkSession
    bl = F.broadcast(
        spark.createDataFrame(
            [(b,) for b in sorted({d.lower() for d in blocked})],
            ["_blocked_entry"],
        )
    )
    hits = (
        flagged_base.select(
            *id_cols, F.explode_outer("domains").alias("_dom")
        )
        .select(
            *id_cols,
            F.explode_outer(_domain_suffixes(F.col("_dom"))).alias(
                "_suf"
            ),
        )
        .join(bl, F.col("_suf") == F.col("_blocked_entry"), "left")
        .groupBy(*id_cols)
        .agg(
            F.max(
                F.when(F.col("_blocked_entry").isNotNull(), 1).otherwise(0)
            ).alias("blocked_domain")
        )
    )
    return flagged_base.drop("domains").join(hits, id_cols)


def domain_blocklist_filter(
    df: DataFrame,
    blocked: list[str],
    text_col: str = "text",
    keep_flagged: bool = False,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Drop documents that link to any blocked domain (subdomains
    included) — the C4/RefinedWeb URL-filter stage. With
    ``keep_flagged=True`` returns all docs with a ``blocked_domain``
    flag instead of filtering (the audit variant).

    Small blocklists (≤ :data:`BLOCKLIST_JOIN_THRESHOLD` entries)
    become one literal boolean expression over the extracted domain
    array (`exists`) — map-only, no join, no shuffle, pushdown-
    friendly. Larger lists switch to a broadcast equi-join on the
    domain's dot-suffixes (``id_cols`` names the doc key for the
    flag regroup, default ``["doc_id"]``) — a chained literal
    predicate at that size would fall out of whole-stage codegen and
    cost O(entries) per extracted domain.
    """
    flagged_base = extract_domains(df, text_col)
    if len({d.lower() for d in blocked}) > BLOCKLIST_JOIN_THRESHOLD:
        flagged = _flag_blocked_via_join(
            flagged_base, blocked, id_cols or ["doc_id"]
        )
    else:
        flagged = flagged_base.withColumn(
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


def incremental_url_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest-time URL dedup gate: admit a new batch against an existing
    corpus by canonical URL (the Common-Crawl snapshot-over-snapshot
    shape). Returns every batch document with its decision:

    * ``kept`` — no URL, or first holder of a URL unseen in the corpus
    * ``corpus_dup`` — canonical URL already in the corpus
    * ``batch_dup`` — loses the batch-internal keep-first (min id)

    Scale shape: the corpus reduces to its DISTINCT canonical-URL key
    set before anything joins — never a corpus self-join, never corpus
    row payloads through the shuffle (the `incremental_line_dedup`
    contract). One batch key aggregation + two keyed equi-joins, all
    partial-aggregable / AQE-broadcastable when the batch is small.
    """

    def _keyed(df: DataFrame) -> DataFrame:
        first = F.regexp_extract(F.col(text_col), FULL_URL_PATTERN, 0)
        return df.select(
            F.col(id_col),
            F.when(first == "", F.lit(None))
            .otherwise(normalize_url(first))
            .alias("url_norm"),
        )

    bk = _keyed(batch)
    corpus_keys = (
        _keyed(corpus)
        .where(F.col("url_norm").isNotNull())
        .select("url_norm")
        .distinct()
        .withColumn("_in_corpus", F.lit(1))
    )
    first_ids = (
        bk.where(F.col("url_norm").isNotNull())
        .groupBy("url_norm")
        .agg(F.min(id_col).alias("_first_id"))
    )
    return (
        bk.join(corpus_keys, "url_norm", "left")
        .join(first_ids, "url_norm", "left")
        .select(
            id_col,
            "url_norm",
            F.when(F.col("url_norm").isNull(), "kept")
            .when(F.col("_in_corpus") == 1, "corpus_dup")
            .when(F.col(id_col) == F.col("_first_id"), "kept")
            .otherwise("batch_dup")
            .alias("status"),
        )
    )
