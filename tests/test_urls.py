"""URL/domain analytics (operators/urls.py) and weighted sampling
(textstats.weighted_sample).

Semantics pinned here: host extraction + lowercasing, subdomain suffix
matching (blocked `tracker.example` catches `ads.tracker.example` but
NOT `nottracker.example`), docs without URLs never blocked, the map-only
plan shape of the blocklist filter, and A-ES invariants (determinism,
exact k, weight monotonicity, zero/NULL weights excluded).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from exness_data_preprocess_spark.operators.textstats import weighted_sample
from exness_data_preprocess_spark.operators.urls import (
    domain_blocklist_filter,
    domain_stats,
    extract_domains,
)


def _docs(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


def test_extract_domains_lowercases_and_keeps_order(spark):
    out = extract_domains(
        _docs(spark, "a https://News.Example.COM/x b http://cdn.example.net/y")
    ).collect()[0]
    assert out["domains"] == ["news.example.com", "cdn.example.net"]


def test_domain_stats_counts_docs_vs_urls(spark):
    docs = _docs(
        spark,
        "https://a.example/1 and https://a.example/2",
        "https://a.example/3",
        "https://b.example/",
        "no links here",
    )
    stats = {r["domain"]: (r["n_docs"], r["n_urls"])
             for r in domain_stats(docs).collect()}
    assert stats["a.example"] == (2, 3)
    assert stats["b.example"] == (1, 1)


def test_blocklist_suffix_matches_subdomains_only(spark):
    docs = _docs(
        spark,
        "x https://tracker.example/p",        # exact
        "x https://ads.tracker.example/p",    # subdomain
        "x https://nottracker.example/p",     # NOT a subdomain
        "x https://clean.example/p",
        "no urls",
    )
    kept = {r["doc_id"] for r in
            domain_blocklist_filter(docs, ["tracker.example"]).collect()}
    assert kept == {2, 3, 4}
    flags = {r["doc_id"]: r["blocked_domain"] for r in
             domain_blocklist_filter(
                 docs, ["Tracker.Example"], keep_flagged=True
             ).collect()}
    assert flags == {0: 1, 1: 1, 2: 0, 3: 0, 4: 0}  # blocklist lowercased


def test_blocklist_filter_is_map_only(spark):
    plan = (
        domain_blocklist_filter(_docs(spark, "a"), ["x.example"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan


def _weighted(spark):
    # ids 0..199, weight 1 for even ids, 50 for odd ids
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 1, F.lit(50.0)).otherwise(1.0).alias("w"),
    )


def test_weighted_sample_exact_k_and_deterministic(spark):
    a = weighted_sample(_weighted(spark), 30, "w")
    b = weighted_sample(_weighted(spark), 30, "w")
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert len(ids_a) == 30 and ids_a == ids_b


def test_weighted_sample_prefers_heavy_rows(spark):
    ids = [r["doc_id"] for r in
           weighted_sample(_weighted(spark), 30, "w").collect()]
    n_heavy = sum(1 for i in ids if i % 2 == 1)
    # 100 heavy (w=50) vs 100 light (w=1): the sample should be
    # overwhelmingly heavy; a uniform sampler would give ~15.
    assert n_heavy >= 25


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
        "doc_id long, w double",
    )
    ids = sorted(r["doc_id"] for r in weighted_sample(df, 10, "w").collect())
    assert ids == [1, 5]


def test_weighted_sample_plan_is_bounded_topk_not_global_sort(spark):
    """orderBy().limit(k) must compile to TakeOrderedAndProject —
    per-partition bounded heaps — not a full Sort of the corpus."""
    plan = (
        weighted_sample(_weighted(spark), 30, "w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_weighted_sample_seed_changes_selection(spark):
    base = _weighted(spark)
    a = {r["doc_id"] for r in weighted_sample(base, 30, "w").collect()}
    b = {r["doc_id"] for r in
         weighted_sample(base, 30, "w", seed="other-seed").collect()}
    assert a != b


def test_userinfo_component_does_not_hide_the_host(spark):
    """Advisor find: 'https://foo@tracker.example/x' must extract the
    HOST, not the userinfo — otherwise a trivial blocklist bypass.
    Underscore hostnames are also accepted."""
    out = extract_domains(
        _docs(
            spark,
            "a https://foo@tracker.example/x b http://u:p@evil.example/y "
            "c https://some_host.example/z",
        )
    ).collect()[0]
    assert out["domains"] == [
        "tracker.example", "evil.example", "some_host.example",
    ]
    flags = {r["doc_id"]: r["blocked_domain"] for r in
             domain_blocklist_filter(
                 _docs(spark, "see https://x@ads.tracker.example/p"),
                 ["tracker.example"], keep_flagged=True,
             ).collect()}
    assert flags == {0: 1}


def test_large_blocklist_switches_to_broadcast_join(spark):
    """Above BLOCKLIST_JOIN_THRESHOLD entries the literal predicate is
    replaced by a broadcast suffix-set join; flags must be identical to
    the literal path on the same docs (incl. no-URL and multi-URL)."""
    from exness_data_preprocess_spark.operators.urls import (
        BLOCKLIST_JOIN_THRESHOLD,
    )

    docs = _docs(
        spark,
        "x https://tracker.example/p",
        "x https://ads.tracker.example/p and https://ok.example/q",
        "x https://nottracker.example/p",
        "no urls",
        "x https://blocked50.example/z",
    )
    big = ["tracker.example"] + [
        f"blocked{i}.example" for i in range(BLOCKLIST_JOIN_THRESHOLD + 10)
    ]
    joined = domain_blocklist_filter(docs, big, keep_flagged=True)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    small_equiv = domain_blocklist_filter(
        docs, ["tracker.example", "blocked50.example"], keep_flagged=True
    )
    cols = ["doc_id", "blocked_domain"]
    assert (
        joined.select(cols).orderBy("doc_id").collect()
        == small_equiv.select(cols).orderBy("doc_id").collect()
    )
    # filter variant drops the same docs
    kept = {r["doc_id"] for r in domain_blocklist_filter(docs, big).collect()}
    assert kept == {2, 3}


def test_weighted_sample_nan_weight_cannot_hijack(spark):
    """Advisor find: NaN > 0 is TRUE under Spark's ordering, and
    ln(u)/NaN = NaN sorts first under desc — a NaN weight must be
    excluded like NULL/non-positive ones."""
    df = spark.createDataFrame(
        [(1, 5.0), (2, float("nan")), (3, 2.0)],
        "doc_id long, w double",
    )
    ids = sorted(r["doc_id"] for r in weighted_sample(df, 10, "w").collect())
    assert ids == [1, 3]


def test_normalize_url_canonical_rules(spark):
    """Each normalization rule pinned on a literal: case of scheme+host
    (not path), www label, trailing slash, fragment, tracking params,
    param sorting, trailing prose punctuation."""
    from exness_data_preprocess_spark.operators.urls import normalize_url

    cases = [
        ("HTTPS://Example.COM/Path/", "https://example.com/Path"),
        ("https://www.example.com/a", "https://example.com/a"),
        ("https://example.com/a#frag", "https://example.com/a"),
        ("https://example.com/a?utm_source=x&utm_medium=y",
         "https://example.com/a"),
        ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
        ("https://example.com/a?gclid=1&z=9&fbclid=2",
         "https://example.com/a?z=9"),
        ("https://example.com/a).,", "https://example.com/a"),
        ("https://example.com", "https://example.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["n"] for r in
           df.select(normalize_url(F.col("u")).alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_url_dedup_keep_first_and_keyless_passthrough(spark):
    from exness_data_preprocess_spark.operators.urls import url_dedup

    docs = _docs(
        spark,
        "see https://Example.com/x?utm_source=a",   # 0 ┐ same canonical
        "see https://www.example.com/x/",           # 1 ┘ keep doc 0
        "see https://example.com/y",                # 2 unique
        "no links here at all",                     # 3 keyless
        "also nothing",                             # 4 keyless
    )
    out = {r["doc_id"]: (r["url_norm"], r["n_url_dupes"])
           for r in url_dedup(docs).collect()}
    assert set(out) == {0, 2, 3, 4}  # doc 1 deduped away
    assert out[0] == ("https://example.com/x", 2)
    assert out[2] == ("https://example.com/y", 1)
    assert out[3][0] is None and out[3][1] == 1


def test_incremental_url_dedup_statuses(spark):
    """kept / corpus_dup / batch_dup decisions pinned by hand, keyless
    docs always kept."""
    from exness_data_preprocess_spark.operators.urls import (
        incremental_url_dedup,
    )

    corpus = _docs(spark, "see https://example.com/a", "plain text")
    batch = spark.createDataFrame(
        [
            (10, "see https://www.example.com/a/"),  # corpus dup (normed)
            (11, "see https://example.com/b"),       # first of b → kept
            (12, "see https://example.com/b?utm_source=x"),  # batch dup
            (13, "no url"),                          # keyless → kept
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"]
           for r in incremental_url_dedup(batch, corpus).collect()}
    assert out == {10: "corpus_dup", 11: "kept",
                   12: "batch_dup", 13: "kept"}
