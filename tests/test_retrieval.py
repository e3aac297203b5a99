"""operators/retrieval.py: BM25 top-k and per-group TF-IDF keywords."""

from __future__ import annotations

import math

import pytest

from exness_data_preprocess_spark.operators.retrieval import (
    bm25_topk,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join spark spark", "a"),
            (2, "spark join", "a"),
            (3, "cat dog fish", "b"),
            (4, "cat cat dog dog bird bird", "b"),
        ],
        "doc_id long, text string, source string",
    )


def test_bm25_ranks_matching_docs_first(docs):
    out = bm25_topk(docs, ["spark"], k=4).collect()
    ids = [r["doc_id"] for r in out]
    # only docs containing the term are scored at all
    assert set(ids) == {1, 2}
    # doc 1 has tf=3 vs doc 2 tf=1 and similar length → doc 1 ranks first
    assert ids[0] == 1
    assert out[0]["bm25"] > out[1]["bm25"] > 0
    assert out[0]["n_terms"] == 1


def test_bm25_multi_term_sums_and_k_cut(docs):
    out = bm25_topk(docs, ["spark", "cat"], k=1).collect()
    assert len(out) == 1  # top-k cut applies after scoring


def test_tfidf_zero_for_ubiquitous_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "common alpha alpha", "x"),
            (2, "common beta beta", "y"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["source"], r["term"]): r
        for r in tfidf_top_terms(df, k=5, min_tf=1).collect()
    }
    # "common" appears in both groups → idf = ln(1) = 0 exactly
    assert out[("x", "common")]["score"] == 0.0
    # group-specific terms: tf=2, idf=ln(2)
    assert out[("x", "alpha")]["score"] == pytest.approx(
        round(2 * math.log(2), 6)
    )
    # distinctive term outranks the ubiquitous one
    assert out[("x", "alpha")]["rank"] < out[("x", "common")]["rank"]


def test_tfidf_rank_window_bounded(docs):
    out = tfidf_top_terms(docs, k=2, min_tf=1).collect()
    per_group = {}
    for r in out:
        per_group.setdefault(r["source"], []).append(r["rank"])
    for ranks in per_group.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 2


def test_retrieval_leaves_no_cached_partitions(spark, docs):
    """Both queries are single self-contained plans: a long-lived
    session (bench loop, registry driver) must not accumulate cached
    RDDs across repeated calls."""
    # Delta-based: other operator families (dedup pair-mining) persist
    # shared intermediates by design and the session fixture is
    # module-scoped, so assert retrieval *adds* nothing rather than that
    # the whole session is cache-free.
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for _ in range(2):
        bm25_topk(docs, ["spark", "cat"], k=4).collect()
        tfidf_top_terms(docs, k=3, min_tf=1).collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before


def test_tfidf_gdf_counts_groups_below_min_tf(spark):
    """A term rare in one group (tf < min_tf) still counts toward that
    term's group frequency — the window runs before the filter."""
    df = spark.createDataFrame(
        [
            (1, "shared shared alpha", "x"),
            (2, "shared beta beta", "y"),  # tf(shared,y)=1 < min_tf=2
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["source"], r["term"]): r
        for r in tfidf_top_terms(df, k=5, min_tf=2).collect()
    }
    # shared survives min_tf only in x, but its gdf=2 → idf=ln(2/2)=0
    assert out[("x", "shared")]["score"] == 0.0
    assert ("y", "shared") not in out


def test_rrf_fuse_known_ranks_and_missing_leg(spark):
    """RRF arithmetic pinned by hand: ids ranked by both legs sum two
    reciprocal terms; ids in one leg get exactly one; ordering breaks
    rrf ties on id asc; limit applies after fusion."""
    from exness_data_preprocess_spark.operators.retrieval import rrf_fuse

    leg_a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    leg_b = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "doc_id long, score double"
    )
    out = rrf_fuse([leg_a, leg_b], k0=60, k=10).collect()
    got = {r["doc_id"]: (r["rank_0"], r["rank_1"], r["rrf"]) for r in out}
    assert got[2] == (2, 1, round(1 / 62 + 1 / 61, 6))  # both legs, tops
    assert got[1] == (1, None, round(1 / 61, 6))
    assert got[4] == (None, 2, round(1 / 62, 6))
    assert got[3] == (3, None, round(1 / 63, 6))
    # doc 1 and doc 4 tie at... they don't: 1/61 > 1/62; full order:
    assert [r["doc_id"] for r in out] == [2, 1, 4, 3]


def test_rrf_fuse_limit_and_tie_break_on_id(spark):
    from exness_data_preprocess_spark.operators.retrieval import rrf_fuse

    leg_a = spark.createDataFrame(
        [(7, 1.0), (5, 2.0)], "doc_id long, score double"
    )
    leg_b = spark.createDataFrame(
        [(9, 3.0), (8, 4.0)], "doc_id long, score double"
    )
    out = rrf_fuse([leg_a, leg_b], k0=60, k=2).collect()
    # rank-1 of each leg ties at 1/61 → id asc: 5 before 8
    assert [r["doc_id"] for r in out] == [5, 8]


def test_rrf_fuse_batched_per_query_isolation(spark):
    """query_col mode: each query's legs fuse independently — ranks,
    sums, and the top-k never leak across queries."""
    from exness_data_preprocess_spark.operators.retrieval import rrf_fuse

    leg_a = spark.createDataFrame(
        [("q1", 1, 9.0), ("q1", 2, 5.0), ("q2", 2, 7.0)],
        "query_id string, doc_id long, score double",
    )
    leg_b = spark.createDataFrame(
        [("q1", 2, 0.9), ("q2", 3, 0.8)],
        "query_id string, doc_id long, score double",
    )
    out = rrf_fuse(
        [leg_a, leg_b], k0=60, k=10, query_col="query_id"
    ).collect()
    got = {(r["query_id"], r["doc_id"]): (r["rank_0"], r["rank_1"], r["rrf"])
           for r in out}
    assert got[("q1", 2)] == (2, 1, round(1 / 62 + 1 / 61, 6))
    assert got[("q1", 1)] == (1, None, round(1 / 61, 6))
    # q2's doc 2 is its own rank 1 — q1's ranking must not bleed in
    assert got[("q2", 2)] == (1, None, round(1 / 61, 6))
    assert got[("q2", 3)] == (None, 1, round(1 / 61, 6))
    assert len(out) == 4
