"""Unit tests for the round-2 pipeline operators: connected components,
interval join, decontamination, rolling range windows, repetition features,
stratified sampling, and embedding quantization.

Plan-shape assertions live alongside semantics: the interval join must not
degrade to BroadcastNestedLoopJoin, and CC must converge on adversarial
chain graphs (the worst case for label propagation)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from exness_data_preprocess_spark.operators.graph import (
    best_docs_per_cluster,
    canonical_docs,
    connected_components,
)
from exness_data_preprocess_spark.operators.intervals import interval_join
from exness_data_preprocess_spark.operators.rolling import rolling_range_stats
from exness_data_preprocess_spark.operators.similarity import quantize_embeddings
from exness_data_preprocess_spark.operators.textstats import (
    blocklist_screen,
    decontaminate,
    repetition_features,
    shard_manifest,
    stratified_sample,
)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------
def _cc_dict(spark, edges, n_vertices):
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], "doc_id long")
    out = connected_components(e, v)
    return {r["doc_id"]: r["component"] for r in out.collect()}

def test_cc_chain_converges_to_min(spark):
    # 0-1-2-...-19 as a path: worst case for plain propagation; pointer
    # jumping must still converge well under max_iterations=25
    comp = _cc_dict(spark, [(i, i + 1) for i in range(19)], 20)
    assert set(comp.values()) == {0}


def test_cc_multiple_components_and_singletons(spark):
    edges = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 5)]
    comp = _cc_dict(spark, edges, 12)
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[5] == comp[6] == comp[8] == comp[9] == 5
    for singleton in (0, 4, 7, 10, 11):
        assert comp[singleton] == singleton


def test_cc_nonconvergence_raises(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
    v = spark.createDataFrame([(i,) for i in range(41)], "doc_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, v, max_iterations=1)


def test_canonical_docs_keeps_one_per_component(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 2), (4, 4), (5, 4)],
        "doc_id long, component long",
    )
    kept = sorted(r["doc_id"] for r in canonical_docs(docs, comp).collect())
    assert kept == [0, 2, 4]


# ---------------------------------------------------------------------------
# interval join
# ---------------------------------------------------------------------------
def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h) + dt.timedelta(minutes=m, seconds=s)


def test_interval_join_inner_matches_between(spark):
    pts = spark.createDataFrame(
        [(i, _ts(9, 0, i * 40)) for i in range(90)], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            (1, _ts(9, 0), _ts(9, 10)),
            (2, _ts(9, 5), _ts(9, 30)),  # overlaps interval 1
            (3, _ts(23, 0), _ts(23, 59)),  # matches nothing
        ],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    got = interval_join(pts, iv, bucket_seconds=300).collect()
    expect = [
        (p, i)
        for p in range(90)
        for (i, s, e) in [(1, _ts(9, 0), _ts(9, 10)), (2, _ts(9, 5), _ts(9, 30))]
        if s <= _ts(9, 0, p * 40) <= e
    ]
    assert sorted((r["pid"], r["iv_id"]) for r in got) == sorted(expect)


def test_interval_join_left_keeps_unmatched_points(spark):
    pts = spark.createDataFrame(
        [(1, _ts(9)), (2, _ts(12))], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(7, _ts(8), _ts(10))], "iv_id long, start_ts timestamp, end_ts timestamp"
    )
    rows = {r["pid"]: r["iv_id"] for r in interval_join(pts, iv, how="left").collect()}
    assert rows == {1: 7, 2: None}


def test_interval_join_plan_has_no_nested_loop(spark):
    pts = spark.createDataFrame([(1, _ts(9))], "pid long, ts timestamp")
    iv = spark.createDataFrame(
        [(7, _ts(8), _ts(10))], "iv_id long, start_ts timestamp, end_ts timestamp"
    )
    plan = interval_join(pts, iv)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# rolling range window
# ---------------------------------------------------------------------------
def test_rolling_range_stats_trailing_hour(spark):
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=30), 2.0),
        (1, base + dt.timedelta(minutes=61), 4.0),  # first row ages out
        (2, base, 10.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r["user_id"], r["ts"]): (r["w_cnt"], float(r["w_sum"]))
        for r in rolling_range_stats(df).collect()
    }
    assert out[(1, base)] == (1, 1.0)
    assert out[(1, base + dt.timedelta(minutes=30))] == (2, 3.0)
    assert out[(1, base + dt.timedelta(minutes=61))] == (2, 6.0)
    assert out[(2, base)] == (1, 10.0)


def test_rolling_bucketed_equals_frame_plan(spark):
    """The bucketed rendering (r8 skew fix: accumulate-only prefix/suffix
    windows + probe fill, no sliding frame) must be VALUE-identical to
    the frame-based plan — including the boundary cases: an event whose
    lower bound lands exactly on a bucket edge, peers at equal
    timestamps, windows spanning two buckets, and a key with a single
    event."""
    import random

    from exness_data_preprocess_spark.operators.rolling import (
        rolling_range_stats_bucketed,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        # window exactly at a bucket boundary (t multiple of 3600s)
        (1, base + dt.timedelta(hours=2), 5.0),
        (1, base + dt.timedelta(hours=1), 3.0),  # exactly t-3600 → inside
        # peers at an identical timestamp
        (1, base + dt.timedelta(minutes=90), 1.0),
        (1, base + dt.timedelta(minutes=90), 2.0),
        # cross-bucket trailing window
        (1, base + dt.timedelta(minutes=130), 7.0),
        # lone key
        (2, base + dt.timedelta(minutes=5), 11.0),
        # NULL timestamps: the frame plan treats them as one peer group;
        # the bucketed plan must not double-count them (review find —
        # their probe lands in their own NULL bucket and the fill would
        # hand the whole group back as a "suffix")
        (5, None, 1.0),
        (5, None, 2.0),
        (5, base, 4.0),
    ]
    rng = random.Random(42)
    for u in (3, 4):
        for _ in range(40):
            rows.append(
                (u, base + dt.timedelta(seconds=rng.randrange(0, 14400)),
                 round(rng.uniform(-5, 5), 2))
            )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    key = ["user_id", "ts", "value"]
    a = rolling_range_stats(df).orderBy(*key).toPandas()
    b = rolling_range_stats_bucketed(df).orderBy(*key)[a.columns.tolist()].toPandas()
    assert a.equals(b)
    # spot the boundary semantics: at t = base+2h the row at exactly
    # t-3600 (base+1h) is INSIDE the window, as are the 90-min peers
    r = {
        (x["user_id"], x["ts"]): (x["w_cnt"], float(x["w_sum"]))
        for x in rolling_range_stats_bucketed(df).collect()
    }
    assert r[(1, base + dt.timedelta(hours=2))] == (4, 11.0)
    assert r[(2, base + dt.timedelta(minutes=5))] == (1, 11.0)


def test_rolling_window_is_keyed_not_global(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "user_id long, ts timestamp, value double"
    )
    plan = rolling_range_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "user_id" in plan.split("Window")[1][:400]  # partition spec present


# ---------------------------------------------------------------------------
# text ops
# ---------------------------------------------------------------------------
def test_repetition_features_flags_repeated_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert out[1]["repetition_flag"] == 0
    assert out[1]["dup_token_ratio"] == 0.9
    assert out[1]["top_token_ratio"] == 1.0
    assert out[2]["repetition_flag"] == 1
    assert out[2]["dup_token_ratio"] == 0.0


def test_stratified_sample_deterministic_and_stratified(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(400)], "doc_id long, lang string"
    )
    rates = {"en": 0.25, "de": 1.0}
    a = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    assert a == b  # rerun-stable
    de = [i for i in a if i % 2 == 0]
    en = [i for i in a if i % 2 == 1]
    assert len(de) == 200  # rate 1.0 keeps everything
    assert 20 <= len(en) <= 80  # rate 0.25 of 200, hash-binomial spread


def test_decontaminate_flags_ngram_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta unrelated tail here"),  # 2 shared 3-grams
            (2, "totally different words with no overlap at all"),
            (3, "alpha beta gamma delta epsilon zeta plus suffix"),  # 4 shared
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, min_overlap=3).collect()}
    assert out[1]["overlap_ngrams"] == 2 and out[1]["contaminated"] == 0
    assert out[2]["overlap_ngrams"] == 0 and out[2]["contaminated"] == 0
    assert out[3]["overlap_ngrams"] == 4 and out[3]["contaminated"] == 1


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------
def test_quantize_embeddings_bounds_and_error(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [2.0, 2.0, -2.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # scale = max|x|/127; q of the max-magnitude element is ±127
    assert out[1]["q_scale"] == round(1.0 / 127, 6)
    assert out[2]["q_sumsq"] <= 4 * 127 * 127
    for r in out.values():
        assert r["max_abs_err"] <= r["q_scale"] / 2 + 1e-9


# ---------------------------------------------------------------------------
# sessionization & packing
# ---------------------------------------------------------------------------
def test_sessionize_splits_on_gap(spark):
    base = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (1, 1, base),
        (2, 1, base + dt.timedelta(minutes=10)),
        (3, 1, base + dt.timedelta(minutes=41)),   # 31 min gap → new session
        (4, 2, base),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    from exness_data_preprocess_spark.operators.sessionize import sessionize

    out = {r["event_id"]: r["session_seq"] for r in sessionize(df).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_gap_boundary_stays_in_session(spark):
    base = dt.datetime(2024, 5, 1, 9, 0, 0)
    df = spark.createDataFrame(
        [(1, 1, base), (2, 1, base + dt.timedelta(seconds=1800))],
        "event_id long, user_id long, ts timestamp",
    )
    from exness_data_preprocess_spark.operators.sessionize import sessionize

    out = {r["event_id"]: r["session_seq"] for r in sessionize(df).collect()}
    assert out == {1: 1, 2: 1}  # exactly-gap pause does not split


def test_pack_sequences_layout(spark):
    from exness_data_preprocess_spark.operators.textstats import pack_sequences

    df = spark.createDataFrame(
        [
            (1, "en", "a " * 300),   # 300 tokens (trailing split token counts)
            (2, "en", "b " * 300),
            (3, "en", "c " * 700),   # > budget → capped at 512
            (4, "de", "d " * 10),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=512).collect()}
    # doc1 starts pack 0 offset 0; its capped span is its token count
    assert (out[1]["pack_id"], out[1]["pack_offset"]) == (0, 0)
    n1 = out[1]["n_tokens"]
    assert (out[2]["pack_id"], out[2]["pack_offset"]) == (n1 // 512, n1 % 512)
    n2 = n1 + out[2]["n_tokens"]
    assert (out[3]["pack_id"], out[3]["pack_offset"]) == (n2 // 512, n2 % 512)
    assert (out[4]["pack_id"], out[4]["pack_offset"]) == (0, 0)  # own partition


# ---------------------------------------------------------------------------
# validation & statistics
# ---------------------------------------------------------------------------
def test_validate_ticks_counts_violations(spark):
    import datetime as dt

    rows = [
        ("EURUSD", dt.datetime(2024, 1, 1), 1.1, 1.1001),   # clean
        ("EURUSD", dt.datetime(2024, 1, 2), -1.0, 1.1),     # nonpositive bid
        ("EURUSD", dt.datetime(2024, 1, 3), 1.2, 1.1),      # inverted spread
        ("EURUSD", dt.datetime(2024, 1, 4), 1.0, 1.2),      # >10% spread
    ]
    df = spark.createDataFrame(
        rows, "instrument string, timestamp timestamp, bid double, ask double"
    )
    from exness_data_preprocess_spark.operators.validate import validate_ticks

    out = {r["rule"]: r["violations"] for r in validate_ticks(df).collect()}
    assert out["nonpositive_bid"] == 1
    assert out["inverted_spread"] == 1
    # rows 2 and 4: rules are independent — the negative-bid row also
    # trips the spread ceiling (2.1 > -0.1)
    assert out["unreasonable_spread"] == 2
    assert out["null_instrument"] == 0


def test_validate_is_single_aggregate_scan(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [("EURUSD", dt.datetime(2024, 1, 1), 1.1, 1.1001)],
        "instrument string, timestamp timestamp, bid double, ask double",
    )
    from exness_data_preprocess_spark.operators.validate import validate_ticks

    plan = validate_ticks(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial+final, one aggregate pair


def test_analyze_columns_ndv_close_to_exact(spark):
    df = spark.range(0, 10_000).withColumn("k", (F.col("id") % 137))
    from exness_data_preprocess_spark.operators.validate import analyze_columns

    out = {r["column"]: r for r in analyze_columns(df, ["k"]).collect()}
    assert out["k"]["null_count"] == 0
    assert abs(out["k"]["approx_ndv"] - 137) / 137 < 0.05
    assert out["k"]["min_value"] == "0" and out["k"]["max_value"] == "136"


def test_quality_percentile_filter_keeps_top_fraction_per_stratum(spark):
    from exness_data_preprocess_spark.operators.textstats import (
        quality_percentile_filter,
    )

    rows = [(i, "en" if i < 100 else "de", float(i)) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    kept = quality_percentile_filter(df, "score", keep_fraction=0.5).collect()
    en = sorted(r["doc_id"] for r in kept if r["lang"] == "en")
    de = sorted(r["doc_id"] for r in kept if r["lang"] == "de")
    # percent_rank = (rank-1)/(n-1) ≤ 0.5 keeps floor(0.5·(n-1))+1 rows
    assert len(en) == 50 and min(en) == 50   # top half of 0..99 by score
    assert len(de) == 25 and min(de) == 125  # top 25 of 100..149


def test_temperature_sample_upsamples_low_resource_strata(spark):
    """α=0.5 mixing keeps a larger FRACTION of small strata than big
    ones, rates cap at 1.0, and membership is re-run deterministic."""
    from exness_data_preprocess_spark.operators.textstats import (
        temperature_sample,
    )

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(
        df, alpha=0.5, target_fraction=0.5, stratum_col="lang"
    )
    kept = out.groupBy("lang").count().collect()
    frac = {r["lang"]: r["count"] / (900 if r["lang"] == "big" else 100) for r in kept}
    # smoothed shares: sqrt(900):sqrt(100) = 3:1 → small stratum's target
    # (0.5*1000*0.25=125) exceeds its size → rate caps at 1.0
    assert frac["small"] == 1.0
    # big stratum keeps 0.5*1000*0.75/900 ≈ 41.7% ± sampling noise
    assert 0.3 < frac["big"] < 0.55
    assert frac["small"] > frac["big"]
    # deterministic: identical row set on re-run
    again = temperature_sample(
        df, alpha=0.5, target_fraction=0.5, stratum_col="lang"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_chunk_documents_windows_and_tail(spark):
    """Chunk starts advance by chunk−overlap; a short doc yields one
    chunk; the tail window is short, never dropped or padded; overlap
    tokens repeat across adjacent chunks."""
    from exness_data_preprocess_spark.operators.textstats import (
        chunk_documents,
    )

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "solo")], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect()
    }
    # doc 1: 10 tokens, window 4, step 3 → starts 0,3,6 cover to 10 → 3 chunks
    assert {k for k in out if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert out[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert out[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"   # t3 overlaps
    assert out[(1, 2)]["chunk_text"] == "t6 t7 t8 t9"
    assert out[(1, 2)]["n_tokens"] == 4
    # doc 2: single short chunk, no padding
    assert out[(2, 0)]["chunk_text"] == "solo" and out[(2, 0)]["n_tokens"] == 1
    assert {k for k in out if k[0] == 2} == {(2, 0)}
    # short tail case: 11 tokens → starts 0,3,6,9; last has 2 tokens
    df2 = spark.createDataFrame(
        [(3, " ".join(f"x{i}" for i in range(11)))], "doc_id long, text string"
    )
    rows = chunk_documents(df2, chunk_tokens=4, overlap_tokens=1).collect()
    last = max(rows, key=lambda r: r["chunk_idx"])
    assert last["tok_start"] == 9 and last["n_tokens"] == 2
    assert last["chunk_text"] == "x9 x10"


def test_chunk_documents_rejects_bad_overlap(spark):
    from exness_data_preprocess_spark.operators.textstats import (
        chunk_documents,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


# ---------------------------------------------------------------------------
# dedup resolution: keep-best per cluster
# ---------------------------------------------------------------------------
def test_best_docs_per_cluster_picks_longest_with_tiebreak(spark):
    docs = spark.createDataFrame(
        [(0, 100), (1, 300), (2, 300), (3, 50), (4, 10)],
        "doc_id long, n_chars long",
    )
    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 4)],
        "doc_id long, component long",
    )
    rows = best_docs_per_cluster(docs, comp).collect()
    assert len(rows) == 1  # singletons have nothing to resolve
    r = rows[0]
    assert r["component"] == 0
    assert r["kept_doc_id"] == 1  # 300-char tie -> lowest id
    assert r["cluster_size"] == 3
    assert r["kept_n_chars"] == 300
    assert r["dropped_n_chars"] == 400


# ---------------------------------------------------------------------------
# blocklist screening
# ---------------------------------------------------------------------------
def test_blocklist_screen_actions(spark):
    docs = spark.createDataFrame(
        [(0, "clean words only"), (1, "bad one bad"), (2, "bad bad bad")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in blocklist_screen(docs, ["bad"], drop_threshold=3).collect()
    }
    assert out[0]["screen_action"] == "keep"
    assert out[0]["redacted_text"] == "clean words only"
    assert out[1]["screen_action"] == "redact"
    assert out[1]["redacted_text"] == "[REDACTED] one [REDACTED]"
    assert out[2]["screen_action"] == "drop"
    assert out[2]["redacted_text"] is None
    assert out[2]["n_blocklist_hits"] == 3


def test_blocklist_screen_whole_word_only(spark):
    docs = spark.createDataFrame(
        [(0, "badge bad badly")], "doc_id long, text string"
    )
    r = blocklist_screen(docs, ["bad"], drop_threshold=9).collect()[0]
    assert r["n_blocklist_hits"] == 1


def test_blocklist_screen_rejects_non_word_edge_terms(spark):
    """Advice find: \\b cannot anchor a non-word edge — a term like
    'c++' would be silently dead. The guard makes that mechanical."""
    docs = spark.createDataFrame([(0, "i know c++ well")], "doc_id long, text string")
    with pytest.raises(ValueError, match="word character"):
        blocklist_screen(docs, ["c++"], drop_threshold=9)
    with pytest.raises(ValueError, match="word character"):
        blocklist_screen(docs, ["ok", "-dash"], drop_threshold=9)
    # interior punctuation is fine — edges are word chars
    r = blocklist_screen(
        docs.withColumn("text", F.lit("use e.g. sparingly")),
        ["e.g"],
        drop_threshold=9,
    ).collect()[0]
    assert r["n_blocklist_hits"] == 1
    # and the escaping still makes the dot literal, not "any char"
    r2 = blocklist_screen(
        docs.withColumn("text", F.lit("egg exg")), ["e.g"], drop_threshold=9
    ).collect()[0]
    assert r2["n_blocklist_hits"] == 0


# ---------------------------------------------------------------------------
# training-shard manifest
# ---------------------------------------------------------------------------
def test_shard_manifest_partitioning_invariant_and_seeded(spark):
    docs = spark.createDataFrame(
        [(i, i * 3) for i in range(200)], "doc_id long, n_chars long"
    )
    a = {r["shard_id"]: r for r in shard_manifest(docs, n_shards=8).collect()}
    b = {
        r["shard_id"]: r
        for r in shard_manifest(docs.repartition(13), n_shards=8).collect()
    }
    assert a.keys() == b.keys()
    assert all(a[k] == b[k] for k in a)  # fingerprints survive repartition
    assert sum(r["n_docs"] for r in a.values()) == 200
    assert sum(r["total_chars"] for r in a.values()) == sum(
        i * 3 for i in range(200)
    )
    other = shard_manifest(docs, n_shards=8, seed="other-v1").collect()
    assert {r["ids_md5"] for r in other} != {r["ids_md5"] for r in a.values()}


# ---------------------------------------------------------------------------
# exact-k per-group sampling (bounded top-k)
# ---------------------------------------------------------------------------
def test_sample_k_per_group_quota_and_nesting(spark):
    from exness_data_preprocess_spark.operators.skew import sample_k_per_group

    rows = [(i, f"g{i % 3}") for i in range(99)] + [(1000, "rare")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    ten = sample_k_per_group(df, 10, ("lang",))
    counts = {r["lang"]: 0 for r in ten.collect()}
    got = ten.collect()
    for r in got:
        counts[r["lang"]] += 1
    assert counts == {"g0": 10, "g1": 10, "g2": 10, "rare": 1}
    # determinism under repartition
    again = sample_k_per_group(df.repartition(7), 10, ("lang",))
    assert sorted(map(tuple, got)) == sorted(map(tuple, again.collect()))
    # hash-rank nesting: the k=5 sample is a subset of the k=10 sample
    five = set(map(tuple, sample_k_per_group(df, 5, ("lang",)).collect()))
    assert five <= set(map(tuple, got))


def test_topk_per_group_bounded_matches_window(spark):
    from pyspark.sql import Window

    from exness_data_preprocess_spark.operators.skew import (
        topk_per_group_bounded,
    )

    rows = [(i, i % 4, (i * 37) % 101) for i in range(400)]
    df = spark.createDataFrame(rows, "rid long, grp long, score long")
    got = sorted(
        map(
            tuple,
            topk_per_group_bounded(
                df, ("grp",), ("score", "rid"), 7
            ).collect(),
        )
    )
    w = Window.partitionBy("grp").orderBy("score", "rid")
    want = sorted(
        map(
            tuple,
            df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 7)
            .select("grp", "score", "rid")
            .collect(),
        )
    )
    assert got == want


def test_probe_key_skew_and_when_to_salt(spark):
    """The adaptive-plan decision probe (judge r8 tasks 2/5): sampled
    max-key-share tracks the true share on uniform and hot inputs, and
    when_to_salt only fires when BOTH the share threshold and the
    absolute hot-row floor are crossed (the 1M-row skew bench's honest
    lesson: a small hot key does not melt anything under AQE)."""
    from exness_data_preprocess_spark.operators.skew import (
        probe_key_skew,
        when_to_salt,
    )

    uniform = spark.createDataFrame(
        [(i % 100, i) for i in range(2000)], "k long, v long"
    )
    hot = spark.createDataFrame(
        [(0 if i % 2 == 0 else i, i) for i in range(2000)],
        "k long, v long",
    )
    s_uni = probe_key_skew(uniform, "k")
    s_hot = probe_key_skew(hot, "k")
    assert abs(s_uni - 0.01) < 0.005
    assert abs(s_hot - 0.5) < 0.05
    # empty input: share 0, never salt
    empty = uniform.filter("k < 0")
    assert probe_key_skew(empty, "k") == 0.0

    # share above threshold but hot key far below the absolute floor:
    # the gate says DON'T salt (AQE handles small hot keys)
    d = when_to_salt(hot, "k")
    assert d["salt"] is False
    assert d["max_share"] > 0.4
    assert d["n_rows"] == 2000
    # both conditions crossed -> salt
    d2 = when_to_salt(hot, "k", min_hot_rows=500)
    assert d2["salt"] is True and d2["est_hot_rows"] > 500
    # uniform input never salts regardless of the floor
    assert when_to_salt(uniform, "k", min_hot_rows=1)["salt"] is False

    # bounded-sample path (sample_rows < n) still finds the hot key
    s_sampled = probe_key_skew(hot, "k", sample_rows=500)
    assert abs(s_sampled - 0.5) < 0.1


# ---------------------------------------------------------------------------
# CDC / MERGE application
# ---------------------------------------------------------------------------
def test_apply_cdc_upsert_delete_insert_passthrough(spark):
    from exness_data_preprocess_spark.operators.cdc import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, 10, "U", "b2"),
            (2, 11, "U", "b3"),  # update: higher seq wins
            (3, 5, "D", None),  # tombstone removes key 3
            (4, 7, "U", "d1"),  # brand-new key inserted
            (5, 1, "U", "x"),
            (5, 2, "D", None),  # inserted then deleted -> absent
        ],
        "k long, seq long, op string, v string",
    )
    out = {r["k"]: r["v"] for r in apply_cdc(base, changes, ("k",)).collect()}
    assert out == {1: "a", 2: "b3", 4: "d1"}


def test_interval_join_left_null_payload_not_duplicated(spark):
    """Regression (review find): a matched point with a NULL payload
    column must not ALSO appear as a spurious NULL-interval row (the
    anti-join must be null-safe)."""
    pts = spark.createDataFrame(
        [(1, _ts(9), None), (2, _ts(12), "x")],
        "pid long, ts timestamp, tag string",
    )
    iv = spark.createDataFrame(
        [(7, _ts(8), _ts(10))],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    rows = interval_join(pts, iv, how="left").collect()
    assert len(rows) == 2
    by_pid = {r["pid"]: r for r in rows}
    assert by_pid[1]["iv_id"] == 7 and by_pid[1]["tag"] is None
    assert by_pid[2]["iv_id"] is None


# ---------------------------------------------------------------------------
# corpus-analysis family (round 5)
# ---------------------------------------------------------------------------
def test_ngram_novelty_first_vs_copy(spark):
    from exness_data_preprocess_spark.operators.textstats import ngram_novelty

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta epsilon"),   # verbatim copy → 0
            (2, "zeta eta theta iota kappa"),        # all fresh → 1
            (3, "alpha beta gamma lambda mu nu"),    # 1 old gram of 4
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs, n=3).collect()}
    assert out[0]["novelty"] == 1.0
    assert out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    # doc 3 grams: 'alpha beta gamma' (seen), 'beta gamma lambda',
    # 'gamma lambda mu', 'lambda mu nu' → 3/4 novel
    assert out[3]["n_grams"] == 4 and out[3]["novel_grams"] == 3
    assert out[3]["novelty"] == 0.75


def test_doc_entropy_degenerate_and_uniform(spark):
    import math

    from exness_data_preprocess_spark.operators.textstats import doc_entropy

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam"),   # H = 0
            (1, "a b c d"),               # H = ln 4
            (2, "x x y y"),               # H = ln 2
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in doc_entropy(docs).collect()}
    assert out[0]["entropy"] == 0.0 and out[0]["distinct_words"] == 1
    assert abs(out[1]["entropy"] - round(math.log(4), 6)) < 1e-9
    assert abs(out[2]["entropy"] - round(math.log(2), 6)) < 1e-9


def test_doc_entropy_null_and_blank_edge_parity(spark):
    """The round-10 in-row plan keeps the exploded shape's edges:
    NULL-text docs were absent (no token rows); blank text is the ['']
    one-token array, present with entropy 0."""
    from exness_data_preprocess_spark.operators.textstats import doc_entropy

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a a b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in doc_entropy(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_words"] == 1 and out[1]["entropy"] == 0.0
    assert out[2]["n_words"] == 3 and out[2]["distinct_words"] == 2


def test_oov_rate_against_corpus_vocab(spark):
    from exness_data_preprocess_spark.operators.textstats import oov_rate

    docs = spark.createDataFrame(
        [
            (0, "common common common rare1"),
            (1, "common common rare2 rare3"),
        ],
        "doc_id long, text string",
    )
    # vocab_size=1 → only 'common' is in-vocab
    out = {r["doc_id"]: r for r in oov_rate(docs, vocab_size=1).collect()}
    assert out[0]["oov_tokens"] == 1 and out[0]["oov"] == 0.25
    assert out[1]["oov_tokens"] == 2 and out[1]["oov"] == 0.5
    # big enough vocab → zero OOV everywhere
    full = oov_rate(docs, vocab_size=100).collect()
    assert all(r["oov"] == 0.0 for r in full)


def test_source_overlap_counts_shared_grams(spark):
    from exness_data_preprocess_spark.operators.textstats import source_overlap

    docs = spark.createDataFrame(
        [
            (0, "one two three four", "sA"),
            (1, "one two three five", "sB"),   # shares 'one two three'
            (2, "six seven eight nine", "sC"),  # disjoint
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["src_a"], r["src_b"]): r["shared_grams"]
        for r in source_overlap(docs, n=3, source_col="source").collect()
    }
    assert rows == {("sA", "sB"): 1}  # only ordered pairs with overlap


def test_cdc_null_op_is_upsert_not_silent_delete(spark):
    """Review find: a NULL op made `!=` evaluate NULL — the row left the
    upsert set while the anti-join still removed its key: silent delete."""
    from exness_data_preprocess_spark.operators.cdc import apply_cdc

    base = spark.createDataFrame([(1, "x")], "k long, payload string")
    changes = spark.createDataFrame(
        [(1, 11, None, "y")], "k long, seq long, op string, payload string"
    )
    out = {r["k"]: r["payload"] for r in apply_cdc(
        base, changes, ("k",), seq_col="seq", op_col="op"
    ).collect()}
    assert out == {1: "y"}  # upserted, not vanished


def test_validate_accepts_non_identifier_rule_names(spark):
    from exness_data_preprocess_spark.operators.validate import validate

    df = spark.createDataFrame([(1.0,), (-2.0,)], "bid double")
    out = {r["rule"]: r["violations"] for r in validate(
        df, {"bid's range-check": F.col("bid") < 0}
    ).collect()}
    assert out == {"bid's range-check": 1}
    with pytest.raises(ValueError, match="at least one rule"):
        validate(df, {})


def test_connected_components_rejects_non_numeric_ids(spark):
    """Review find: string ids cast to NULL and 'converged' instantly
    with all-NULL components — canonical_docs then dropped everything."""
    e = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    v = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    with pytest.raises(ValueError, match="numeric ids"):
        connected_components(e, v)


def test_bm25_normalizes_query_term_case(spark):
    from exness_data_preprocess_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(
        [(1, "Spark spark streaming"), (2, "pandas only here")],
        "doc_id long, text string",
    )
    rows = bm25_topk(df, ["  SPARK  "], k=2).collect()
    assert [r["doc_id"] for r in rows] == [1]  # matched despite case/space
