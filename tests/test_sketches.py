"""Sketches (KMV / count-min), in-plan NB classifier, PMI collocations.

Ground-truth checks on handcrafted corpora (the registry oracles prove
cross-engine hash parity; these prove the MATH: estimator formulas, CM
over-count bound, NB argmax semantics, PMI ordering) plus the sketch
properties that matter at scale — KMV mergeability, CM monotonicity.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------
def test_kmv_exact_branch_below_k(spark):
    """< k distinct values → the sketch holds everything, estimate is
    exact and rel_err is 0."""
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_distinct_sketch,
    )

    rows = [("g", f"tok{i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, v string")
    out = kmv_distinct_sketch(df, "grp", "v", k=16).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_exact"] == 7
    assert r["est_distinct"] == 7.0
    assert r["rel_err"] == 0.0


def test_kmv_estimator_formula_and_accuracy(spark):
    """>= k distinct → est = (k-1)/(h_k/2^60), reproduced from the python
    md5 twin; with k=64 over 2000 distinct values the estimate lands
    within the ~3/sqrt(k) (≈37%) envelope — generous, deterministic."""
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_distinct_sketch,
    )

    n, k = 2000, 64
    df = spark.createDataFrame(
        [("g", f"val-{i}") for i in range(n)], "grp string, v string"
    )
    r = kmv_distinct_sketch(df, "grp", "v", k=k).collect()[0]
    hs = sorted(_h60(f"val-{i}") for i in range(n))
    kth = hs[k - 1]
    assert r["kth_h60"] == kth
    expect = round((k - 1) / (kth / float(1 << 60)), 6)
    assert r["est_distinct"] == expect
    assert abs(r["est_distinct"] - n) / n < 3 / math.sqrt(k)


def test_kmv_merge_property(spark):
    """KMV is mergeable: the k smallest of (k-smallest(A) ∪ k-smallest(B))
    equal the k smallest of A ∪ B — so a partitioned/streaming rollup
    reproduces the single-pass sketch exactly."""
    k = 8
    a = [f"a{i}" for i in range(40)]
    b = [f"b{i}" for i in range(40)] + a[:10]  # overlap
    top = lambda vals: sorted({_h60(v) for v in vals})[:k]
    merged = sorted(set(top(a)) | set(top(b)))[:k]
    assert merged == top(a + b)


def test_kmv_skew_shape_has_no_global_window(spark):
    """The sketch's bounded top-k must not put a per-group sort window in
    the plan (the skew-proof contract of operators/skew.py)."""
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_distinct_sketch,
    )

    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(100)], "grp string, v string"
    )
    plan = kmv_distinct_sketch(df, "grp", "v")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------
def test_cms_never_undercounts_and_exact_on_sparse(spark):
    from exness_data_preprocess_spark.operators.sketches import (
        cms_estimate,
    )

    rows = (
        [("hot",)] * 500 + [("warm",)] * 50 + [(f"noise{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "v string")
    out = {
        r["probe"]: r
        for r in cms_estimate(df, "v", ["hot", "warm", "missing"]).collect()
    }
    # CM bound: est >= exact always
    for r in out.values():
        assert r["overcount"] >= 0
    assert out["hot"]["exact_count"] == 500
    # d=4 x w=512 over 202 distinct keys: collisions are possible but the
    # MIN over 4 independent rows keeps the heavy key near-exact
    assert out["hot"]["est_count"] - 500 <= 50
    assert out["missing"]["exact_count"] == 0


def test_cms_counters_bounded(spark):
    """Counter grid never exceeds d*w rows regardless of input size."""
    from exness_data_preprocess_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_counters,
    )

    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(3000)], "v string"
    )
    grid = cms_counters(df, "v")
    assert grid.count() <= CMS_DEPTH * CMS_WIDTH
    # cell-wise total equals depth * n_rows (every row lands in every row_j)
    total = grid.agg(F.sum("cnt")).collect()[0][0]
    assert total == CMS_DEPTH * 3000


def test_cms_coeffs_disjoint_from_minhash(spark):
    """CM hash rows must not reuse the 16 minhash permutations (frozen
    family, offset by construction)."""
    from exness_data_preprocess_spark.functions.hashing import minhash_coeffs
    from exness_data_preprocess_spark.operators.sketches import CMS_COEFFS

    assert set(CMS_COEFFS).isdisjoint(set(minhash_coeffs(16)))


# ---------------------------------------------------------------------------
# NB classifier
# ---------------------------------------------------------------------------
def test_nb_learns_separable_classes(spark):
    """Two classes with disjoint vocabulary: NB must classify every doc
    correctly and the score must be the smoothed log-posterior."""
    from exness_data_preprocess_spark.operators.classify import (
        nb_train_score,
    )

    rows = [(i, "alpha beta gamma", "A") for i in range(10)] + [
        (i + 10, "delta epsilon zeta", "B") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = nb_train_score(df, "lang").collect()
    assert len(out) == 20
    assert all(r["is_correct"] == 1 for r in out)
    # hand-derive one score: doc 0, class A: 3 tokens, each bucket count
    # 10 of class-A total 30; prior ln(10/20)
    w = round(math.log((10 + 1.0) / (30 + 1024.0)), 6)
    prior = round(math.log(10 / 20), 6)
    s0 = next(r for r in out if r["doc_id"] == 0)
    assert s0["pred_class"] == "A"
    assert s0["score"] == pytest.approx(3 * w + prior, abs=1e-9)


def test_nb_tie_breaks_to_lowest_class(spark):
    """Perfectly symmetric corpus → identical scores for both classes;
    the argmax must deterministically pick the lexicographically first."""
    from exness_data_preprocess_spark.operators.classify import (
        nb_train_score,
    )

    rows = [(1, "x y", "B"), (2, "x y", "A")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_train_score(df, "lang").collect()}
    assert out[1]["pred_class"] == "A" and out[2]["pred_class"] == "A"
    assert out[1]["score"] == out[2]["score"]


def test_nb_multiplicity_weights_tokens(spark):
    """Repeated tokens multiply their bucket weight (multinomial, not
    bernoulli): a doc with 'a a a' scores 3·w(a|c), not w(a|c)."""
    from exness_data_preprocess_spark.operators.classify import (
        nb_train_score,
    )

    rows = [(1, "a a a", "A"), (2, "b", "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_train_score(df, "lang").collect()}
    w_a = round(math.log((3 + 1.0) / (3 + 1024.0)), 6)
    prior = round(math.log(1 / 2), 6)
    assert out[1]["score"] == pytest.approx(3 * w_a + prior, abs=1e-9)


def test_nb_fixture_falls_back_to_prior(spark):
    """On the synthetic fixture every lang draws from the SAME 31-token
    vocabulary (label ⟂ text), so the Bayes-optimal answer is the class
    prior: NB accuracy must land at the majority-class baseline — not
    below it (which would mean the prior/likelihood arithmetic is off)
    and not spuriously above it (nothing to learn). The separable-class
    test above proves the learning path."""
    from exness_data_preprocess_spark.operators.classify import (
        nb_train_score,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = nb_train_score(docs, "lang")
    acc = out.agg(F.avg("is_correct")).collect()[0][0]
    majority = (
        docs.groupBy("lang").count().agg(F.max("count")).collect()[0][0]
        / docs.count()
    )
    assert acc == pytest.approx(majority, abs=0.05)


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------
def test_pmi_ranks_true_collocation_first(spark):
    """'new york' always adjacent; 'the the' frequent but independent —
    PMI must rank the true collocation above the frequent pair."""
    from exness_data_preprocess_spark.operators.textstats import (
        collocation_pmi,
    )

    text_a = "new york " * 10  # perfect collocation
    text_b = "the cat the dog the pig the cow the hen " * 5
    df = spark.createDataFrame(
        [(1, text_a.strip()), (2, text_b.strip())], "doc_id long, text string"
    )
    out = collocation_pmi(df, min_count=5, k=5).collect()
    assert out[0]["w1"] == "new" and out[0]["w2"] == "york"
    # hand-check the PMI value: c2=10, c1(new)=c1(york)=10, N1=70, N2=68
    n1 = 20 + 50
    n2 = 19 + 49
    expect = round(math.log((10 * n1 * n1) / (n2 * 10 * 10)), 6)
    assert out[0]["pmi"] == pytest.approx(expect, abs=1e-9)


def test_pmi_min_count_prunes(spark):
    from exness_data_preprocess_spark.operators.textstats import (
        collocation_pmi,
    )

    df = spark.createDataFrame(
        [(1, "p q p q p q"), (2, "r s")], "doc_id long, text string"
    )
    pairs = {(r["w1"], r["w2"]) for r in collocation_pmi(df, min_count=3, k=10).collect()}
    assert ("r", "s") not in pairs
    assert ("p", "q") in pairs


# ---------------------------------------------------------------------------
# Streaming KMV (forced multi-batch)
# ---------------------------------------------------------------------------
def test_streaming_kmv_multi_batch_equals_batch(spark, tmp_path):
    """Three forced micro-batches (maxFilesPerTrigger=1) must merge to the
    SAME estimate as the one-pass batch sketch over the union — the
    mergeability contract, exercised through the real foreachBatch path."""
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_distinct_sketch,
    )
    from exness_data_preprocess_spark.streaming.sketch_stream import (
        run_kmv_available_now,
    )

    land = tmp_path / "land"
    land.mkdir()
    rows = [(f"g{i % 3}", f"val-{i}") for i in range(900)]
    df = spark.createDataFrame(rows, "grp string, v string")
    # DISJOINT thirds plus a small shared overlap: a drop-old merge bug
    # (keep only the latest batch) and a drop-new bug both change the
    # result — a superset final chunk would mask the former
    for j in range(3):
        chunk = df.filter(
            ((F.col("v").substr(5, 10).cast("long") % 3) == j)
            | (F.col("v").substr(5, 10).cast("long") < 10)
        )
        chunk.coalesce(1).write.parquet(str(land / f"chunk{j}"))
    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(land) + "/*")
    )
    streamed = run_kmv_available_now(
        stream, "grp", "v", k=16, query_name="kmv_test"
    )
    batch = kmv_distinct_sketch(df, "grp", "v", k=16).select(
        "grp", "kth_h60", "est_distinct"
    )
    s = {r["grp"]: r for r in streamed.collect()}
    b = {r["grp"]: r for r in batch.collect()}
    assert set(s) == set(b) == {"g0", "g1", "g2"}
    for g in b:
        assert s[g]["kth_h60"] == b[g]["kth_h60"]
        assert s[g]["est_distinct"] == b[g]["est_distinct"]


# ---------------------------------------------------------------------------
# KMV pairwise overlap
# ---------------------------------------------------------------------------
def test_kmv_overlap_exact_regime_small_sets(spark):
    """Below k distinct values the sketches are complete sets, so the
    'estimates' must be the exact union size and exact Jaccard."""
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_source_overlap,
    )

    rows = (
        [("A", f"c{i}") for i in range(10)]          # A: c0..c9
        + [("B", f"c{i}") for i in range(5, 20)]     # B: c5..c19
        + [("C", "zzz")]                             # C: disjoint
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {
        (r["src_a"], r["src_b"]): r
        for r in kmv_source_overlap(df, "grp", "v", k=64).collect()
    }
    ab = out[("A", "B")]
    assert ab["n_union_sketch"] == 20 and ab["n_common_sketch"] == 5
    assert ab["est_union"] == 20.0
    assert ab["est_jaccard"] == pytest.approx(5 / 20)
    ac = out[("A", "C")]
    assert ac["n_common_sketch"] == 0 and ac["est_jaccard"] == 0.0
    assert len(out) == 3  # all unordered pairs, a < b


def test_kmv_overlap_estimates_track_truth_at_scale(spark):
    """Above k the estimators must land near the true union/Jaccard
    (k=64 → ~12% standard error; deterministic fixture, generous gate)."""
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_source_overlap,
    )

    n, overlap = 3000, 1000
    rows = [("A", f"x{i}") for i in range(n)] + [
        ("B", f"x{i}") for i in range(n - overlap, 2 * n - overlap)
    ]
    df = spark.createDataFrame(rows, "grp string, v string")
    r = kmv_source_overlap(df, "grp", "v", k=64).collect()[0]
    true_union = 2 * n - overlap
    true_j = overlap / true_union
    assert abs(r["est_union"] - true_union) / true_union < 0.5
    assert abs(r["est_jaccard"] - true_j) < 0.15


# ---------------------------------------------------------------------------
# Review-pass regressions: NULL values, empty docs, empty streams
# ---------------------------------------------------------------------------
def test_kmv_null_values_carry_no_identity(spark):
    """NULL values must be dropped before hashing (md5(NULL)=NULL sorts
    first in Spark's top-k but NULLS LAST in the oracle's window): the
    sketch over data-with-NULLs must equal the sketch over clean data."""
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_distinct_sketch,
        kmv_source_overlap,
    )

    clean = [("g", f"v{i}") for i in range(100)] + [
        ("h", f"v{i}") for i in range(50, 150)
    ]
    dirty = clean + [("g", None), ("h", None)]
    k = 16
    a = kmv_distinct_sketch(
        spark.createDataFrame(clean, "grp string, v string"), "grp", "v", k=k
    ).collect()
    b = kmv_distinct_sketch(
        spark.createDataFrame(dirty, "grp string, v string"), "grp", "v", k=k
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    oa = kmv_source_overlap(
        spark.createDataFrame(dirty, "grp string, v string"), "grp", "v", k=k
    ).collect()[0]
    assert oa["n_union_sketch"] == k  # NULL never crowds a real hash out


def test_nb_tokenless_doc_gets_prior_argmax(spark):
    """A doc with whitespace-only text has no features: its prediction
    must be the argmax-prior class with the prior as score — present in
    the output, not silently dropped."""
    import math

    from exness_data_preprocess_spark.operators.classify import (
        nb_train_score,
    )

    rows = [(1, "a b c", "A"), (2, "a b", "A"), (3, "d e", "B"), (4, " ", "B")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_train_score(df, "lang").collect()}
    assert set(out) == {1, 2, 3, 4}
    r4 = out[4]
    assert r4["pred_class"] == "A"  # prior 2/4 vs 2/4 -> tie -> lexic. first
    assert r4["score"] == pytest.approx(round(math.log(2 / 4), 6), abs=1e-9)
    assert r4["is_correct"] == 0


def test_streaming_kmv_empty_source_returns_empty(spark, tmp_path):
    """A clean drain with zero micro-batches (empty landing dir) must
    return an empty estimate frame, not raise a bogus TimeoutError."""
    from exness_data_preprocess_spark.streaming.sketch_stream import (
        run_kmv_available_now,
    )

    land = tmp_path / "empty_land"
    land.mkdir()
    stream = (
        spark.readStream.format("parquet")
        .schema("grp string, v string")
        .load(str(land))
    )
    out = run_kmv_available_now(stream, "grp", "v", k=8, query_name="kmv_mt")
    assert out.columns == ["grp", "kth_h60", "est_distinct"]
    assert out.count() == 0


# ---------------------------------------------------------------------------
# Bloom membership
# ---------------------------------------------------------------------------
def test_bloom_no_false_negatives_and_bounded(spark):
    from exness_data_preprocess_spark.operators.sketches import (
        BLOOM_WORDS,
        bloom_build,
        bloom_membership,
    )

    vals = [(f"tok{i}",) for i in range(500)]
    df = spark.createDataFrame(vals, "v string")
    probes = ["tok0", "tok499", "tok250", "nope1", "nope2"]
    out = {r["probe"]: r for r in bloom_membership(df, "v", probes).collect()}
    # Bloom contract: present => maybe (NO false negatives, ever)
    for p in ("tok0", "tok499", "tok250"):
        assert out[p]["bloom_maybe"] == 1 and out[p]["exact_present"] == 1
        assert out[p]["false_positive"] == 0
    # absent probes: maybe=0 => exact_present=0 (sound); fp flag consistent
    for p in ("nope1", "nope2"):
        assert out[p]["exact_present"] == 0
        assert out[p]["false_positive"] == out[p]["bloom_maybe"]
    # bitset stays bounded and sign-bit-free (DuckDB shift-range contract)
    grid = bloom_build(df, "v").collect()
    assert len(grid) <= BLOOM_WORDS
    assert all(r["bits"] > 0 for r in grid)


def test_bloom_coeffs_disjoint_from_other_sketches(spark):
    from exness_data_preprocess_spark.functions.hashing import minhash_coeffs
    from exness_data_preprocess_spark.operators.sketches import (
        BLOOM_COEFFS,
        CMS_COEFFS,
    )

    assert set(BLOOM_COEFFS).isdisjoint(set(CMS_COEFFS))
    assert set(BLOOM_COEFFS).isdisjoint(set(minhash_coeffs(16)))


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------
def test_zipf_slope_minus_one_on_exact_power_law(spark):
    """freq_i = 2520/i for i=1..10 is an EXACT Zipf law: ln(freq) =
    ln(2520) - ln(rank), so the fitted slope must be -1 (up to the 6dp
    quantization of the log terms) with r2 ~ 1."""
    from exness_data_preprocess_spark.operators.textstats import zipf_fit

    rows = []
    for i in range(1, 11):
        rows += [(f"w{i:02d} ", )] * (2520 // i)
    df = spark.createDataFrame(
        [(1, ("".join(r[0] for r in rows)).strip(), "s1")],
        "doc_id long, text string, source string",
    )
    out = zipf_fit(df, top_r=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_terms"] == 10
    assert r["zipf_slope"] == pytest.approx(-1.0, abs=1e-4)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)


def test_zipf_top_r_prunes_and_ranks_deterministically(spark):
    """Vocab below top_r → n_terms = vocab size; rank ties broken by
    token so the fit is reproducible."""
    from exness_data_preprocess_spark.operators.textstats import zipf_fit

    df = spark.createDataFrame(
        [(1, "a a a b b c", "s1"), (2, "x x x y y z", "s2")],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in zipf_fit(df, top_r=100).collect()}
    assert out["s1"]["n_terms"] == 3 and out["s2"]["n_terms"] == 3
    # identical count profile -> identical fit
    assert out["s1"]["zipf_slope"] == out["s2"]["zipf_slope"]
    assert out["s1"]["zipf_slope"] < 0


def test_cms_and_bloom_drop_null_values(spark):
    """NULL values carry no identity in ANY sketch (the kmv_value_hashes
    policy): counter/bitset grids over data-with-NULLs must equal the
    clean grids — no junk NULL-bucket rows past the geometry bound."""
    from exness_data_preprocess_spark.operators.sketches import (
        bloom_build,
        cms_counters,
    )

    clean = [(f"t{i}",) for i in range(50)]
    dirty = clean + [(None,), (None,)]
    cdf = spark.createDataFrame(clean, "v string")
    ddf = spark.createDataFrame(dirty, "v string")
    assert sorted(map(tuple, cms_counters(ddf, "v").collect())) == sorted(
        map(tuple, cms_counters(cdf, "v").collect())
    )
    assert sorted(map(tuple, bloom_build(ddf, "v").collect())) == sorted(
        map(tuple, bloom_build(cdf, "v").collect())
    )


def test_nb_class_with_only_tokenless_docs_still_scored(spark):
    """A class whose every doc is token-less must still exist in the
    class universe (prior + smoothed-floor weights), exactly as the
    oracle derives it from the documents table."""
    from exness_data_preprocess_spark.operators.classify import (
        nb_train_score,
    )

    rows = [(1, "a b c", "A"), (2, "a c", "A"), (3, " ", "C"), (4, "", "C")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_train_score(df, "lang").collect()}
    assert set(out) == {1, 2, 3, 4}
    # C has zero training tokens so every C weight is the ln(1/1024)
    # floor (~-6.93); A's observed weights ln(3/1029), ln(2/1029) are
    # all higher, so A's own docs stay classified A
    assert out[1]["pred_class"] == "A" and out[1]["is_correct"] == 1
    assert out[2]["pred_class"] == "A"
    # token-less docs score by prior alone: equal priors -> lexic. first
    assert out[3]["pred_class"] == "A" and out[4]["pred_class"] == "A"


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
def _hll_py(values):
    """Python register twin of hll_distinct_sketch's estimator."""
    from exness_data_preprocess_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_VALUE_BITS,
    )

    regs = {}
    for v in values:
        h = _h60(v)
        bucket, rest = h >> HLL_VALUE_BITS, h % (1 << HLL_VALUE_BITS)
        rho = 53 if rest == 0 else HLL_VALUE_BITS - (rest.bit_length() - 1)
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s_int = (HLL_M - len(regs)) * (1 << 53) + sum(
        1 << (53 - r) for r in regs.values()
    )
    e_raw = HLL_ALPHA * HLL_M * HLL_M * float(1 << 53) / float(s_int)
    zeros = HLL_M - len(regs)
    if e_raw <= 2.5 * HLL_M and zeros > 0:
        return len(regs), round(HLL_M * math.log(HLL_M / zeros), 6)
    return len(regs), round(e_raw, 6)


def test_hll_matches_python_register_twin_and_tracks_truth(spark):
    from exness_data_preprocess_spark.operators.sketches import (
        hll_distinct_sketch,
    )

    n = 5000
    vals = [f"item-{i}" for i in range(n)]
    # duplicates must not move a max-register sketch
    rows = [("g", v) for v in vals] + [("g", vals[0])] * 50
    df = spark.createDataFrame(rows, "grp string, v string")
    r = hll_distinct_sketch(df, "grp", "v").collect()[0]
    n_regs, est = _hll_py(vals)
    assert r["n_registers"] == n_regs
    assert r["est_hll"] == est
    assert r["n_exact"] == n
    # m=256 -> ~1.04/sqrt(m) ≈ 6.5% std error; 4-sigma gate
    assert r["rel_err"] < 0.26


def test_hll_linear_counting_small_range(spark):
    """Far below 2.5m the paper's linear-counting branch must fire:
    est = m * ln(m / zero_registers), exactly."""
    import math as _m

    from exness_data_preprocess_spark.operators.sketches import (
        HLL_M,
        hll_distinct_sketch,
    )

    vals = [f"x{i}" for i in range(40)]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    r = hll_distinct_sketch(df, "grp", "v").collect()[0]
    zeros = HLL_M - r["n_registers"]
    assert r["est_hll"] == round(HLL_M * _m.log(HLL_M / zeros), 6)
    # with 40 values, collisions are rare: estimate lands near truth
    assert abs(r["est_hll"] - 40) < 8


def test_hll_null_values_dropped(spark):
    from exness_data_preprocess_spark.operators.sketches import (
        hll_distinct_sketch,
    )

    clean = [("g", f"v{i}") for i in range(200)]
    dirty = clean + [("g", None)]
    a = hll_distinct_sketch(
        spark.createDataFrame(clean, "grp string, v string"), "grp", "v"
    ).collect()
    b = hll_distinct_sketch(
        spark.createDataFrame(dirty, "grp string, v string"), "grp", "v"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hll_rank_exact_at_power_of_two_boundaries(spark):
    """rho must come from INTEGER bit length: floating floor(log2(v))
    diverges between Spark (ln ratio) and DuckDB (std::log2) near
    power-of-two boundaries — e.g. v = 2^52-12 rounds to 52 vs 51.
    Pin the Spark expression and the oracle's CASE against the exact
    Python bit_length twin on adversarial values."""
    import duckdb

    from exness_data_preprocess_spark.operators.sketches import (
        HLL_VALUE_BITS,
    )

    adversarial = [
        0, 1, 2, 3,
        (1 << 52) - 12, (1 << 52) - 1, (1 << 52) - 27,
        (1 << 51) - 5, (1 << 51), (1 << 51) + 1,
        (1 << 20) - 1, (1 << 20),
    ]
    expect = [
        53 if v == 0 else HLL_VALUE_BITS - (v.bit_length() - 1)
        for v in adversarial
    ]
    sdf = spark.createDataFrame([(v,) for v in adversarial], "v long")
    rho = F.when(F.col("v") == 0, F.lit(53)).otherwise(
        F.lit(HLL_VALUE_BITS + 1) - F.length(F.bin(F.col("v"))).cast("int")
    )
    got_spark = [r["rho"] for r in sdf.select(rho.alias("rho")).collect()]
    assert got_spark == expect
    vals = ", ".join(f"({v}::BIGINT)" for v in adversarial)
    got_duck = [
        r[0]
        for r in duckdb.sql(
            f"SELECT CASE WHEN v = 0 THEN 53 ELSE "
            f"{HLL_VALUE_BITS + 1} - length(bin(v))::INT END "
            f"FROM (VALUES {vals}) t(v)"
        ).fetchall()
    ]
    assert got_duck == expect


# ---------------------------------------------------------------------------
# Histogram quantile sketch
# ---------------------------------------------------------------------------
def test_histogram_quantiles_uniform_data(spark):
    """On uniform data the equi-width histogram is the exact CDF shape:
    estimates land within one bucket width of the exact percentile."""
    from exness_data_preprocess_spark.operators.sketches import (
        HIST_BUCKETS,
        histogram_quantile_sketch,
    )

    n = 10000
    rows = [("g", float(i)) for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = histogram_quantile_sketch(df, "grp", "v").collect()[0]
    width = (n - 1) / HIST_BUCKETS
    assert r["n"] == n
    for p in (50, 95, 99):
        assert abs(r[f"est_p{p}"] - r[f"exact_p{p}"]) <= width + 1e-6


def test_histogram_quantiles_constant_group_and_nulls(spark):
    """hi == lo degenerates to the constant itself; NULLs are dropped."""
    from exness_data_preprocess_spark.operators.sketches import (
        histogram_quantile_sketch,
    )

    rows = [("c", 7.5)] * 20 + [("c", None)]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = histogram_quantile_sketch(df, "grp", "v").collect()[0]
    assert r["n"] == 20
    for p in (50, 95, 99):
        assert r[f"est_p{p}"] == 7.5 and r[f"exact_p{p}"] == 7.5


def test_streaming_hll_multi_batch_equals_batch(spark, tmp_path):
    """Three forced micro-batches must merge (register-wise max) to the
    SAME estimate as the one-pass batch sketch over the union."""
    from exness_data_preprocess_spark.operators.sketches import (
        hll_distinct_sketch,
    )
    from exness_data_preprocess_spark.streaming.sketch_stream import (
        run_hll_available_now,
    )

    land = tmp_path / "hll_land"
    land.mkdir()
    rows = [(f"g{i % 2}", f"val-{i}") for i in range(600)]
    df = spark.createDataFrame(rows, "grp string, v string")
    # disjoint thirds + shared overlap (see the KMV twin's rationale)
    for j in range(3):
        chunk = df.filter(
            ((F.col("v").substr(5, 10).cast("long") % 3) == j)
            | (F.col("v").substr(5, 10).cast("long") < 10)
        )
        chunk.coalesce(1).write.parquet(str(land / f"chunk{j}"))
    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(land) + "/*")
    )
    streamed = {
        r["grp"]: r
        for r in run_hll_available_now(
            stream, "grp", "v", query_name="hll_test"
        ).collect()
    }
    batch = {
        r["grp"]: r
        for r in hll_distinct_sketch(df, "grp", "v")
        .select("grp", "n_registers", "est_hll")
        .collect()
    }
    assert set(streamed) == set(batch) == {"g0", "g1"}
    for g in batch:
        assert streamed[g]["n_registers"] == batch[g]["n_registers"]
        assert streamed[g]["est_hll"] == batch[g]["est_hll"]


def test_sharded_merged_state_equals_one_pass_build(spark):
    """build_sharded_merged_state (judge r7 task 4: the single-scan
    rendering of N-shard build+merge) must serve estimates BIT-IDENTICAL
    to the one-pass batch sketch — including CMS multiplicities (the
    deduped base re-weights by cnt) and tokens repeated across shards
    (re-distinct before the KMV prune)."""
    from exness_data_preprocess_spark.operators.sketches import (
        build_sharded_merged_state,
        build_sketch_state,
        sketch_index_estimates,
    )

    corpus = (
        spark.range(900)
        .select(
            F.pmod("id", F.lit(3)).cast("int").alias("shard"),
            F.element_at(
                F.array(F.lit("web"), F.lit("wiki")),
                (F.col("id") % 2 + 1).cast("int"),
            ).alias("source"),
            # ~200 distinct tokens, every one present in all 3 shards,
            # heavy-tailed multiplicities (CMS must see true counts)
            F.concat(
                F.lit("tok"), (F.pmod(F.hash("id"), 200)).cast("string")
            ).alias("tok"),
        )
        .localCheckpoint()
    )
    probes = ["tok1", "tok42", "zz_absent"]
    sharded = sketch_index_estimates(
        build_sharded_merged_state(corpus, "shard", "source", "tok"),
        "source",
        probes,
    )
    one_pass = sketch_index_estimates(
        build_sketch_state(corpus, "source", "tok"), "source", probes
    )
    a = sharded.orderBy("source").toPandas()
    b = one_pass.orderBy("source").toPandas()
    assert a.equals(b)
