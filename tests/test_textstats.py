

# ---------------------------------------------------------------------------
# bigram_logprob_score (CCNet-style fluency)
# ---------------------------------------------------------------------------
def test_bigram_logprob_score_semantics(spark):
    import math

    from exness_data_preprocess_spark.operators.textstats import (
        bigram_logprob_score,
    )

    # corpus: "a b" twice, "a c" once, "z" (too short -> NULL score)
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "z")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob_score(df).collect()}
    # counts: c1(a)=3, c2(a,b)=2, c2(a,c)=1, V=4 (a,b,c,z)
    lp_ab = round(math.log((2 + 1) / (3 + 1 * 4)), 6)
    lp_ac = round(math.log((1 + 1) / (3 + 1 * 4)), 6)
    assert out[1]["n_transitions"] == 1
    assert out[1]["logprob_sum"] == lp_ab == out[2]["logprob_sum"]
    assert out[3]["logprob_sum"] == lp_ac
    # the common bigram scores higher than the rare one
    assert out[1]["logprob_avg"] > out[3]["logprob_avg"]
    assert out[4]["n_transitions"] == 0
    assert out[4]["logprob_sum"] is None and out[4]["logprob_avg"] is None


def test_bigram_logprob_multiplicity(spark):
    """Repeated transitions inside one doc weight the sum by their
    multiplicity (sum over positions, not distinct bigrams)."""
    import math

    from exness_data_preprocess_spark.operators.textstats import (
        bigram_logprob_score,
    )

    df = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    out = bigram_logprob_score(df).collect()[0]
    # transitions: (a,b) x2, (b,a) x1; c1(a)=2, c1(b)=2, V=2
    lp_ab = round(math.log((2 + 1) / (2 + 2)), 6)
    lp_ba = round(math.log((1 + 1) / (2 + 2)), 6)
    assert out["n_transitions"] == 3
    assert out["logprob_sum"] == round(2 * lp_ab + lp_ba, 6)


def test_gopher_rules_fire_individually(spark):
    """One crafted doc per Gopher rule, each failing exactly that rule
    (plus a baseline doc that passes all seven)."""
    from exness_data_preprocess_spark.operators.textstats import (
        gopher_quality_flags,
    )

    base = ("the quick brown fox jumps over that lazy dog and then "
            "wanders off to find some more food with great energy " * 5)
    docs = [
        (0, base),                                     # passes everything
        (1, "the of and short text"),                  # word count < 50
        (2, ("a be to of we " * 30)),                  # mean word len < 3
        (3, base + " " + "# " * 30),                   # symbol ratio
        (4, "- " + base[:40] + "\n- " + base[:40]),    # all bullet lines
        (5, base[:60] + "...\n" + base[:60] + "..."),  # all ellipsis ends
        (6, base + " " + "123 456 " * 40),             # alpha frac < 0.8
        (7, base.replace("the", "xx").replace("that", "yy")
              .replace("and", "zz").replace("to", "qq")
              .replace("of", "pp").replace("with", "ww")),  # no stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in gopher_quality_flags(df).collect()}
    assert out[0]["gopher_pass"] == 1
    fail_col = {
        1: "flag_word_count", 2: "flag_mean_word_len",
        3: "flag_symbol_ratio", 4: "flag_bullet", 5: "flag_ellipsis",
        6: "flag_alpha", 7: "flag_stopword",
    }
    for doc_id, col in fail_col.items():
        assert out[doc_id][col] == 0, (doc_id, col, out[doc_id])
        assert out[doc_id]["gopher_pass"] == 0


def test_bpe_pair_counts_hand_computable(spark):
    """Pair weights multiply word FREQUENCY by within-word multiplicity:
    'ab'×3 → (a,b)=3; 'aab'×1 adds (a,a)=1 and (a,b)=1."""
    from exness_data_preprocess_spark.operators.textstats import (
        bpe_pair_counts,
    )

    df = spark.createDataFrame(
        [(0, "ab ab cd"), (1, "ab aab"), (2, "x")],  # 'x' has no pairs
        "doc_id long, text string",
    )
    out = [(r["left"], r["right"], r["pair_count"])
           for r in bpe_pair_counts(df, k=10).collect()]
    assert out == [("a", "b", 4), ("a", "a", 1), ("c", "d", 1)]


def test_ccnet_buckets_integer_boundaries_and_unscored(spark):
    """Tercile boundaries are integer math on the per-lang rank: with
    n=4 scored docs head gets ranks {1,2}, middle {3}, tail {4}; a
    1-token doc is 'unscored' and excluded from the counts."""
    from exness_data_preprocess_spark.operators.textstats import (
        ccnet_fluency_buckets,
    )

    rep = "spark spark spark spark spark spark"      # most fluent
    docs = [
        (0, rep, "en"),
        (1, "spark shuffle spark shuffle spark", "en"),
        (2, "one two three four five six", "en"),
        (3, "zig zag quo vadis lorem ipsum", "en"),
        (4, "solo", "en"),                            # unscored
        (5, "alpha beta alpha beta", "de"),           # n=1 lang → head
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in ccnet_fluency_buckets(df).collect()}
    assert out[4]["bucket"] == "unscored" and out[4]["logprob_sum"] is None
    assert out[5]["bucket"] == "head"
    en = [out[i] for i in (0, 1, 2, 3)]
    assert sorted(r["bucket"] for r in en) == sorted(
        ["head", "head", "middle", "tail"]
    )
    # bucket order tracks mean-log-prob order
    ranked = sorted(
        en,
        key=lambda r: (-r["logprob_sum"] / r["n_transitions"], r["doc_id"]),
    )
    assert [r["bucket"] for r in ranked] == ["head", "head", "middle", "tail"]
