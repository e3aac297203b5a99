

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
