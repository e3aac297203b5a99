

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
