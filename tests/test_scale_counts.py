"""Deterministic scale-regression gates (judge r7 task 3).

Wall-clock scale curves are noise-prone (the r7 contamination lesson:
a concurrent pytest run once inverted a plan comparison), but the COUNT
of candidates / bucket members / window hashes a plan generates is a
pure function of code + fixture — zero timing dependence. These tests
run the instrumented count taps at two fixture rungs (sf0.01 → sf0.1,
10× documents / 10× embeddings) for the known-risk families and fail if
a future edit re-introduces super-linear candidate growth.

Metric: alpha = log(count_hi / count_lo) / log(rows_hi / rows_lo) — the
count exponent across the 10× step. The saturated driver fixtures have
genuinely super-linear TRUE-pair output (bounded vocabulary), so the
pair-mining bars are RELATIVE: candidates must not grow meaningfully
faster than the verified output they feed (the invariant every blocked
join here is designed around). Structure-work families (SRP buckets,
IVF cells, substring windows) get ABSOLUTE near-linear bars — their
work is supposed to be O(n) by construction.
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

SF_LO = "/root/testdata/sf0.01"
SF_HI = "/root/testdata/sf0.1"


def _rows(sf: str, table: str) -> int:
    return pq.read_metadata(f"{sf}/{table}.parquet").num_rows


def _alpha(lo: float, hi: float, ratio: float) -> float:
    return math.log(max(hi, 1.0) / max(lo, 1.0)) / math.log(ratio)


def _docs(spark, sf: str):
    from exness_data_preprocess_spark.plans.registry_ml import _docs_spread

    return _docs_spread(spark, sf)


@pytest.fixture(scope="module")
def doc_ratio() -> float:
    return _rows(SF_HI, "documents") / _rows(SF_LO, "documents")


@pytest.fixture(scope="module")
def emb_ratio() -> float:
    return _rows(SF_HI, "embeddings") / _rows(SF_LO, "embeddings")


def test_containment_candidates_track_output(spark, doc_ratio):
    """Capped + suffix-filtered default AND the exact opt-in: the
    candidate set entering the verify join must grow no faster than the
    verified output (+0.15 exponent slack for count noise). The r7
    pre-suffix-filter plan measures alpha_cand − alpha_out ≈ +0.2 here
    and FAILS this bar — the gate would have caught its removal."""
    from exness_data_preprocess_spark.operators.dedup import (
        ngram_containment_pairs,
    )

    for cap in ({}, {"index_df_cap": None}):
        counts = {}
        for sf in (SF_LO, SF_HI):
            docs = _docs(spark, sf)
            counts[sf] = (
                ngram_containment_pairs(
                    docs, block_cols=("lang",), threshold=0.9,
                    candidates_only=True, **cap,
                ).count(),
                ngram_containment_pairs(
                    docs, block_cols=("lang",), threshold=0.9, **cap
                ).count(),
            )
        (c_lo, o_lo), (c_hi, o_hi) = counts[SF_LO], counts[SF_HI]
        assert c_lo >= o_lo and c_hi >= o_hi  # tap is a superset
        a_cand = _alpha(c_lo, c_hi, doc_ratio)
        a_out = _alpha(o_lo, o_hi, doc_ratio)
        assert a_cand <= a_out + 0.15, (
            f"cap={cap}: candidate exponent {a_cand:.2f} outgrows "
            f"output exponent {a_out:.2f}"
        )


def test_jaccard_candidates_track_output(spark, doc_ratio):
    from exness_data_preprocess_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    counts = {}
    for sf in (SF_LO, SF_HI):
        docs = _docs(spark, sf)
        counts[sf] = (
            ngram_jaccard_pairs(
                docs, block_cols=("lang",), shingle_n=1, threshold=0.9,
                candidates_only=True,
            ).count(),
            ngram_jaccard_pairs(
                docs, block_cols=("lang",), shingle_n=1, threshold=0.9
            ).count(),
        )
    (c_lo, o_lo), (c_hi, o_hi) = counts[SF_LO], counts[SF_HI]
    assert c_lo >= o_lo and c_hi >= o_hi
    a_cand = _alpha(c_lo, c_hi, doc_ratio)
    a_out = _alpha(o_lo, o_hi, doc_ratio)
    assert a_cand <= a_out + 0.15, (
        f"jaccard candidate exponent {a_cand:.2f} outgrows output "
        f"exponent {a_out:.2f}"
    )


def test_jaccard_capped_candidates_bounded_by_cap_contract(
    spark, doc_ratio
):
    """r9 df-capped jaccard: on the SATURATED driver fixtures the cap
    binds hard at sf0.1 (token dfs reach ~n), so the capped plan's
    candidates must grow near-linearly (O(n·cap) contract — absolute
    bar) while staying a superset of its own verified output."""
    from exness_data_preprocess_spark.operators.dedup import (
        CONTAINMENT_DF_CAP,
        ngram_jaccard_pairs,
    )

    counts = {}
    for sf in (SF_LO, SF_HI):
        docs = _docs(spark, sf)
        counts[sf] = (
            ngram_jaccard_pairs(
                docs, block_cols=("lang",), shingle_n=1, threshold=0.9,
                index_df_cap=CONTAINMENT_DF_CAP, candidates_only=True,
            ).count(),
            ngram_jaccard_pairs(
                docs, block_cols=("lang",), shingle_n=1, threshold=0.9,
                index_df_cap=CONTAINMENT_DF_CAP,
            ).count(),
        )
    (c_lo, o_lo), (c_hi, o_hi) = counts[SF_LO], counts[SF_HI]
    assert c_lo >= o_lo and c_hi >= o_hi
    a_cand = _alpha(c_lo, c_hi, doc_ratio)
    a_out = _alpha(o_lo, o_hi, doc_ratio)
    # the capped candidate set may track the (quadratic-on-saturated-
    # fixture) output it verifies, but never meaningfully outgrow it
    assert a_cand <= a_out + 0.15, (
        f"capped-jaccard candidate exponent {a_cand:.2f} outgrows "
        f"output exponent {a_out:.2f}"
    )


def test_levenshtein_candidates_bounded(spark):
    """Pin of MEASURED current behavior (r8), not an aspiration — this
    gate exists to catch regressions.

    Lossless segment matching has an inherent floor this instrumentation
    surfaced: SHORT docs (≤ ~12 words) have total q-gram counts below
    the sound d·q kill bound and their ~5-char segments ride high-df
    Zipf-head patterns, so even on the Heaps-law fixture the DP input
    grows ~n^1.64 (vs linear output) — the per-pair DP there is tiny
    (short strings), which is why wall-time still measures alpha ≈ 1 on
    the natural ladder. An L1 char-count filter was probed and rejected
    (short Zipf docs share char distributions; 36% extra kills only).
    Two bars, both from measured values + headroom:

    * alpha_cand ≤ 1.75 across nat1→nat10 (removing PassJoin's
      position-compatibility filter degrades toward the full n², ≈ 2);
    * DP input ≤ 35× true output at nat10 (measured 27×; removing the
      q-gram filter measures 47× and fails).

    Measured on the natural fixtures: the saturated driver fixture's
    30-word vocabulary makes candidates quadratic by construction
    (alpha_cand 1.96 at sf0.01→sf0.1 — the bounded-vocabulary regime
    the operator docstring documents as the problem's own floor)."""
    import os

    nat_lo, nat_hi = "/root/repo/.scaledata/nat1", "/root/repo/.scaledata/nat10"
    if not (os.path.isdir(nat_lo) and os.path.isdir(nat_hi)):
        pytest.skip(
            "natural fixtures absent — regenerate with "
            "scripts/gen_scale_data.py --natural --mult {1,10}"
        )
    from exness_data_preprocess_spark.operators.dedup import (
        levenshtein_pairs,
    )

    ratio = _rows(nat_hi, "documents") / _rows(nat_lo, "documents")
    counts = {}
    for sf in (nat_lo, nat_hi):
        docs = _docs(spark, sf)
        counts[sf] = (
            levenshtein_pairs(
                docs, length_bucket=10, max_distance=10,
                candidates_only=True,
            ).count(),
            levenshtein_pairs(
                docs, length_bucket=10, max_distance=10
            ).count(),
        )
    (c_lo, o_lo), (c_hi, o_hi) = counts[nat_lo], counts[nat_hi]
    assert c_lo >= o_lo and c_hi >= o_hi
    a_cand = _alpha(c_lo, c_hi, ratio)
    assert a_cand <= 1.75, (
        f"levenshtein candidate exponent {a_cand:.2f} beyond the "
        f"measured segment-collision floor"
    )
    assert c_hi <= 35 * o_hi, (
        f"DP input {c_hi} is {c_hi / o_hi:.0f}x the true output {o_hi} "
        "— q-gram filter regressed?"
    )


def test_srp_bucket_work_stays_linear(spark, emb_ratio):
    """The SRP kernel's verify work is Σ min(cnt, cap)² over banded
    buckets; the signature width scales with ⌈log2 n⌉ precisely so this
    stays ~linear. Absolute bar: work exponent ≤ 1.25."""
    from exness_data_preprocess_spark.operators.dedup import (
        srp_banded_pairs,
    )
    from exness_data_preprocess_spark.plans.registry_ml import (
        _SRP_BANDS,
        _SRP_CAP,
        _SRP_T,
    )

    work = {}
    for sf in (SF_LO, SF_HI):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        buckets = srp_banded_pairs(
            emb, bands=_SRP_BANDS, threshold=_SRP_T,
            max_bucket_size=_SRP_CAP, buckets_only=True,
        )
        capped = F.least(F.col("cnt"), F.lit(_SRP_CAP))
        work[sf] = (
            buckets.agg(F.sum(capped * capped).alias("w")).first()["w"]
        )
    a = _alpha(work[SF_LO], work[SF_HI], emb_ratio)
    assert a <= 1.25, f"SRP bucket work exponent {a:.2f} super-linear"


def test_ivf_cell_work_stays_balanced(spark):
    """IVF per-cell quadratic work Σ cnt² must stay near the balanced
    ideal n²/n_cells at EVERY rung — gated as the scale-free IMBALANCE
    factor Σ cnt² / (n²/n_cells) ≤ 2, for both the oracle-reproducible
    stand-in centroids and the trained production default (both measure
    ≈ 1.0 on these fixtures). Not a cross-rung exponent: the min-cells
    floor (16) binds at the small rung, making expected per-cell size
    n-dependent there — a raw work exponent reads ~1.5 on a perfectly
    balanced assignment (this test's first draft did exactly that)."""
    from exness_data_preprocess_spark.operators.similarity import (
        _ivf_centroid_frame,
        ivf_assign_cells,
        train_ivf_centroids_spherical,
    )
    from exness_data_preprocess_spark.plans.registry_ext import (
        _emb_count,
        _ivf_centroids,
    )
    from exness_data_preprocess_spark.plans.registry_ml import (
        _COSIVF_MIN_CELLS,
        _COSIVF_TARGET,
    )

    for sf in (SF_LO, SF_HI):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        n = _emb_count(spark, sf)
        n_cells = max(_COSIVF_MIN_CELLS, n // _COSIVF_TARGET)
        for kind, cents_list in (
            ("standin", _ivf_centroids(spark, sf, n_cells)),
            (
                "trained",
                train_ivf_centroids_spherical(emb, n_cells=n_cells, iters=5),
            ),
        ):
            cents = _ivf_centroid_frame(
                emb, n_cells, cents_list, "embedding", "vec_id"
            )
            cnts = ivf_assign_cells(emb, cents).groupBy("cell_id").agg(
                F.count("*").alias("cnt")
            )
            work = cnts.agg(
                F.sum(F.col("cnt") * F.col("cnt")).alias("w")
            ).first()["w"]
            imbalance = work / (n * n / n_cells)
            assert imbalance <= 2.0, (
                f"{sf} {kind}: IVF imbalance {imbalance:.2f} — hot cells"
            )


def test_window_hash_rows_stay_linear(spark, doc_ratio):
    """exact_substring's hashed-window index is one row per character
    window — linear in corpus characters by construction."""
    from exness_data_preprocess_spark.operators.dedup import (
        _tokenized_base,
        _window_hashes,
    )

    rows = {}
    for sf in (SF_LO, SF_HI):
        docs = _docs(spark, sf)
        base = _tokenized_base(docs, "text", "doc_id")
        rows[sf] = _window_hashes(base, 13).count()
    a = _alpha(rows[SF_LO], rows[SF_HI], doc_ratio)
    assert a <= 1.1, f"window-hash rows exponent {a:.2f} super-linear"
