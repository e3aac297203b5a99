"""Property-based parity for the round-2 pipeline operators: random inputs
vs straightforward Python reference implementations. Randomization hunts
the edges fixtures can't enumerate — bridge edges between dense clusters,
intervals touching bucket boundaries exactly, sessions split by a
one-second overshoot, docs exactly at the pack budget."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from exness_data_preprocess_spark.operators.graph import connected_components
from exness_data_preprocess_spark.operators.intervals import interval_join
from exness_data_preprocess_spark.operators.sessionize import sessionize
from exness_data_preprocess_spark.operators.textstats import pack_sequences

EPOCH = dt.datetime(2024, 1, 1)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# connected components ≡ union-find
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_cc_matches_union_find(spark, edges):
    n = 31
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}
    # normalize: component id = min member
    comp_min: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    expected = {i: comp_min[find(i)] for i in range(n)}

    e = spark.createDataFrame(
        [(a, b) for a, b in edges] or [(0, 0)], "id_a long, id_b long"
    )
    v = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(e, v).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# interval join ≡ brute-force BETWEEN
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(
    pts=st.lists(
        st.integers(min_value=0, max_value=7200), min_size=0, max_size=25
    ),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7200),
            st.integers(min_value=0, max_value=3600),
        ),
        min_size=0,
        max_size=10,
    ),
)
def test_interval_join_matches_bruteforce(spark, pts, ivs):
    points = spark.createDataFrame(
        [(i, EPOCH + dt.timedelta(seconds=s)) for i, s in enumerate(pts)]
        or [(0, EPOCH)],
        "pid long, ts timestamp",
    )
    if not pts:
        points = points.filter("pid < 0")
    intervals = spark.createDataFrame(
        [
            (j, EPOCH + dt.timedelta(seconds=s), EPOCH + dt.timedelta(seconds=s + d))
            for j, (s, d) in enumerate(ivs)
        ]
        or [(0, EPOCH, EPOCH)],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    if not ivs:
        intervals = intervals.filter("iv_id < 0")
    got = sorted(
        (r["pid"], r["iv_id"])
        for r in interval_join(
            points, intervals, bucket_seconds=600
        ).collect()
    )
    expected = sorted(
        (i, j)
        for i, s in enumerate(pts)
        for j, (a, d) in enumerate(ivs)
        if a <= s <= a + d
    )
    assert got == expected


# ---------------------------------------------------------------------------
# sessionize ≡ per-key replay
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # user
            st.integers(min_value=0, max_value=14400),  # seconds
        ),
        min_size=1,
        max_size=30,
    )
)
def test_sessionize_matches_replay(spark, evs):
    rows = [
        (i, u, EPOCH + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(evs)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    expected = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(evs):
        by_user.setdefault(u, []).append((s, i))
    for u, items in by_user.items():
        items.sort()  # (ts, event_id) — same tiebreak as the operator
        seq, prev = 0, None
        for s, i in items:
            if prev is None or s - prev > 1800:
                seq += 1
            expected[i] = seq
            prev = s
    assert got == expected


# ---------------------------------------------------------------------------
# sequence packing invariants + replay
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.integers(min_value=1, max_value=40),  # token counts
        min_size=1,
        max_size=20,
    )
)
def test_pack_sequences_matches_replay(spark, docs):
    budget = 32
    rows = [(i, "en", "w " * n) for i, n in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(df, budget=budget).collect()
    }
    cum = 0
    for i, _ in enumerate(docs):
        n_tok = out[i][0]  # whitespace split counts the trailing ''
        capped = min(n_tok, budget)
        assert out[i][1] == cum // budget
        assert out[i][2] == cum % budget
        assert 0 <= out[i][2] < budget
        cum += capped


# ---------------------------------------------------------------------------
# CDC apply ≡ dict replay
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=-50, max_value=50),
        max_size=8,
    ),
    changes=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),   # key
            st.integers(min_value=0, max_value=30),   # seq
            st.sampled_from(["U", "D"]),
            st.integers(min_value=-50, max_value=50),  # value
        ),
        max_size=25,
    ),
)
def test_apply_cdc_matches_dict_replay(spark, base, changes):
    from exness_data_preprocess_spark.operators.cdc import apply_cdc

    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(99, 0)], "k long, v long"
    )
    if not base:
        base_df = base_df.filter("k < 0")
    ch_df = spark.createDataFrame(
        changes or [(99, 0, "U", 0)], "k long, seq long, op string, v long"
    )
    if not changes:
        ch_df = ch_df.filter("k < 0")

    # reference replay: winner per key = lexicographic max of (seq, op, v)
    # (the operator's documented deterministic tie rule)
    winner = {}
    for k, seq, op, v in changes:
        cand = (seq, op, v)
        if k not in winner or cand > winner[k]:
            winner[k] = cand
    expect = dict(base)
    for k, (seq, op, v) in winner.items():
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v

    got = {
        r["k"]: r["v"] for r in apply_cdc(base_df, ch_df, ("k",)).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# bounded top-k ≡ sorted()[:k]
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # group
            st.integers(min_value=-100, max_value=100),  # score
            st.integers(min_value=0, max_value=10_000),  # rid (tiebreak)
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: (t[0], t[1], t[2]),
    ),
    k=st.integers(min_value=1, max_value=7),
)
def test_topk_bounded_matches_sorted(spark, rows, k):
    from exness_data_preprocess_spark.operators.skew import (
        topk_per_group_bounded,
    )

    df = spark.createDataFrame(rows, "grp long, score long, rid long")
    got = sorted(
        map(
            tuple,
            topk_per_group_bounded(
                df, ("grp",), ("score", "rid"), k, n_salts=4
            ).collect(),
        )
    )
    want = []
    for g in {r[0] for r in rows}:
        members = sorted((s, rid) for gg, s, rid in rows if gg == g)[:k]
        want += [(g, s, rid) for s, rid in members]
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# URL normalization: idempotence over generated URLs
# ---------------------------------------------------------------------------
_HOST_CHARS = st.sampled_from("abXY09.-")
_PATH_CHARS = st.sampled_from("abXY09/._-")
_PARAM = st.sampled_from(
    ["a=1", "b=2", "z=9", "utm_source=x", "utm_campaign=q",
     "gclid=123", "fbclid=9", "msclkid=t", ""]
)


@settings(**_SETTINGS)
@given(
    host=st.text(_HOST_CHARS, min_size=1, max_size=12),
    path=st.text(_PATH_CHARS, min_size=0, max_size=12),
    params=st.lists(_PARAM, min_size=0, max_size=4),
    frag=st.sampled_from(["", "#x", "#a/b?c=1"]),
    www=st.booleans(),
    tail=st.sampled_from(["", ").", ",", "!"]),
)
def test_normalize_url_idempotent(spark, host, path, params, frag, www, tail):
    """normalize(normalize(u)) == normalize(u): canonical forms are fixed
    points — otherwise two passes over the same corpus would disagree on
    identity keys."""
    from pyspark.sql import functions as F

    from exness_data_preprocess_spark.operators.urls import normalize_url

    url = "https://" + ("www." if www else "") + host
    if path:
        url += "/" + path
    if params:
        url += "?" + "&".join(params)
    url += frag + tail
    df = spark.createDataFrame([(url,)], "u string")
    once, twice = df.select(
        normalize_url(F.col("u")).alias("n1"),
        normalize_url(normalize_url(F.col("u"))).alias("n2"),
    ).first()
    assert once == twice, (url, once, twice)
