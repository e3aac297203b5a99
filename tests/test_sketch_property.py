"""Property-based parity for the sketch family: random inputs vs exact
Python twins of each estimator. Randomization hunts the edges the fixture
can't enumerate — groups straddling the k-th sketch slot, register
collisions at tiny cardinalities, histogram buckets hit exactly on their
boundary, probe sets that collide in every CM row.

Every property is EXACT (the estimators are deterministic given the hash
family), so these are equality checks, not tolerance checks — the same
bar the DuckDB oracles hold the Spark plans to.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_h60 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
_h32 = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _round6(x: float) -> float:
    """Spark's round(x, 6): BigDecimal(double) + HALF_UP — python's
    built-in round() is half-EVEN and diverges on dyadic 6-decimal
    midpoints (e.g. 2/256 = 0.0078125 -> 0.007813 vs 0.007812)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))

values = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(min_value=0, max_value=40).map(lambda i: f"v{i}"),
    ),
    min_size=1,
    max_size=120,
)


@settings(**_SETTINGS)
@given(rows=values)
def test_kmv_equals_python_twin(spark, rows):
    from exness_data_preprocess_spark.operators.sketches import (
        kmv_distinct_sketch,
    )

    k = 8
    df = spark.createDataFrame(rows, "grp string, v string")
    got = {r["grp"]: r for r in kmv_distinct_sketch(df, "grp", "v", k=k).collect()}
    groups = {}
    for g, v in rows:
        groups.setdefault(g, set()).add(v)
    for g, vals in groups.items():
        hs = sorted(_h60(v) for v in vals)
        kth = hs[min(k, len(hs)) - 1]
        if len(hs) >= k:
            est = _round6((k - 1) / (kth / float(1 << 60)))
        else:
            est = float(len(hs))
        r = got[g]
        assert r["n_exact"] == len(vals)
        assert r["kth_h60"] == kth
        assert r["est_distinct"] == est


@settings(**_SETTINGS)
@given(rows=values)
def test_hll_equals_python_twin(spark, rows):
    from exness_data_preprocess_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        HLL_VALUE_BITS,
        hll_distinct_sketch,
    )

    df = spark.createDataFrame(rows, "grp string, v string")
    got = {r["grp"]: r for r in hll_distinct_sketch(df, "grp", "v").collect()}
    groups = {}
    for g, v in rows:
        groups.setdefault(g, set()).add(v)
    for g, vals in groups.items():
        regs = {}
        for v in vals:
            h = _h60(v)
            b, rest = h >> HLL_VALUE_BITS, h % (1 << HLL_VALUE_BITS)
            rho = 53 if rest == 0 else HLL_VALUE_BITS - (rest.bit_length() - 1)
            regs[b] = max(regs.get(b, 0), rho)
        s_int = (HLL_M - len(regs)) * (1 << 53) + sum(
            1 << (53 - r) for r in regs.values()
        )
        e_raw = HLL_ALPHA * HLL_M * HLL_M * float(1 << 53) / float(s_int)
        zeros = HLL_M - len(regs)
        if e_raw <= 2.5 * HLL_M and zeros > 0:
            est = _round6(HLL_M * math.log(HLL_M / zeros))
        else:
            est = _round6(e_raw)
        r = got[g]
        assert r["n_registers"] == len(regs)
        assert r["est_hll"] == est


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.integers(min_value=0, max_value=30).map(lambda i: f"t{i}"),
        min_size=1,
        max_size=150,
    ),
    probes=st.lists(
        st.integers(min_value=0, max_value=35).map(lambda i: f"t{i}"),
        min_size=1,
        max_size=5,
        unique=True,
    ),
)
def test_cms_equals_python_twin(spark, rows, probes):
    from exness_data_preprocess_spark.operators.sketches import (
        CMS_COEFFS,
        CMS_WIDTH,
        cms_estimate,
    )
    from exness_data_preprocess_spark.functions.hashing import MERSENNE_P

    df = spark.createDataFrame([(v,) for v in rows], "v string")
    got = {r["probe"]: r for r in cms_estimate(df, "v", probes).collect()}
    counters: dict = {}
    for v in rows:
        h = _h32(v)
        for j, (a, b) in enumerate(CMS_COEFFS):
            cell = (j, ((h * a + b) % MERSENNE_P) % CMS_WIDTH)
            counters[cell] = counters.get(cell, 0) + 1
    for p in probes:
        h = _h32(p)
        est = min(
            counters.get((j, ((h * a + b) % MERSENNE_P) % CMS_WIDTH), 0)
            for j, (a, b) in enumerate(CMS_COEFFS)
        )
        exact = sum(1 for v in rows if v == p)
        r = got[p]
        assert r["est_count"] == est
        assert r["exact_count"] == exact
        assert r["overcount"] >= 0  # the CM guarantee, under collisions


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=60,
    )
)
def test_histogram_quantiles_equal_python_twin(spark, vals):
    from exness_data_preprocess_spark.operators.sketches import (
        HIST_BUCKETS,
        histogram_quantile_sketch,
    )

    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v double")
    r = histogram_quantile_sketch(df, "grp", "v").collect()[0]
    lo, hi, n = min(vals), max(vals), len(vals)
    counts: dict = {}
    for v in vals:
        b = (
            min(int((v - lo) / (hi - lo) * HIST_BUCKETS), HIST_BUCKETS - 1)
            if hi > lo
            else 0
        )
        counts[b] = counts.get(b, 0) + 1
    for q in (0.5, 0.95, 0.99):
        t = q * n
        cum = 0
        for b in sorted(counts):
            prev, cum = cum, cum + counts[b]
            if cum >= t:
                est = _round6(
                    lo
                    + (hi - lo)
                    / float(HIST_BUCKETS)
                    * (b + (q * n - prev) / counts[b])
                )
                break
        assert r[f"est_p{int(round(q * 100))}"] == est
