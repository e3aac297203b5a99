"""Property-based finance-operator parity: random event streams vs
independent pandas reference implementations. Randomization hunts the
edges the oracle fixture can't enumerate — single-observation buckets,
ties in timestamp (tie_col ordering), zero values on the volatility
path, buckets whose last event sits exactly on the hour boundary.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from exness_data_preprocess_spark.operators.finance import (
    realized_volatility_daily,
    twap_hourly,
)

EPOCH = dt.datetime(2024, 1, 1)
US_PER_HOUR = 3_600_000_000

# seconds over ~6 hours so hour boundaries get crossed; small value grid
# (including 0) exercises the zero-price return convention
events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6 * 3600),  # ts offset (s)
        st.sampled_from([0.0, 0.5, 1.0, 2.0, 10.0]),   # value
        st.sampled_from(["a", "b"]),                   # key
    ),
    min_size=1,
    max_size=20,
)


def _frame(spark, rows):
    data = [
        (i, EPOCH + dt.timedelta(seconds=o), k, v)
        for i, (o, v, k) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double"
    )


def _pandas_twap(rows):
    df = pd.DataFrame(
        [
            {
                "key": k,
                "ts": EPOCH + dt.timedelta(seconds=o),
                "v": v,
                "tie": i,
            }
            for i, (o, v, k) in enumerate(rows)
        ]
    )
    df["hour"] = df["ts"].dt.floor("h")
    out = {}
    for (k, h), grp in df.groupby(["key", "hour"]):
        grp = grp.sort_values(["ts", "tie"])
        ts_us = grp["ts"].astype("int64") // 1000
        end_us = int(h.value // 1000) + US_PER_HOUR
        durs = list(ts_us.diff(-1).abs().dropna()) + [end_us - int(ts_us.iloc[-1])]
        wsum = sum(float(v) * d for v, d in zip(grp["v"], durs))
        out[(k, int(h.value // 1000))] = (wsum / sum(durs), int(sum(durs)), len(grp))
    return out


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events)
def test_twap_matches_pandas_reference(spark, rows):
    got = {
        (r["event_type"], r["hour_us"]): (
            r["twap"],
            r["weighted_us"],
            r["n_events"],
        )
        for r in twap_hourly(_frame(spark, rows)).collect()
    }
    want = _pandas_twap(rows)
    assert set(got) == set(want)
    for key in want:
        gt, gw, gn = got[key]
        wt, ww, wn = want[key]
        assert (gw, gn) == (ww, wn)
        assert abs(gt - wt) < 1e-6


def _pandas_rv(rows):
    df = pd.DataFrame(
        [
            {
                "key": k,
                "day": (EPOCH + dt.timedelta(seconds=o)).date(),
                "ts": EPOCH + dt.timedelta(seconds=o),
                "v": v,
                "tie": i,
            }
            for i, (o, v, k) in enumerate(rows)
        ]
    )
    out = {}
    for (k, d), grp in df.groupby(["key", "day"]):
        grp = grp.sort_values(["ts", "tie"])
        rv, n = 0.0, 0
        prev = None
        for v in grp["v"]:
            if prev is not None and prev != 0.0:
                r = v / prev - 1.0
                rv += r * r
                n += 1
            prev = v
        out[(k, d.isoformat())] = (rv if n else None, n)
    return out


# counts spanning tiny to 10^17 per hour (the documented exactness
# bound): long co-moment sums would overflow (cnt² ≈ 10^34), and counts
# past 10^18 would overflow a decimal(18,0) CAST itself — the
# decimal(19,0) path must stay exact across the whole range
extreme_hours = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**17),
        st.integers(min_value=0, max_value=10**17),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(hours=extreme_hours)
def test_corr_comoments_exact_at_extreme_counts(spark, hours):
    """corr_from_hourly vs arbitrary-precision Python ints: the decimal
    co-moment path must agree to 1e-6 even when counts are far past the
    int64-product overflow point."""
    from exness_data_preprocess_spark.operators.finance import corr_from_hourly

    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1), a, b) for a, b in hours],
        "day date, cnt_a long, cnt_b long",
    )
    out = corr_from_hourly(df).collect()
    assert len(out) == 1 and out[0]["n_hours"] == len(hours)

    n = len(hours)
    sx = sum(a for a, _ in hours)
    sy = sum(b for _, b in hours)
    sxx = sum(a * a for a, _ in hours)
    syy = sum(b * b for _, b in hours)
    sxy = sum(a * b for a, b in hours)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    denom = (float(vx) * float(vy)) ** 0.5
    if denom == 0.0:
        assert out[0]["corr_ab"] is None
    else:
        want = float(n * sxy - sx * sy) / denom
        assert abs(out[0]["corr_ab"] - want) < 1e-6


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events)
def test_realized_vol_matches_pandas_reference(spark, rows):
    got = {
        (r["event_type"], r["day"]): (r["rv"], r["n_returns"])
        for r in realized_volatility_daily(_frame(spark, rows)).collect()
    }
    want = _pandas_rv(rows)
    assert set(got) == set(want)
    for key in want:
        grv, gn = got[key]
        wrv, wn = want[key]
        assert gn == wn
        if wrv is None:
            assert grv is None
        else:
            assert abs(grv - wrv) < 1e-6


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events)
def test_max_drawdown_matches_pandas_reference(spark, rows):
    from exness_data_preprocess_spark.operators.finance import (
        max_drawdown_daily,
    )

    df = _frame(spark, rows)
    got = {
        (r["event_type"], r["day"]): (r["max_drawdown"], r["n_obs"])
        for r in max_drawdown_daily(df).collect()
    }
    # python reference: per (key, day) running max over (ts, id) order
    series = {}
    for i, (off, v, k) in enumerate(rows):
        if v <= 0:
            continue
        ts = EPOCH + dt.timedelta(seconds=off)
        series.setdefault((k, ts.date().isoformat()), []).append(
            (ts, i, v)
        )
    want = {}
    for key, obs in series.items():
        obs.sort()
        runmax, dd = 0.0, 0.0
        for _, _, v in obs:
            runmax = max(runmax, v)
            dd = min(dd, v / runmax - 1)
        want[key] = (dd, len(obs))
    assert set(got) == set(want)
    for key in want:
        assert got[key][1] == want[key][1]
        assert abs(got[key][0] - want[key][0]) < 1e-12
