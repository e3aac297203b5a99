"""ASOF-join semantics parity vs pandas merge_asof — the reference's
hardest correctness item (SURVEY.md §7 step 3): leading-NULL rows,
equal-timestamp matches, tolerance, and month-bucket boundary carry."""

import datetime as dt

import pandas as pd
import pytest

from exness_data_preprocess_spark.operators.asof import asof_join_backward
from exness_data_preprocess_spark.schema import TICK_SCHEMA


def _expected(praw, pstd, tolerance=None):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    pstd = pstd.copy()
    pstd["timestamp_m"] = pstd["timestamp"]  # merge_asof drops the right on-col
    return pd.merge_asof(
        praw.sort_values("timestamp"),
        pstd.sort_values("timestamp"),
        on="timestamp",
        by="instrument",
        direction="backward",
        suffixes=("", "_m"),
        **kw,
    ).reset_index(drop=True)


def _run(spark, raw_df, std_df, praw, pstd, bucket, tolerance=None):
    out = (
        asof_join_backward(
            raw_df, std_df, matched_prefix="m_", bucket=bucket,
            tolerance_seconds=tolerance,
        )
        .toPandas()
        .sort_values(["instrument", "timestamp"])
        .reset_index(drop=True)
    )
    exp = (
        _expected(praw, pstd, tolerance)
        .sort_values(["instrument", "timestamp"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    pd.testing.assert_series_equal(
        out["m_bid"], exp["bid_m"], check_names=False, check_exact=True
    )
    pd.testing.assert_series_equal(
        out["m_timestamp"], exp["timestamp_m"].astype(out["m_timestamp"].dtype),
        check_names=False,
    )
    return out, exp


@pytest.mark.parametrize("bucket", [None, "month", "day"])
def test_asof_matches_pandas(spark, tick_dfs, tick_pandas, bucket):
    raw_df, std_df = tick_dfs
    raw_df = raw_df.dropDuplicates(["instrument", "timestamp"])
    praw, pstd = tick_pandas
    praw = praw.drop_duplicates(["instrument", "timestamp"]).reset_index(drop=True)
    out, _ = _run(spark, raw_df, std_df, praw, pstd, bucket)
    # leading raw tick (before any standard tick) must be NULL-matched
    assert out["m_bid"].isna().sum() >= 1


def test_asof_tolerance(spark, tick_dfs, tick_pandas):
    raw_df, std_df = tick_dfs
    raw_df = raw_df.dropDuplicates(["instrument", "timestamp"])
    praw, pstd = tick_pandas
    praw = praw.drop_duplicates(["instrument", "timestamp"]).reset_index(drop=True)
    out, exp = _run(spark, raw_df, std_df, praw, pstd, "month", tolerance=10)
    # tolerance must null out stale matches (fixture has multi-hour gaps)
    no_tol, _ = _run(spark, raw_df, std_df, praw, pstd, "month")
    assert out["m_bid"].isna().sum() > no_tol["m_bid"].isna().sum()


def test_asof_equal_timestamp_matches(spark):
    """r.timestamp >= s.timestamp: an equal-timestamp standard tick matches
    (clickhouse_ohlc_generator.py:190)."""
    t = dt.datetime(2024, 5, 1, 12, 0, 0)
    raw = spark.createDataFrame([("EURUSD", t, 1.0, 1.0)], TICK_SCHEMA)
    std = spark.createDataFrame([("EURUSD", t, 2.0, 2.1)], TICK_SCHEMA)
    row = asof_join_backward(raw, std, matched_prefix="m_", bucket=None).first()
    assert row["m_bid"] == 2.0


def test_asof_bucket_boundary_carry(spark):
    """A month with zero standard ticks must still receive the carry from
    earlier months (two-pass prefix fill, operators/asof.py)."""
    std_t = dt.datetime(2024, 1, 15, 10, 0, 0)
    raw_t = dt.datetime(2024, 4, 20, 10, 0, 0)  # 3 empty months later
    raw = spark.createDataFrame([("EURUSD", raw_t, 1.0, 1.0)], TICK_SCHEMA)
    std = spark.createDataFrame([("EURUSD", std_t, 9.9, 10.0)], TICK_SCHEMA)
    row = asof_join_backward(raw, std, matched_prefix="m_", bucket="month").first()
    assert row["m_bid"] == 9.9
    assert row["m_timestamp"] == std_t


def test_asof_no_right_rows(spark):
    raw = spark.createDataFrame(
        [("EURUSD", dt.datetime(2024, 1, 1), 1.0, 1.0)], TICK_SCHEMA
    )
    std = spark.createDataFrame([], TICK_SCHEMA)
    row = asof_join_backward(raw, std, matched_prefix="m_", bucket="month").first()
    assert row["m_bid"] is None and row["m_timestamp"] is None


# ---------------------------------------------------------------------------
# directional variants (forward / nearest) — pandas merge_asof parity
# ---------------------------------------------------------------------------
def _expected_dir(praw, pstd, direction, tolerance=None):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    pstd = pstd.copy()
    pstd["timestamp_m"] = pstd["timestamp"]
    return pd.merge_asof(
        praw.sort_values("timestamp"),
        pstd.sort_values("timestamp"),
        on="timestamp",
        by="instrument",
        direction=direction,
        suffixes=("", "_m"),
        **kw,
    ).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("bucket", [None, "month"])
def test_asof_directional_matches_pandas(
    spark, tick_dfs, tick_pandas, direction, bucket
):
    from exness_data_preprocess_spark.operators.asof import (
        asof_join_directional,
    )

    raw_df, std_df = tick_dfs
    raw_df = raw_df.dropDuplicates(["instrument", "timestamp"])
    praw, pstd = tick_pandas
    praw = praw.drop_duplicates(["instrument", "timestamp"]).reset_index(
        drop=True
    )
    out = (
        asof_join_directional(
            raw_df, std_df, matched_prefix="m_", direction=direction,
            bucket=bucket,
        )
        .toPandas()
        .sort_values(["instrument", "timestamp"])
        .reset_index(drop=True)
    )
    exp = (
        _expected_dir(praw, pstd, direction)
        .sort_values(["instrument", "timestamp"])
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    pd.testing.assert_series_equal(
        out["m_bid"], exp["bid_m"], check_names=False, check_exact=True
    )
    pd.testing.assert_series_equal(
        out["m_timestamp"],
        exp["timestamp_m"].astype(out["m_timestamp"].dtype),
        check_names=False,
    )


def test_asof_directional_backward_equals_reference_impl(
    spark, tick_dfs
):
    from exness_data_preprocess_spark.operators.asof import (
        asof_join_directional,
    )

    raw_df, std_df = tick_dfs
    raw_df = raw_df.dropDuplicates(["instrument", "timestamp"])
    a = (
        asof_join_backward(raw_df, std_df, matched_prefix="m_", bucket="month")
        .toPandas()
        .sort_values(["instrument", "timestamp"])
        .reset_index(drop=True)
    )
    b = (
        asof_join_directional(
            raw_df, std_df, matched_prefix="m_", direction="backward",
            bucket="month",
        )
        .toPandas()
        .sort_values(["instrument", "timestamp"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[b.columns], b)


def test_asof_forward_tolerance_and_boundary_carry(spark):
    from exness_data_preprocess_spark.operators.asof import (
        asof_join_directional,
    )

    # right row 3 months AFTER the left row: forward bucketed carry must
    # cross the empty months; a 60 s tolerance must then null it out
    raw_t = dt.datetime(2024, 1, 15, 10, 0, 0)
    std_t = dt.datetime(2024, 4, 20, 10, 0, 0)
    raw = spark.createDataFrame([("EURUSD", raw_t, 1.0, 1.0)], TICK_SCHEMA)
    std = spark.createDataFrame([("EURUSD", std_t, 9.9, 10.0)], TICK_SCHEMA)
    row = asof_join_directional(
        raw, std, matched_prefix="m_", direction="forward", bucket="month"
    ).first()
    assert row["m_bid"] == 9.9 and row["m_timestamp"] == std_t
    row2 = asof_join_directional(
        raw, std, matched_prefix="m_", direction="forward", bucket="month",
        tolerance_seconds=60,
    ).first()
    assert row2["m_bid"] is None and row2["m_timestamp"] is None


def test_asof_nearest_tie_resolves_backward(spark):
    from exness_data_preprocess_spark.operators.asof import (
        asof_join_directional,
    )

    t = dt.datetime(2024, 5, 1, 12, 0, 0)
    raw = spark.createDataFrame([("EURUSD", t, 1.0, 1.0)], TICK_SCHEMA)
    std = spark.createDataFrame(
        [
            ("EURUSD", t - dt.timedelta(seconds=30), 111.0, 1.0),
            ("EURUSD", t + dt.timedelta(seconds=30), 222.0, 1.0),
        ],
        TICK_SCHEMA,
    )
    row = asof_join_directional(
        raw, std, matched_prefix="m_", direction="nearest", bucket=None
    ).first()
    assert row["m_bid"] == 111.0  # equal distance -> backward match


def test_asof_null_value_in_matched_row_is_not_mixed(spark):
    """Regression (review find): a NULL value column in the MATCHED right
    row must stay NULL — not be backfilled from an older right row,
    which would emit a bid/ask pair that never coexisted."""
    from exness_data_preprocess_spark.operators.asof import (
        asof_join_directional,
    )

    t1 = dt.datetime(2024, 5, 1, 12, 0, 0)
    t2 = dt.datetime(2024, 5, 1, 12, 5, 0)
    t3 = dt.datetime(2024, 5, 1, 12, 9, 0)
    raw = spark.createDataFrame([("EURUSD", t3, 1.0, 1.0)], TICK_SCHEMA)
    std = spark.createDataFrame(
        [("EURUSD", t1, 100.0, 101.0), ("EURUSD", t2, None, 103.0)],
        TICK_SCHEMA,
    )
    for bucket in (None, "month"):
        row = asof_join_backward(
            raw, std, matched_prefix="m_", bucket=bucket
        ).first()
        assert row["m_timestamp"] == t2
        assert row["m_ask"] == 103.0
        assert row["m_bid"] is None, f"bucket={bucket}: mixed-row match"
        fwd = asof_join_directional(
            std.limit(0).unionByName(raw), std, matched_prefix="m_",
            direction="nearest", bucket=bucket,
        ).first()
        assert fwd["m_bid"] is None and fwd["m_ask"] == 103.0
