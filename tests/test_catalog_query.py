"""Catalog layout + query-engine end-to-end: partitioned writes, dedup at
write, partition pruning in the physical plan, pagination, coverage, gaps,
three-mode regeneration."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from exness_data_preprocess_spark.operators.gaps import (
    enumerate_months,
    missing_months,
)
from exness_data_preprocess_spark.processor import SparkDataProcessor


@pytest.fixture(scope="module")
def proc(spark, tick_dfs, tmp_path_factory):
    base = tmp_path_factory.mktemp("cat")
    p = SparkDataProcessor(spark, base)
    raw, std = tick_dfs
    p.insert_ticks(raw, "raw_spread")
    p.insert_ticks(std, "standard")
    p.regenerate_ohlc("EURUSD")
    p.regenerate_ohlc("XAUUSD")
    return p


def test_dedup_at_write(proc, tick_dfs):
    raw, _ = tick_dfs
    stored = proc.engine.ticks_df("raw_spread")
    n_unique_src = raw.dropDuplicates(["instrument", "timestamp"]).count()
    assert stored.count() == n_unique_src
    assert (
        stored.select("instrument", "timestamp").distinct().count()
        == stored.count()
    )


def test_write_ticks_on_conflict_replace_upserts(spark, tmp_path):
    """Advice find: the default idempotent append is FIRST-write-wins; a
    corrected archive needs the reference's ReplacingMergeTree posture.
    on_conflict='replace' makes the NEW row win, touching only the
    incoming months' partitions."""
    from exness_data_preprocess_spark.schema import TICK_SCHEMA
    from exness_data_preprocess_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(tmp_path / "upsert")
    cat.ensure_schema()
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 0, 0, 1)
    t2 = dt.datetime(2024, 2, 1, 0, 0, 0)
    first = spark.createDataFrame(
        [("EURUSD", t0, 1.10, 1.11), ("EURUSD", t1, 1.20, 1.21),
         ("EURUSD", t2, 1.30, 1.31)],
        TICK_SCHEMA,
    )
    assert cat.write_ticks(first, "raw_spread_ticks") == 3

    # default skip: corrected bid for t0 is silently discarded
    corrected = spark.createDataFrame(
        [("EURUSD", t0, 9.99, 9.99)], TICK_SCHEMA
    )
    assert cat.write_ticks(corrected, "raw_spread_ticks") == 0
    row = (
        cat.read(spark, "raw_spread_ticks")
        .filter(F.col("timestamp") == t0).first()
    )
    assert row["bid"] == 1.10  # first write won

    # replace: the corrected row supersedes, siblings in the month stay,
    # and the untouched February partition is not rewritten
    feb_files = sorted(
        (cat.base / "raw_spread_ticks").glob(
            "instrument=EURUSD/year_month=202402/*.parquet"
        )
    )
    assert cat.write_ticks(
        corrected, "raw_spread_ticks", on_conflict="replace"
    ) == 1
    stored = cat.read(spark, "raw_spread_ticks")
    assert stored.count() == 3  # no duplicates introduced
    assert stored.filter(F.col("timestamp") == t0).first()["bid"] == 9.99
    assert stored.filter(F.col("timestamp") == t1).first()["bid"] == 1.20
    assert sorted(
        (cat.base / "raw_spread_ticks").glob(
            "instrument=EURUSD/year_month=202402/*.parquet"
        )
    ) == feb_files

    with pytest.raises(ValueError, match="on_conflict"):
        cat.write_ticks(corrected, "raw_spread_ticks", on_conflict="merge")
    # replace without the dedup'd-append machinery must refuse, not
    # silently plain-append duplicates (review find)
    with pytest.raises(ValueError, match="replace"):
        cat.write_ticks(
            corrected, "raw_spread_ticks", dedup=False, on_conflict="replace"
        )
    with pytest.raises(ValueError, match="replace"):
        cat.write_ticks(
            corrected, "raw_spread_ticks", mode="overwrite",
            on_conflict="replace",
        )

    # a correction to one instrument must not rewrite siblings' month
    # partitions (review find: existing read was month-pruned only)
    other = spark.createDataFrame(
        [("XAUUSD", t0, 2000.0, 2000.5)], TICK_SCHEMA
    )
    assert cat.write_ticks(other, "raw_spread_ticks") == 1
    xau_files = sorted(
        (cat.base / "raw_spread_ticks").glob(
            "instrument=XAUUSD/year_month=202401/*.parquet"
        )
    )
    corrected2 = spark.createDataFrame(
        [("EURUSD", t0, 8.88, 8.88)], TICK_SCHEMA
    )
    assert cat.write_ticks(
        corrected2, "raw_spread_ticks", on_conflict="replace"
    ) == 1
    assert sorted(
        (cat.base / "raw_spread_ticks").glob(
            "instrument=XAUUSD/year_month=202401/*.parquet"
        )
    ) == xau_files
    assert (
        cat.read(spark, "raw_spread_ticks")
        .filter((F.col("instrument") == "EURUSD") & (F.col("timestamp") == t0))
        .first()["bid"]
        == 8.88
    )

    # exact-pair pruning (advice find): a batch touching (EURUSD, Feb) +
    # (XAUUSD, Jan) crosses instruments and months, but the untouched
    # cross-product partition (EURUSD, Jan) must not be rewritten —
    # the independent isin(months)/isin(insts) filters alone would
    # sweep it into the dynamic partition overwrite
    eur_jan_files = sorted(
        (cat.base / "raw_spread_ticks").glob(
            "instrument=EURUSD/year_month=202401/*.parquet"
        )
    )
    cross = spark.createDataFrame(
        [("EURUSD", t2, 7.77, 7.78), ("XAUUSD", t0, 2001.0, 2001.5)],
        TICK_SCHEMA,
    )
    assert cat.write_ticks(
        cross, "raw_spread_ticks", on_conflict="replace"
    ) == 2
    assert sorted(
        (cat.base / "raw_spread_ticks").glob(
            "instrument=EURUSD/year_month=202401/*.parquet"
        )
    ) == eur_jan_files
    assert cat.read(spark, "raw_spread_ticks").filter(
        (F.col("instrument") == "EURUSD") & (F.col("timestamp") == t2)
    ).first()["bid"] == 7.77


def test_sql_views_refresh_after_writes(spark, tmp_path):
    """Advice find (medium): sql() caches view registration; a write that
    extends the tick range must invalidate it, or the holidays/session
    dims silently stop covering the new months."""
    from exness_data_preprocess_spark.schema import TICK_SCHEMA

    p = SparkDataProcessor(spark, tmp_path / "stale")
    jan = spark.createDataFrame(
        [("EURUSD", dt.datetime(2024, 1, 3, 12, 0, 0), 1.1, 1.1001)],
        TICK_SCHEMA,
    )
    p.insert_ticks(jan, "raw_spread")
    n_hol_jan = p.engine.sql(
        "SELECT count(*) AS n FROM holidays"
    ).first()["n"]
    # extend the range by a year — without invalidation the cached
    # holidays view would still end at 2024
    nxt = spark.createDataFrame(
        [("EURUSD", dt.datetime(2025, 6, 2, 12, 0, 0), 1.2, 1.2001)],
        TICK_SCHEMA,
    )
    p.insert_ticks(nxt, "raw_spread")
    hol = p.engine.sql(
        "SELECT count(*) AS n FROM holidays WHERE date >= '2025-01-01'"
    ).first()["n"]
    assert hol > 0  # 2025 holidays present without refresh_views=True
    assert p.engine.sql(
        "SELECT count(*) AS n FROM holidays"
    ).first()["n"] > n_hol_jan
    # and the new tick is visible through the refreshed view
    assert p.engine.sql(
        "SELECT count(*) AS n FROM raw_spread_ticks WHERE timestamp >= '2025-01-01'"
    ).first()["n"] == 1


def test_range_filter_accepts_unpadded_dates(proc):
    """Review find: '2024-1-5' parsed fine as a timestamp but the sliced
    year_month bound '20241' lexicographically excluded '202401'..'202409'
    — silently zero rows. The bound is now parsed and re-padded."""
    padded = proc.query_ticks("EURUSD", start_date="2024-01-10",
                              end_date="2024-01-31")
    bare = proc.query_ticks("EURUSD", start_date="2024-1-10",
                            end_date="2024-1-31")
    assert len(padded) > 0
    assert len(bare) == len(padded)


def test_partition_layout(proc):
    base = proc.catalog.base / "raw_spread_ticks"
    insts = {p.name for p in base.glob("instrument=*")}
    assert insts == {"instrument=EURUSD", "instrument=XAUUSD"}
    months = {p.name for p in base.glob("instrument=EURUSD/year_month=*")}
    assert "year_month=202401" in months and "year_month=202403" in months
    assert "year_month=202402" not in months  # missing month preserved


def test_partition_pruning_in_plan(proc):
    df = proc.engine.ticks_df("raw_spread").filter(
        (F.col("instrument") == "EURUSD") & (F.col("year_month") == "202401")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the scan must not enumerate the XAUUSD or March partitions
    assert df.rdd.getNumPartitions() >= 1


def test_query_ticks_end_date_inclusivity(proc):
    """end_date midnight instant included, one second later excluded (B2)."""
    df = proc.query_ticks("EURUSD", start_date="2024-03-11", end_date="2024-03-12")
    ts = set(df["timestamp"])
    assert dt.datetime(2024, 3, 12, 0, 0, 0) in ts
    assert dt.datetime(2024, 3, 12, 0, 0, 1) not in ts


def test_query_ohlc_resample_has_ratio_columns(proc):
    df = proc.query_ohlc("EURUSD", "4h")
    assert "range_per_spread" in df.columns
    assert len(df) > 0


def test_query_ohlc_1m_has_27_columns(proc):
    df = proc.query_ohlc("EURUSD", "1m", limit=10)
    assert len(df.columns) == 27


def test_pagination_walk_is_exact(proc):
    total = proc.engine.ticks_df("raw_spread").filter(
        F.col("instrument") == "EURUSD"
    ).count()
    seen = 0
    cursor = None
    pages = 0
    while True:
        r = proc.engine.query_ticks_paginated("EURUSD", cursor=cursor, page_size=700)
        seen += len(r.data)
        pages += 1
        if not r.has_more:
            break
        cursor = r.next_cursor
    assert seen == total
    assert pages == -(-total // 700)


def test_batch_iterator_respects_max(proc):
    batches = list(
        proc.engine.query_ticks_batches("EURUSD", batch_size=500, max_batches=2)
    )
    assert len(batches) == 2
    assert all(len(b) == 500 for b in batches)


def test_coverage(proc):
    cov = proc.get_data_coverage("EURUSD")
    assert cov.raw_spread_ticks > 0
    assert cov.standard_ticks > 0
    assert cov.ohlc_bars > 0
    assert cov.total_ticks == cov.raw_spread_ticks + cov.standard_ticks
    assert cov.earliest_date is not None and cov.date_range_days >= 40


def test_instruments(proc):
    assert proc.get_instruments() == ["EURUSD", "XAUUSD"]


def test_missing_months(proc):
    gaps = missing_months(
        proc.engine.ticks_df("raw_spread"), "EURUSD", "2024-01-01", "2024-03-31"
    )
    assert gaps == [(2024, 2)]


def test_enumerate_months():
    assert enumerate_months("2023-11-15", "2024-02-01") == [
        (2023, 11), (2023, 12), (2024, 1), (2024, 2),
    ]


def test_range_regeneration_only_touches_range(proc, spark):
    before = proc.query_ohlc("EURUSD", "1m")
    n = proc.regenerate_ohlc("EURUSD", start_date="2024-03-01", end_date="2024-03-31")
    after = proc.query_ohlc("EURUSD", "1m")
    assert len(before) == len(after)
    assert n > 0


def test_dry_run_no_side_effects(proc):
    cov_before = proc.get_data_coverage("EURUSD").total_ticks
    res = proc.update_data("EURUSD", start_date="2024-01-01", dry_run=True)
    assert res.month_count == len(res.months_to_download)
    assert proc.get_data_coverage("EURUSD").total_ticks == cov_before


def test_sql_surface_runs_documented_patterns(proc):
    """The reference's five-table SQL surface: zero-spread share, per-day
    pips, session-overlap filter (docs/CLICKHOUSE_USER_GUIDE.md:450-515)."""
    eng = proc.engine
    zs = eng.sql(
        "SELECT count(*) AS n, count_if(bid = ask) AS zero_spread "
        "FROM raw_spread_ticks WHERE instrument = 'EURUSD'"
    ).first()
    assert zs["n"] > 0 and 0 <= zs["zero_spread"] <= zs["n"]

    pips = eng.sql(
        "SELECT to_date(timestamp) AS day, count(*) AS ticks, "
        "round(avg(ask - bid) * 10000, 4) AS avg_spread_pips "
        "FROM standard_ticks GROUP BY to_date(timestamp) ORDER BY day"
    ).collect()
    assert len(pips) > 0 and all(r["avg_spread_pips"] >= 0 for r in pips)

    overlap = eng.sql(
        "SELECT count(*) AS n FROM ohlc_1m "
        "WHERE is_lse_session = 1 AND is_nyse_session = 1"
    ).first()
    assert overlap["n"] >= 0

    dims = eng.sql("SELECT count(*) AS n FROM exchange_sessions").first()
    assert dims["n"] == 10
    # the view reports the close CURRENTLY in effect (dated amendments
    # honored: TSE moved 15:00 → 15:30 on 2024-11-05) plus the
    # pre-amendment base for historical context
    tse = eng.sql(
        "SELECT close_hour, close_minute, base_close_hour "
        "FROM exchange_sessions WHERE code = 'XTKS'"
    ).first()
    assert (tse["close_hour"], tse["close_minute"]) == (15, 30)
    assert tse["base_close_hour"] == 15
    hol = eng.sql(
        "SELECT count(*) AS n FROM holidays WHERE exchange_code = 'XNYS'"
    ).first()
    assert hol["n"] >= 0


def test_fresh_store_queries_return_empty(spark, tmp_path):
    """A freshly bootstrapped store answers every query surface with zero
    rows, not errors (reference: empty DDL-created tables)."""
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    fresh = SparkDataProcessor(spark, tmp_path / "fresh")
    assert len(fresh.query_ticks("EURUSD")) == 0
    assert len(fresh.query_ohlc("EURUSD", "1h")) == 0
    cov = fresh.get_data_coverage("EURUSD")
    assert cov.total_ticks == 0 and cov.ohlc_bars == 0
    assert fresh.get_instruments() == []
    page = fresh.engine.query_ticks_paginated("EURUSD", page_size=10)
    assert len(page.data) == 0 and not page.has_more


def test_compact_consolidates_small_files(spark, tmp_path):
    """Many small appends → compact() rewrites each partition into few
    sorted files with identical data (M-family maintenance twin of the
    MergeTree background merge)."""
    import datetime as dt

    from exness_data_preprocess_spark.schema import TICK_SCHEMA
    from exness_data_preprocess_spark.sources.catalog import ParquetCatalog

    cat = ParquetCatalog(tmp_path)
    cat.ensure_schema()
    base = dt.datetime(2024, 2, 1, 0, 0, 0)
    for batch in range(6):  # 6 appends → ≥6 files in the partition
        rows = [
            ("EURUSD", base + dt.timedelta(minutes=batch * 50 + i), 1.1, 1.1001)
            for i in range(50)
        ]
        cat.write_ticks(
            spark.createDataFrame(rows, TICK_SCHEMA), "raw_spread_ticks"
        )
    before_df = (
        cat.read(spark, "raw_spread_ticks")
        .select("instrument", "timestamp", "bid", "ask")
        .toPandas()
        .sort_values(["instrument", "timestamp"])
        .reset_index(drop=True)
    )
    stats = cat.compact(spark, "raw_spread_ticks", instrument="EURUSD")
    assert stats["files_before"] >= 6
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] >= 1
    after_df = (
        cat.read(spark, "raw_spread_ticks")
        .select("instrument", "timestamp", "bid", "ask")
        .toPandas()
        .sort_values(["instrument", "timestamp"])
        .reset_index(drop=True)
    )
    assert before_df.equals(after_df)


def test_processor_compact_storage_facade(spark, tmp_path):
    import datetime as dt

    from exness_data_preprocess_spark.processor import SparkDataProcessor
    from exness_data_preprocess_spark.schema import TICK_SCHEMA

    proc = SparkDataProcessor(spark, tmp_path)
    base = dt.datetime(2024, 3, 1)
    for b in range(3):
        rows = [
            ("XAUUSD", base + dt.timedelta(minutes=b * 30 + i), 2000.0, 2000.5)
            for i in range(30)
        ]
        proc.insert_ticks(spark.createDataFrame(rows, TICK_SCHEMA), "raw_spread")
    out = proc.compact_storage(instrument="XAUUSD", table="raw_spread_ticks")
    st = out["raw_spread_ticks"]
    assert st["files_after"] < st["files_before"]
    assert len(proc.query_ticks("XAUUSD")) == 90


def test_processor_validate_data(spark, tmp_path):
    import datetime as dt

    from exness_data_preprocess_spark.processor import SparkDataProcessor
    from exness_data_preprocess_spark.schema import TICK_SCHEMA

    proc = SparkDataProcessor(spark, tmp_path)
    rows = [
        ("EURUSD", dt.datetime(2024, 1, 1, 0, 0, 0), 1.1, 1.1001),
        ("EURUSD", dt.datetime(2024, 1, 1, 0, 0, 1), 1.2, 1.1),  # inverted
    ]
    proc.insert_ticks(spark.createDataFrame(rows, TICK_SCHEMA), "raw_spread")
    report = proc.validate_data("EURUSD")
    tbl = report["raw_spread_ticks"]
    assert tbl["total_rows"] == 2
    assert tbl["violations"]["inverted_spread"] == 1
    assert tbl["violations"]["null_instrument"] == 0


def test_processor_lifecycle_context_manager(spark, tick_dfs, tmp_path):
    """close()/__exit__ drop the SQL surface and scrub landing ZIPs,
    suppress cleanup errors, and propagate body exceptions
    (reference processor.py:150-220)."""
    raw, _ = tick_dfs
    with SparkDataProcessor(spark, tmp_path) as p:
        p.insert_ticks(raw, "raw_spread")
        p.engine.register_views()
        assert spark.catalog.tableExists("raw_spread_ticks")
        p.landing.mkdir(parents=True, exist_ok=True)
        (p.landing / "stale.zip").write_bytes(b"x")
    assert not spark.catalog.tableExists("raw_spread_ticks")
    assert not (tmp_path / "_landing" / "stale.zip").exists()
    # double-close is safe; __exit__ returns False so exceptions propagate
    p.close()
    with pytest.raises(RuntimeError):
        with SparkDataProcessor(spark, tmp_path):
            raise RuntimeError("boom")


def test_processor_available_dates(proc, spark, tmp_path):
    earliest, latest = proc.get_available_dates("EURUSD")
    assert earliest is not None and latest is not None
    assert earliest <= latest
    empty = SparkDataProcessor(spark, tmp_path / "nothing")
    assert empty.get_available_dates("EURUSD") == (None, None)


def test_processor_validate_date_range(proc):
    assert proc.validate_date_range("2024-01-01", "2024-02-01") == (True, None)
    ok, err = proc.validate_date_range("2024-02-01", "2024-01-01")
    assert not ok and "after" in err
    ok, err = proc.validate_date_range("not-a-date", "2024-01-01")
    assert not ok and "start_date" in err
    ok, err = proc.validate_date_range("2024-01-01", "2024/02/01")
    assert not ok and "end_date" in err


def test_processor_estimate_download_size(proc):
    # inclusive month count × flat 11 MB/month (reference model)
    assert proc.estimate_download_size("EURUSD", "2024-01-15", "2024-03-02") == 33.0
    assert proc.estimate_download_size("EURUSD", "2024-01-01", "2024-01-31") == 11.0
    with pytest.raises(ValueError):
        proc.estimate_download_size("NOTAPAIR", "2024-01-01", "2024-02-01")


def test_processor_estimate_rejects_reversed_range(proc):
    with pytest.raises(ValueError, match="after"):
        proc.estimate_download_size("EURUSD", "2024-03-01", "2024-01-01")


def test_keyset_pagination_non_timestamp_column(spark):
    """Review find: the cursor was hard-cast to timestamp regardless of
    order_col, breaking pagination on any other sort column."""
    from exness_data_preprocess_spark.operators.pagination import (
        paginate_keyset,
    )

    df = spark.range(0, 25).withColumnRenamed("id", "event_id")
    page1 = paginate_keyset(df, None, 10, order_col="event_id")
    assert len(page1.data) == 10 and page1.has_more
    page2 = paginate_keyset(df, page1.next_cursor, 10, order_col="event_id")
    assert list(page2.data["event_id"]) == list(range(10, 20))
    page3 = paginate_keyset(df, page2.next_cursor, 10, order_col="event_id")
    assert list(page3.data["event_id"]) == list(range(20, 25))
    assert not page3.has_more
