"""Offline A8 migration-job tests (reference
scripts/migrate_duckdb_to_clickhouse.py:186-260): DuckDB file → catalog
with timezone conversion and keyset paging; parquet source → catalog via
the distributed path; dry-run leaves the store untouched.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from migrate_store import migrate  # noqa: E402

from exness_data_preprocess_spark.sources.catalog import ParquetCatalog  # noqa: E402


@pytest.fixture()
def duckdb_source(tmp_path):
    """A reference-shaped DuckDB store: TIMESTAMPTZ stored against
    America/Vancouver, Bid/Ask doubles (migration doc :20-27)."""
    path = tmp_path / "eurusd.duckdb"
    con = duckdb.connect(str(path))
    con.execute("SET timezone = 'America/Vancouver'")
    con.execute(
        "CREATE TABLE raw_spread_ticks (Timestamp TIMESTAMPTZ, Bid DOUBLE, Ask DOUBLE)"
    )
    # 7 rows over two months; 08:00 Vancouver == 16:00 UTC (PST, UTC-8)
    rows = [
        (f"2024-0{m}-0{d} 08:00:{s:02d}", 1.1 + d * 1e-3, 1.1001 + d * 1e-3)
        for m, d, s in [
            (1, 1, 0), (1, 1, 1), (1, 2, 0), (1, 3, 0),
            (2, 1, 0), (2, 2, 0), (2, 2, 1),
        ]
    ]
    con.executemany("INSERT INTO raw_spread_ticks VALUES (?, ?, ?)", rows)
    con.close()
    return path


def test_duckdb_migration_paged(spark, duckdb_source, tmp_path):
    base = tmp_path / "cat"
    stats = migrate(
        spark, duckdb_source, base, "eurusd",
        table="raw_spread_ticks", batch_size=3,
    )
    assert stats.total_rows == 7
    assert stats.rows_migrated == 7
    assert stats.batches_processed == 3  # 3 + 3 + 1 keyset pages

    out = ParquetCatalog(base).read(spark, "raw_spread_ticks")
    rows = out.orderBy("timestamp").collect()
    assert len(rows) == 7
    assert {r["instrument"] for r in rows} == {"EURUSD"}
    # PST → UTC conversion: 08:00:00 Vancouver on Jan 1 is 16:00:00 UTC
    assert str(rows[0]["timestamp"]) == "2024-01-01 16:00:00"
    # month partitioning derived from the UTC timestamp
    months = {p.name for p in (base / "raw_spread_ticks" / "instrument=EURUSD").iterdir()}
    assert months == {"year_month=202401", "year_month=202402"}


def test_parquet_migration_distributed(spark, tmp_path):
    src = tmp_path / "ticks.parquet"
    pd.DataFrame(
        {
            "Timestamp": pd.to_datetime(
                ["2024-03-01 00:00:00", "2024-03-01 00:00:01", "2024-03-01 00:00:01"]
            ),
            "Bid": [2.0, 2.1, 2.1],
            "Ask": [2.01, 2.11, 2.11],
        }
    ).to_parquet(src)
    base = tmp_path / "cat"
    stats = migrate(spark, src, base, "XAUUSD", table="standard_ticks")
    # stats now report rows actually STORED (post-dedup, single-pass
    # accounting): the duplicated (instrument, timestamp) collapses
    assert stats.total_rows == 2
    assert stats.rows_migrated == 2
    out = ParquetCatalog(base).read(spark, "standard_ticks")
    assert out.count() == 2


def test_dry_run_writes_nothing(spark, duckdb_source, tmp_path):
    base = tmp_path / "cat"
    stats = migrate(
        spark, duckdb_source, base, "EURUSD",
        table="raw_spread_ticks", dry_run=True,
    )
    assert stats.total_rows == 7
    assert stats.rows_migrated == 0
    assert not ParquetCatalog(base).exists("raw_spread_ticks")


def test_invalid_instrument_rejected(spark, duckdb_source, tmp_path):
    with pytest.raises(ValueError, match="Invalid pair"):
        migrate(spark, duckdb_source, tmp_path / "cat", "DOGEUSD")
