#!/usr/bin/env python
"""Basic usage of the Spark engine — the PySpark twin of the reference's
``examples/basic_usage.py``:

1. Initial download + incremental update (gap-driven, idempotent)
2. Data-coverage report
3. OHLC queries at several timeframes (on-demand resample)
4. Raw tick queries with date ranges
5. Filtered tick queries (DataFrame predicates instead of filter_sql)
6. Keyset pagination through a large scan

Storage differences vs the reference: one partitioned-Parquet warehouse
(instrument × month directories) instead of one DuckDB file per
instrument; queries are lazy DataFrames until ``.toPandas()``.

Runs fully OFFLINE by default: archives come from a deterministic
synthetic fetcher with the same signature as the HTTP downloader
(sources/downloader.py). Pass ``--online`` to fetch real Exness archives
instead (needs network).

    python examples/basic_usage.py [--base /tmp/exness-spark-demo] [--online]
"""

from __future__ import annotations

import argparse
import io
import sys
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def synthetic_fetcher(instrument, variant, year, month, landing):
    """Offline stand-in for downloader.download_zip — same contract:
    builds a small deterministic monthly tick archive in ``landing``."""
    lines = ["Timestamp,Bid,Ask"]
    base = 1.10 if variant == "raw_spread" else 1.1001
    for day in (1, 2, 3):
        for minute in range(3):
            px = base + day * 1e-4 + minute * 1e-5
            lines.append(
                f"{year}-{month:02d}-{day:02d} 00:{minute:02d}:00.500,"
                f"{px:.5f},{px + 1e-5:.5f}"
            )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(f"{instrument}_{year}_{month:02d}.csv", "\n".join(lines))
    landing = Path(landing)
    landing.mkdir(parents=True, exist_ok=True)
    dest = landing / f"{instrument}_{variant}_{year}_{month:02d}.zip"
    dest.write_bytes(buf.getvalue())
    return dest


def main(base_dir=None, spark=None, online=False, start_date=None) -> None:
    import datetime as dt

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    if spark is None:
        spark = get_spark("basic-usage-example")
    if base_dir is None:
        base_dir = Path("/tmp/exness-spark-demo")
    if start_date is None:
        # two months back so the demo ingests a couple of months quickly
        today = dt.date.today()
        start_date = (
            (today.replace(day=1) - dt.timedelta(days=40)).replace(day=1)
        ).isoformat()

    fetcher = None if online else synthetic_fetcher

    print("=" * 72)
    print("Example 1: initial download (gap-driven)")
    print("=" * 72)
    with SparkDataProcessor(spark, base_dir, fetcher=fetcher) as proc:
        result = proc.update_data(pair="EURUSD", start_date=start_date)
        print(f"  months added:   {result.months_added}")
        print(f"  raw ticks:      {result.ticks_added_raw:,}")
        print(f"  standard ticks: {result.ticks_added_std:,}")
        print(f"  OHLC bars:      {result.ohlc_bars_generated:,}")

        print()
        print("=" * 72)
        print("Example 2: incremental update (no-op when current)")
        print("=" * 72)
        result = proc.update_data(pair="EURUSD", start_date=start_date)
        print(f"  gaps detected: {result.gaps_detected} (0 = up to date)")

        print()
        print("=" * 72)
        print("Example 3: data coverage")
        print("=" * 72)
        cov = proc.get_data_coverage("EURUSD")
        print(f"  raw ticks:  {cov.raw_spread_ticks:,}")
        print(f"  std ticks:  {cov.standard_ticks:,}")
        print(f"  OHLC bars:  {cov.ohlc_bars:,}")
        print(f"  range:      {cov.earliest_date} .. {cov.latest_date}")
        print(f"  coverage:   {cov.coverage_percentage:.1f}%")

        print()
        print("=" * 72)
        print("Example 4: OHLC at multiple timeframes (on-demand resample)")
        print("=" * 72)
        for tf in ("1m", "1h", "1d"):
            bars = proc.query_ohlc("EURUSD", tf, start_date=start_date)
            print(f"  {tf:>3}: {len(bars):,} bars")
        print(bars.head(3).to_string())

        print()
        print("=" * 72)
        print("Example 5: raw ticks with a date range")
        print("=" * 72)
        ticks = proc.query_ticks(
            "EURUSD", "raw_spread", start_date=start_date
        )
        print(f"  {len(ticks):,} ticks; columns {list(ticks.columns)}")
        spread = ticks["ask"] - ticks["bid"]
        print(f"  mean spread: {spread.mean() * 1e4:.3f} pips")

        print()
        print("=" * 72)
        print("Example 6: filtered ticks (DataFrame predicate, not SQL text)")
        print("=" * 72)
        from pyspark.sql import functions as F

        df = proc.engine.query_ticks_df("EURUSD", "raw_spread")
        zero = df.filter(F.col("bid") == F.col("ask")).count()
        print(f"  zero-spread ticks: {zero:,} (filter pushed into the scan)")

        print()
        print("=" * 72)
        print("Example 7: keyset pagination (stable under concurrent writes)")
        print("=" * 72)
        from exness_data_preprocess_spark.operators.pagination import (
            iter_batches,
        )

        total = 0
        n_batches = 0
        for batch in iter_batches(
            proc.engine.ticks_df("raw_spread"), batch_size=10, max_batches=3
        ):
            total += len(batch)
            n_batches += 1
        print(f"  walked {total} rows in {n_batches} keyset batches")

    print()
    print("done — warehouse at", base_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=None)
    ap.add_argument("--online", action="store_true")
    args = ap.parse_args()
    main(base_dir=args.base, online=args.online)
