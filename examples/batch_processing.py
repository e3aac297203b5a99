#!/usr/bin/env python
"""Batch / multi-instrument processing — the PySpark twin of the
reference's ``examples/batch_processing.py``:

1. Several instruments through one warehouse (sequential)
2. Parallel archive downloads (``max_parallel_downloads``)
3. Incremental updates to keep every instrument current
4. Retry logic around flaky fetches
5. Data-quality validation (declarative audit, one aggregate scan)
6. Storage management: small-file compaction + a coverage report

Architecture difference vs the reference: ONE SparkDataProcessor over one
partitioned warehouse serves every instrument (partition directories per
instrument × month) — there is no per-instrument database file, so
"process N instruments" is N calls against the same facade, and Spark
parallelism lives INSIDE each job (32 tasks per scan) rather than in a
thread pool of engines. The thread-pool knob that still matters is
``max_parallel_downloads``, which overlaps the network-bound fetches.

Offline by default (synthetic archives); ``--online`` uses the real
downloader.

    python examples/batch_processing.py [--base /tmp/exness-spark-batch]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.basic_usage import synthetic_fetcher  # noqa: E402


def flaky_fetcher_factory(fail_first_n=2):
    """Wraps the synthetic fetcher to fail its first N calls — exercises
    the retry pattern the reference demonstrates."""
    state = {"calls": 0}

    def fetch(instrument, variant, year, month, landing):
        state["calls"] += 1
        if state["calls"] <= fail_first_n:
            raise ConnectionError(
                f"synthetic outage (call {state['calls']})"
            )
        return synthetic_fetcher(instrument, variant, year, month, landing)

    return fetch


def main(base_dir=None, spark=None, online=False, start_date=None) -> None:
    import datetime as dt

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    if spark is None:
        spark = get_spark("batch-processing-example")
    if base_dir is None:
        base_dir = Path("/tmp/exness-spark-batch")
    if start_date is None:
        today = dt.date.today()
        start_date = (
            (today.replace(day=1) - dt.timedelta(days=40)).replace(day=1)
        ).isoformat()

    fetcher = None if online else synthetic_fetcher
    pairs = ["EURUSD", "GBPUSD", "XAUUSD"]

    print("=" * 72)
    print("Example 1: several instruments, one warehouse")
    print("=" * 72)
    with SparkDataProcessor(spark, base_dir, fetcher=fetcher) as proc:
        for pair in pairs:
            res = proc.update_data(pair=pair, start_date=start_date)
            print(
                f"  {pair}: +{len(res.months_added)} months, "
                f"{res.ticks_added_raw:,} raw ticks, "
                f"{res.ohlc_bars_generated:,} bars"
            )
        print("  instruments in store:", proc.get_instruments())

        print()
        print("=" * 72)
        print("Example 2: parallel archive downloads")
        print("=" * 72)
        # A fresh instrument, fetched with 4 overlapped downloads; parse +
        # insert order stays deterministic, so storage is byte-identical
        # to a sequential run.
        res = proc.update_data(
            pair="USDJPY", start_date=start_date, max_parallel_downloads=4
        )
        print(f"  USDJPY: +{len(res.months_added)} months "
              f"({res.duration_seconds:.1f}s with overlapped fetches)")

        print()
        print("=" * 72)
        print("Example 3: incremental updates for every instrument")
        print("=" * 72)
        for pair in proc.get_instruments():
            res = proc.update_data(pair=pair, start_date=start_date)
            state = "up to date" if res.gaps_detected == 0 else (
                f"+{res.gaps_detected} months"
            )
            print(f"  {pair}: {state}")

        print()
        print("=" * 72)
        print("Example 4: retry logic around flaky fetches")
        print("=" * 72)
        flaky = SparkDataProcessor(
            spark, base_dir, fetcher=flaky_fetcher_factory(fail_first_n=1)
        )
        for attempt in range(1, 4):
            try:
                res = flaky.update_data(pair="AUDUSD", start_date=start_date)
                print(f"  attempt {attempt}: ok (+{res.gaps_detected} months)")
                break
            except ConnectionError as e:
                print(f"  attempt {attempt}: {e} — retrying")

        print()
        print("=" * 72)
        print("Example 5: data-quality validation (declarative audit)")
        print("=" * 72)
        audit = proc.validate_data()
        for table, rep in audit.items():
            bad = {k: v for k, v in rep["violations"].items() if v}
            print(
                f"  {table}: {rep['total_rows']:,} rows, "
                f"violations: {bad or 'none'}"
            )

        print()
        print("=" * 72)
        print("Example 6: storage management")
        print("=" * 72)
        stats = proc.compact_storage()
        for table, s in stats.items():
            print(
                f"  {table}: {s['files_before']} files → {s['files_after']}"
            )

        print()
        print("=" * 72)
        print("Coverage report")
        print("=" * 72)
        for pair in sorted(proc.get_instruments()):
            cov = proc.get_data_coverage(pair)
            print(
                f"  {pair:8s} | {cov.total_ticks:10,} ticks | "
                f"{cov.ohlc_bars:8,} bars | "
                f"{cov.earliest_date} .. {cov.latest_date} | "
                f"{cov.coverage_percentage:5.1f}%"
            )

    print()
    print("done — warehouse at", base_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=None)
    ap.add_argument("--online", action="store_true")
    args = ap.parse_args()
    main(base_dir=args.base, online=args.online)
