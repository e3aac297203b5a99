#!/usr/bin/env python
"""Throughput probe for the write pipeline at realistic tick volume.

Generates N synthetic ticks per variant JVM-side (spark.range — no driver
materialization), then times the three pipeline stages the reference
benchmarks (BASELINE.md): partitioned+deduped tick write, full OHLC
regeneration (asof join + minute agg + calendar enrichment), and a
1m→1h resample read. Prints one JSON line.

Usage: python scripts/scale_probe.py [--ticks 20000000] [--months 10]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=20_000_000)
    ap.add_argument("--months", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from exness_data_preprocess_spark import get_spark
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    spark = get_spark("scale-probe")
    base = tempfile.mkdtemp(prefix="scale_probe_")
    proc = SparkDataProcessor(spark, base)

    n = args.ticks
    span_s = args.months * 30 * 86_400  # ~months of wall time
    t0_epoch = 1_704_067_200  # 2024-01-01

    def synth(seed_shift: int):
        # Deterministic pseudo-random walk, entirely JVM-side: hash-derived
        # offsets keep ticks irregular; two instruments split the range.
        df = spark.range(0, n, 1)
        inst = F.when((F.col("id") % 2) == 0, "EURUSD").otherwise("XAUUSD")
        jitter = (F.hash(F.col("id") + seed_shift) % 1000) / 1000.0
        ts = F.timestamp_seconds(
            t0_epoch + (F.col("id") / n * span_s) + jitter
        )
        px = 1.08 + ((F.hash(F.col("id") * 31 + seed_shift) % 2001) - 1000) / 1e6
        return df.select(
            inst.alias("instrument"),
            ts.alias("timestamp"),
            px.alias("bid"),
            (px + 1e-5).alias("ask"),
        )

    t = {}
    t0 = time.time()
    proc.insert_ticks(synth(0), "raw_spread")
    proc.insert_ticks(synth(7), "standard")
    t["write_both_variants_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    bars = proc.regenerate_ohlc("EURUSD")
    t["regen_ohlc_full_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    hourly = proc.query_ohlc("EURUSD", "1h")
    t["resample_1m_to_1h_s"] = round(time.time() - t0, 2)

    total_ticks = 2 * n
    print(
        json.dumps(
            {
                "metric": "pipeline_scale_probe",
                "ticks_per_variant": n,
                "months_spanned": args.months,
                "ohlc_bars": bars,
                "hourly_bars": len(hourly),
                "timings": t,
                "write_ticks_per_sec": round(
                    total_ticks / t["write_both_variants_s"]
                ),
                # regen covers EURUSD only = half the raw ticks
                "regen_ticks_per_sec": round((n / 2) / t["regen_ohlc_full_s"]),
            }
        )
    )
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
