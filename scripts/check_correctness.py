#!/usr/bin/env python
"""Local differential checker mimicking the round driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value hash (shared logic
in exness_data_preprocess_spark/plans/differential.py).

Usage: python scripts/check_correctness.py [--sf /root/testdata/sf0.01] [-q name ...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from exness_data_preprocess_spark.plans.differential import (  # noqa: E402
    canon,
    register_oracle_views,
    value_hash,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--queries", nargs="*", default=None)
    ap.add_argument(
        "--json",
        default=None,
        help="write a per-query result dict (driver CORRECTNESS format) "
        "to this path — the committable certification artifact",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    from exness_data_preprocess_spark import get_spark

    spark = get_spark("correctness", extra_conf={"spark.driver.memory": "8g"})

    con = duckdb.connect()
    register_oracle_views(con, args.sf)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.queries or list(queries)

    failures = 0
    records: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"[FAIL] {name}: spark error: {e}")
            records[name] = {"err": f"spark: {e}"}
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            records[name] = {
                "rows_only": True,
                "spark_rows": len(sdf),
                "err": None,
            }
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"[FAIL] {name}: oracle error: {e}")
            records[name] = {"err": f"oracle: {e}"}
            continue

        s, o = canon(sdf), canon(odf)
        count_ok = len(s) == len(o)
        schema_ok = list(s.columns) == list(o.columns)
        hash_ok = count_ok and schema_ok and value_hash(s) == value_hash(o)
        ok = count_ok and schema_ok and hash_ok
        if not ok:
            failures += 1
        records[name] = {
            "rows_match": count_ok,
            "schema_match": schema_ok,
            "hash_match": hash_ok,
            "spark_rows": len(s),
            "oracle_rows": len(o),
            "err": None,
        }
        print(
            f"[{'ok' if ok else 'FAIL'}] {name}: rows={len(s)}/{len(o)} "
            f"schema={schema_ok} hash={hash_ok} ({time.time()-t0:.1f}s)"
        )
        if not ok:
            if not schema_ok:
                print(f"   spark cols : {list(s.columns)}")
                print(f"   oracle cols: {list(o.columns)}")
            elif count_ok:
                try:
                    neq = (s.fillna("§") != o.fillna("§")).any(axis=1)
                    print(s[neq].head(3).to_string())
                    print(o[neq].head(3).to_string())
                except Exception:  # noqa: BLE001
                    pass

    print(json.dumps({"failures": failures, "total": len(names)}))
    if args.json:
        Path(args.json).write_text(
            json.dumps(
                {
                    "sf_dir": args.sf,
                    "failures": failures,
                    "total": len(names),
                    "queries": records,
                },
                indent=2,
            )
        )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
