#!/usr/bin/env python
"""Local differential checker mimicking the round driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value hash (columns sorted
by name, rows sorted by all columns, values stringified with float
canonicalization).

Usage: python scripts/check_correctness.py [--sf /root/testdata/sf0.01] [-q name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes for comparison."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_object_dtype(s) or isinstance(
            s.dtype, pd.CategoricalDtype
        ):
            df[c] = s.astype(str)
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    except Exception:
        df = df.reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            vals = s.to_numpy(dtype="float64")
            vals = np.where(np.isnan(vals), 0.0, np.round(vals, 9))
            # canonicalize -0.0
            vals = vals + 0.0
            h.update(vals.tobytes())
            h.update(s.isna().to_numpy().tobytes())
        else:
            h.update("\x1f".join("" if pd.isna(v) else str(v) for v in s).encode())
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--queries", nargs="*", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from exness_data_preprocess_spark import get_spark

    spark = get_spark("correctness", extra_conf={"spark.driver.memory": "8g"})

    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.queries or list(queries)

    results = {}
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:500]}
            failures += 1
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in oracles:
            results[name] = {
                "status": "ROWS_ONLY",
                "rows": len(sdf),
                "sec": round(time.time() - t0, 2),
            }
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:500]}
            failures += 1
            print(f"[FAIL] {name}: oracle error: {e}")
            continue

        s, o = canon(sdf), canon(odf)
        count_ok = len(s) == len(o)
        schema_ok = list(s.columns) == list(o.columns)
        hash_ok = count_ok and schema_ok and value_hash(s) == value_hash(o)
        status = "OK" if (count_ok and schema_ok and hash_ok) else "MISMATCH"
        if status != "OK":
            failures += 1
        results[name] = {
            "status": status,
            "rows": (len(s), len(o)),
            "count_ok": count_ok,
            "schema_ok": schema_ok,
            "hash_ok": hash_ok,
            "sec": round(time.time() - t0, 2),
        }
        mark = "ok" if status == "OK" else "FAIL"
        print(f"[{mark}] {name}: rows={len(s)}/{len(o)} schema={schema_ok} hash={hash_ok}")
        if status != "OK":
            if not schema_ok:
                print(f"   spark cols : {list(s.columns)}")
                print(f"   oracle cols: {list(o.columns)}")
            if count_ok and schema_ok and not hash_ok:
                # show first differing rows for debugging
                try:
                    neq = (s.fillna("§") != o.fillna("§")).any(axis=1)
                    print(s[neq].head(3).to_string())
                    print(o[neq].head(3).to_string())
                except Exception:
                    pass

    print(json.dumps({"failures": failures, "total": len(names)}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
