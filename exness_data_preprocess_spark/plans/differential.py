"""DuckDB-differential comparison helpers (shared by
scripts/check_correctness.py and the pytest suite).

Mirrors the round driver's correctness gate: row count + column names +
order-insensitive value hash over column-name-sorted, row-sorted frames.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

ORACLE_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows by all columns."""
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
            vals = np.where(np.isnan(vals), 0.0, np.round(vals, 9)) + 0.0
            h.update(vals.tobytes())
            h.update(s.isna().to_numpy().tobytes())
        else:
            h.update("\x1f".join("" if pd.isna(v) else str(v) for v in s).encode())
    return h.hexdigest()


def register_oracle_views(con, sf_dir: str) -> None:
    con.sql("SET TimeZone='UTC'")
    for t in ORACLE_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> tuple[bool, str]:
    s, o = canon(spark_df), canon(oracle_df)
    if len(s) != len(o):
        return False, f"row count {len(s)} != {len(o)}"
    if list(s.columns) != list(o.columns):
        return False, f"columns {list(s.columns)} != {list(o.columns)}"
    if value_hash(s) != value_hash(o):
        return False, "value hash mismatch"
    return True, "ok"
