"""Driver-contract regression: every registry query runs at sf0.001 and
hash-matches its DuckDB oracle (the same differential the round driver
executes at sf0.01)."""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from exness_data_preprocess_spark.plans.differential import (  # noqa: E402
    frames_match,
    register_oracle_views,
)
from exness_data_preprocess_spark.plans.registry import QUERIES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    register_oracle_views(con, SF_DIR)
    return con


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_contract_completeness():
    import __spark_entry__ as mod

    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 28


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, name):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF_DIR).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only contract
        return
    odf = oracle.sql(spec.oracle).df()
    ok, why = frames_match(sdf, odf)
    assert ok, f"{name}: {why} (spark={len(sdf)} rows, oracle={len(odf)} rows)"
