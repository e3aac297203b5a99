"""Smoke-run the onboarding examples (reference examples/ parity): both
scripts must execute end-to-end offline against the synthetic fetcher,
leaving a queryable warehouse behind."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.smoke
def test_basic_usage_example_runs(spark, tmp_path, capsys):
    from examples.basic_usage import main

    main(base_dir=tmp_path / "demo", spark=spark)
    out = capsys.readouterr().out
    assert "Example 7" in out and "done" in out
    # the run left real data behind
    assert any((tmp_path / "demo" / "ohlc_1m").rglob("*.parquet"))


@pytest.mark.smoke
def test_batch_processing_example_runs(spark, tmp_path, capsys):
    from examples.batch_processing import main

    main(base_dir=tmp_path / "batch", spark=spark)
    out = capsys.readouterr().out
    assert "Coverage report" in out and "done" in out
    # multiple instruments in one warehouse
    for pair in ("EURUSD", "GBPUSD", "XAUUSD", "USDJPY"):
        assert any(
            (tmp_path / "batch" / "raw_spread_ticks").rglob(
                f"instrument={pair}/**/*.parquet"
            )
        ), pair


@pytest.mark.smoke
def test_corpus_curation_example_runs(spark, tmp_path, capsys):
    from examples.corpus_curation import main

    main(spark=spark, base_dir=str(tmp_path / "curation"))
    out = capsys.readouterr().out
    assert "Example 6" in out and "done" in out
    assert "admitted" in out  # the ingest gate actually ran


@pytest.mark.smoke
def test_corpus_analysis_example_runs(spark, capsys):
    from examples.corpus_analysis import main

    main(spark=spark)
    out = capsys.readouterr().out
    assert "least-novel docs" in out
    assert "mean unigram entropy" in out
    assert "near-dup pairs >= 0.5" in out
    assert "RESULT: PASSED" in out  # validate_against_source end-to-end


@pytest.mark.smoke
def test_research_analyses_example_runs(spark, capsys):
    from examples.research_analyses import main

    main(spark=spark, sf="/root/testdata/sf0.01")
    out = capsys.readouterr().out
    assert "daily extremes" in out
    assert "volatility persistence" in out
    # the Chow test section ran to a verdict (enough months at sf0.01)
    assert "Chow test @" in out and "regime_shift=" in out
    assert "research analyses done" in out


def test_f_survival_function_reference_values():
    """The example's scipy-free F sf matches independent numerical
    integration of the F density (np.trapz over 2e7 points, truncated
    tail < 1e-7) on pinned (f, d1, d2) points, and the exact
    F(1,d) = t(d)^2 correspondence hand-derivations."""
    from examples.research_analyses import _f_sf

    assert abs(_f_sf(4.0, 1, 10) - 0.0733880348) < 1e-7
    assert abs(_f_sf(1.0, 1, 10) - 0.3408931335) < 1e-7
    assert abs(_f_sf(10.0, 1, 5) - 0.0250310051) < 1e-7
    assert _f_sf(0.0, 1, 10) == 1.0
    assert _f_sf(1e9, 1, 10) < 1e-30
    # review find (reproduced live): x exactly at the CF switchover with
    # a == b mutually recursed forever; F(1; 2, 2) sits exactly there and
    # has the closed form sf = d2/(d2 + d1*f) = 0.5
    assert abs(_f_sf(1.0, 2, 2) - 0.5) < 1e-12


@pytest.mark.smoke
def test_sketch_monitoring_example_runs(spark, tmp_path, capsys):
    from examples.sketch_monitoring import main

    main(spark=spark, base_dir=tmp_path / "sketchmon")
    out = capsys.readouterr().out
    assert "streamed == batch for all" in out and "True" in out
    import re

    assert "persisted SketchIndex" in out
    m = re.search(r"persisted SketchIndex .*: (True|False)", out)
    assert m and m.group(1) == "True"
    assert "done" in out
