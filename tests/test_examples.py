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
def test_sketch_monitoring_example_runs(spark, tmp_path, capsys):
    from examples.sketch_monitoring import main

    main(spark=spark, base_dir=tmp_path / "sketchmon")
    out = capsys.readouterr().out
    assert "streamed == batch for all" in out and "True" in out
    assert "done" in out
