"""User config-file behavior — mirrors the reference's config surface
(config.py:1-123): ~ expansion, closed-domain validation, missing-file
tolerance, and the defaults < config < explicit-args precedence in the
facade.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from exness_data_preprocess_spark.config import (
    UserConfig,
    get_default_config_path,
    load_config,
)


def write_yaml(tmp_path: Path, text: str) -> Path:
    p = tmp_path / "cfg.yaml"
    p.write_text(text, encoding="utf-8")
    return p


def test_default_config_path_is_home_dotfile():
    assert get_default_config_path() == Path.home() / ".exness-preprocess.yaml"


def test_missing_file_returns_none(tmp_path):
    assert load_config(tmp_path / "nope.yaml") is None


def test_load_full_config_expands_base_dir(tmp_path):
    cfg = load_config(
        write_yaml(
            tmp_path,
            "base_dir: ~/eon/exness-data\ndefault_pair: EURUSD\ndefault_timeframe: 1h\n",
        )
    )
    assert cfg is not None
    assert cfg.base_dir == (Path.home() / "eon" / "exness-data").resolve()
    assert cfg.base_dir.is_absolute()
    assert cfg.default_pair == "EURUSD"
    assert cfg.default_timeframe == "1h"


def test_partial_config_leaves_other_fields_none(tmp_path):
    cfg = load_config(write_yaml(tmp_path, "default_pair: gbpusd\n"))
    assert cfg.base_dir is None
    # pair is uppercased on validation like every API entry point
    assert cfg.default_pair == "GBPUSD"
    assert cfg.default_timeframe is None


def test_invalid_pair_rejected(tmp_path):
    with pytest.raises(ValueError, match="Invalid pair"):
        load_config(write_yaml(tmp_path, "default_pair: DOGEUSD\n"))


def test_invalid_timeframe_rejected(tmp_path):
    with pytest.raises(ValueError, match="Invalid timeframe"):
        load_config(write_yaml(tmp_path, "default_timeframe: 7m\n"))


def test_unknown_keys_ignored(tmp_path):
    # Pydantic's default extra='ignore' — unknown keys are not an error
    cfg = load_config(write_yaml(tmp_path, "default_pair: EURUSD\nfuture_knob: 3\n"))
    assert cfg.default_pair == "EURUSD"


def test_empty_file_yields_empty_config(tmp_path):
    cfg = load_config(write_yaml(tmp_path, "\n"))
    assert cfg == UserConfig()


def test_non_mapping_yaml_rejected(tmp_path):
    with pytest.raises(ValueError, match="YAML mapping"):
        load_config(write_yaml(tmp_path, "- a\n- b\n"))


def test_dict_round_trip(tmp_path):
    cfg = UserConfig(
        base_dir=tmp_path, default_pair="XAUUSD", default_timeframe="4h"
    )
    assert UserConfig.from_dict(cfg.to_dict()) == cfg


# ---------------------------------------------------------------------------
# Facade precedence: defaults < config < explicit args
# ---------------------------------------------------------------------------
@pytest.fixture()
def proc(spark, tmp_path):
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    cfg = UserConfig(
        base_dir=tmp_path / "store",
        default_pair="GBPUSD",
        default_timeframe="4h",
    )
    return SparkDataProcessor(spark, config=cfg)


def test_config_base_dir_used_when_no_arg(proc, tmp_path):
    assert proc.catalog.base == (tmp_path / "store").resolve()


def test_explicit_base_path_beats_config(spark, tmp_path):
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    cfg = UserConfig(base_dir=tmp_path / "from_config")
    p = SparkDataProcessor(spark, tmp_path / "explicit", config=cfg)
    assert p.catalog.base == tmp_path / "explicit"


def test_config_defaults_flow_into_queries(proc):
    assert proc._default_pair(None) == "GBPUSD"
    assert proc._default_timeframe(None) == "4h"
    # explicit args win
    assert proc._default_pair("EURUSD") == "EURUSD"
    assert proc._default_timeframe("1m") == "1m"


def test_builtin_defaults_without_config(spark, tmp_path):
    from exness_data_preprocess_spark.processor import SparkDataProcessor

    p = SparkDataProcessor(spark, tmp_path, config=UserConfig())
    assert p._default_pair(None) == "EURUSD"
    assert p._default_timeframe(None) == "1m"
