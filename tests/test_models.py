"""Type-domain and result-model unit tests — the Spark twin of the
reference's tests/test_types.py:14-236 and tests/test_models.py:18-331."""

import pandas as pd
import pytest

from exness_data_preprocess_spark.models import (
    TIMEFRAME_MINUTES,
    VALID_PAIRS,
    VALID_TIMEFRAMES,
    VALID_VARIANTS,
    CoverageInfo,
    CursorResult,
    DryRunResult,
    UpdateResult,
    validate_date,
    validate_pair,
    validate_timeframe,
    validate_variant,
)


class TestTypeDomains:
    def test_pairs_exact(self):
        assert VALID_PAIRS == (
            "EURUSD", "GBPUSD", "XAUUSD", "USDJPY", "AUDUSD",
            "USDCAD", "NZDUSD", "EURGBP", "EURJPY", "GBPJPY",
        )

    def test_timeframes_exact(self):
        assert VALID_TIMEFRAMES == ("1m", "5m", "15m", "30m", "1h", "4h", "1d")

    def test_variants_exact(self):
        assert VALID_VARIANTS == ("raw_spread", "standard")

    def test_timeframe_minutes(self):
        assert TIMEFRAME_MINUTES == {
            "1m": 1, "5m": 5, "15m": 15, "30m": 30,
            "1h": 60, "4h": 240, "1d": 1440,
        }

    def test_validate_pair_uppercases(self):
        assert validate_pair("eurusd") == "EURUSD"

    @pytest.mark.parametrize("bad", ["FAKE", "EUR", ""])
    def test_validate_pair_rejects(self, bad):
        with pytest.raises(ValueError):
            validate_pair(bad)

    def test_validate_timeframe_rejects(self):
        with pytest.raises(ValueError):
            validate_timeframe("2m")

    def test_validate_variant_rejects(self):
        with pytest.raises(ValueError):
            validate_variant("Raw_Spread")

    @pytest.mark.parametrize("bad", ["2024/01/01", "24-01-01", "not-a-date"])
    def test_validate_date_rejects(self, bad):
        with pytest.raises(ValueError):
            validate_date(bad)


class TestModels:
    def test_update_result_totals(self):
        r = UpdateResult(pair="EURUSD", ticks_added_raw=10, ticks_added_std=5)
        assert r.total_ticks_added == 15

    def test_update_result_rejects_negative(self):
        with pytest.raises(ValueError):
            UpdateResult(pair="EURUSD", ticks_added_raw=-1)

    def test_coverage_computed_fields(self):
        c = CoverageInfo(
            database="exness", storage_bytes=1000,
            raw_spread_ticks=60, standard_ticks=40, date_range_days=3,
        )
        assert c.total_ticks == 100
        assert c.storage_efficiency_bytes_per_tick == 10.0
        # exact reference formula (models.py:301-328): days/(days*0.69)*100
        assert c.coverage_percentage == pytest.approx(3 / (3 * 0.69) * 100)
        assert c.coverage_percentage == pytest.approx(144.9275362318841)
        assert c.storage_efficiency_mb_per_million_ticks == pytest.approx(
            (1000 / (1024 * 1024)) / 100 * 1_000_000
        )

    def test_coverage_zero_safe(self):
        c = CoverageInfo(database="exness")
        assert c.total_ticks == 0
        assert c.storage_efficiency_bytes_per_tick == 0.0
        assert c.coverage_percentage == 0.0

    def test_coverage_rejects_negative(self):
        with pytest.raises(ValueError):
            CoverageInfo(database="x", ohlc_bars=-5)

    def test_cursor_result_len(self):
        r = CursorResult(
            data=pd.DataFrame({"a": [1, 2]}), next_cursor=None,
            has_more=False, page_size=10,
        )
        assert len(r) == 2

    def test_dry_run_estimates(self):
        d = DryRunResult.estimate("EURUSD", [(2024, 1), (2024, 2)])
        assert d.month_count == 2
        assert d.estimated_ticks == 2 * 9_500_000 * 2
        assert d.estimated_size_mb == pytest.approx(22.0)  # x1: reference's flat MB model


class TestSerialization:
    """Dict/JSON round-trip + schema generation — the stdlib twin of the
    reference's Pydantic model_dump / model_dump_json / model_json_schema
    tests (reference tests/test_models.py:18-331)."""

    def test_update_result_dict_round_trip(self):
        r = UpdateResult(
            pair="EURUSD",
            months_added=[(2024, 1), (2024, 2)],
            ticks_added_raw=100_000,
            ticks_added_std=100_000,
            ohlc_bars_generated=5000,
            gaps_detected=2,
            duration_seconds=1.5,
        )
        d = r.to_dict()
        # computed properties appear in the dump, like @computed_field
        assert d["total_ticks_added"] == 200_000
        assert d["avg_ticks_per_month"] == 100_000.0
        assert UpdateResult.from_dict(d) == r

    def test_update_result_json_round_trip(self):
        r = UpdateResult(pair="EURUSD", months_added=[(2024, 3)],
                         ticks_added_raw=7)
        s = r.to_json()
        assert '"ticks_added_raw": 7' in s
        assert UpdateResult.from_json(s) == r

    def test_update_result_json_schema(self):
        schema = UpdateResult.json_schema()
        assert schema["type"] == "object"
        assert "pair" in schema["required"]
        assert schema["properties"]["pair"]["type"] == "string"
        assert schema["properties"]["ticks_added_raw"]["type"] == "integer"
        assert schema["properties"]["ticks_added_raw"]["minimum"] == 0
        assert schema["properties"]["duration_seconds"]["type"] == "number"

    def test_coverage_info_round_trip(self):
        c = CoverageInfo(
            database="exness", storage_bytes=2048, raw_spread_ticks=3,
            standard_ticks=4, ohlc_bars=2,
            earliest_date="2024-01-01 00:00:00",
            latest_date="2024-02-01 00:00:00", date_range_days=31,
        )
        d = c.to_dict()
        assert d["coverage_percentage"] == pytest.approx(144.9275362318841)
        assert CoverageInfo.from_dict(d) == c
        assert CoverageInfo.from_json(c.to_json()) == c
        assert CoverageInfo.json_schema()["properties"]["storage_bytes"]["minimum"] == 0

    def test_dry_run_round_trip(self):
        d = DryRunResult.estimate("XAUUSD", [(2025, 6)])
        back = DryRunResult.from_dict(d.to_dict())
        assert back == d
        assert d.to_dict()["month_count"] == 1

    def test_cursor_result_round_trip(self):
        r = CursorResult(
            data=pd.DataFrame({"bid": [1.1, 1.2], "ask": [1.2, 1.3]}),
            next_cursor="2024-01-01 00:00:05",
            has_more=True,
            page_size=2,
        )
        d = r.to_dict()
        assert d["data"] == [
            {"bid": 1.1, "ask": 1.2},
            {"bid": 1.2, "ask": 1.3},
        ]
        back = CursorResult.from_dict(d)
        assert back.next_cursor == r.next_cursor
        assert back.has_more is True
        pd.testing.assert_frame_equal(back.data, r.data)


class TestTableComments:
    """COMMENT metadata parity — the reference attaches table/column
    COMMENTs to all five tables (clickhouse_manager.py:110-269)."""

    def test_all_five_tables_have_comments(self):
        from exness_data_preprocess_spark.schema import (
            TABLE_COMMENTS,
            describe_table,
        )

        tables = ["raw_spread_ticks", "standard_ticks", "ohlc_1m",
                  "exchange_sessions", "holidays"]
        assert set(TABLE_COMMENTS) == set(tables)
        for t in tables:
            d = describe_table(t)
            assert d["comment"]
            assert all(c["comment"] for c in d["columns"]), t

    def test_ohlc_describe_covers_all_27_columns(self):
        from exness_data_preprocess_spark.schema import describe_table

        d = describe_table("ohlc_1m")
        assert len(d["columns"]) == 27
        names = [c["name"] for c in d["columns"]]
        assert "is_nyse_session" in names

    def test_with_comments_attaches_field_metadata(self):
        from exness_data_preprocess_spark.schema import TICK_SCHEMA, with_comments

        s = with_comments(TICK_SCHEMA, "raw_spread_ticks")
        assert s["timestamp"].metadata["comment"].startswith("event time")
        # type/nullability untouched
        assert s["timestamp"].dataType == TICK_SCHEMA["timestamp"].dataType


class TestPackageSurface:
    """The package root must expose the reference's one-for-one import
    surface (reference __init__.py:96-125)."""

    def test_top_level_exports(self):
        import exness_data_preprocess_spark as pkg

        for name in (
            "SparkDataProcessor", "SparkQueryEngine", "ParquetCatalog",
            "UpdateResult", "CoverageInfo", "CursorResult", "DryRunResult",
            "PairType", "TimeframeType", "VariantType",
            "supported_pairs", "supported_timeframes", "supported_variants",
            "load_config", "get_spark",
        ):
            assert hasattr(pkg, name), name

    def test_supported_domains(self):
        from exness_data_preprocess_spark import (
            supported_pairs,
            supported_timeframes,
            supported_variants,
        )

        assert "EURUSD" in supported_pairs()
        assert set(supported_timeframes()) == {
            "1m", "5m", "15m", "30m", "1h", "4h", "1d"
        }
        assert supported_variants() == ("raw_spread", "standard")


def test_oracle_inline_hash_fragments_match_canonical_rendering():
    """Every inline DuckDB md5-hash fragment in the plans must match the
    canonical rendering in functions.hashing (md5_h32_sql / md5_h60_sql)
    so the hash family cannot silently drift between the Spark side and
    a hand-written oracle (review find — the generated oracles now call
    the helpers; this pins the remaining static SQL literals)."""
    import re
    from pathlib import Path

    import exness_data_preprocess_spark.plans as plans

    pat = re.compile(
        r"'0x' \|\| substr\(md5\((.*?)\),\s*1,\s*(\d+)\)", re.S
    )
    seen = 0
    for p in Path(plans.__file__).parent.glob("*.py"):
        for m in pat.finditer(p.read_text()):
            seen += 1
            assert m.group(2) in ("8", "15"), (p.name, m.group(0))
    assert seen >= 9  # the static literals this test exists to guard
