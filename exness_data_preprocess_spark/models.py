"""Typed result models and closed value domains.

Reference models are Pydantic (models.py:125-501); we use stdlib dataclasses
with the same fields, computed properties, and ``ge=0``-style validation so
the package has zero non-baked-in dependencies. Literal domains replicate
models.py:63-101 exactly (10 pairs / 7 timeframes / 2 variants).
"""

from __future__ import annotations

import json
from dataclasses import MISSING, dataclass, field, fields
from typing import Any, ClassVar, Iterator, Literal, get_args

import pandas as pd

PairType = Literal[
    "EURUSD",
    "GBPUSD",
    "XAUUSD",
    "USDJPY",
    "AUDUSD",
    "USDCAD",
    "NZDUSD",
    "EURGBP",
    "EURJPY",
    "GBPJPY",
]

TimeframeType = Literal["1m", "5m", "15m", "30m", "1h", "4h", "1d"]

VariantType = Literal["raw_spread", "standard"]

VALID_PAIRS: tuple[str, ...] = get_args(PairType)
VALID_TIMEFRAMES: tuple[str, ...] = get_args(TimeframeType)
VALID_VARIANTS: tuple[str, ...] = get_args(VariantType)

# Timeframe -> minutes (clickhouse_query_engine.py:176-190)
TIMEFRAME_MINUTES: dict[str, int] = {
    "1m": 1,
    "5m": 5,
    "15m": 15,
    "30m": 30,
    "1h": 60,
    "4h": 240,
    "1d": 1440,
}


def validate_pair(pair: str) -> str:
    """Uppercase + closed-domain check (processor.py:221-236)."""
    p = pair.upper()
    if p not in VALID_PAIRS:
        raise ValueError(f"Invalid pair: {pair}. Valid pairs: {', '.join(VALID_PAIRS)}")
    return p


def validate_timeframe(timeframe: str) -> str:
    if timeframe not in VALID_TIMEFRAMES:
        raise ValueError(
            f"Invalid timeframe: {timeframe}. Valid: {', '.join(VALID_TIMEFRAMES)}"
        )
    return timeframe


def validate_variant(variant: str) -> str:
    if variant not in VALID_VARIANTS:
        raise ValueError(
            f"Invalid variant: {variant}. Valid: {', '.join(VALID_VARIANTS)}"
        )
    return variant


def validate_date(date_str: str, name: str = "date") -> str:
    """YYYY-MM-DD format check (processor.py:238-262)."""
    try:
        pd.Timestamp(date_str)
    except Exception as exc:  # noqa: BLE001
        raise ValueError(f"Invalid {name}: {date_str!r} (expected YYYY-MM-DD)") from exc
    if len(date_str) != 10 or date_str[4] != "-" or date_str[7] != "-":
        raise ValueError(f"Invalid {name}: {date_str!r} (expected YYYY-MM-DD)")
    return date_str


def _require_non_negative(**kwargs: int | float | None) -> None:
    for name, value in kwargs.items():
        if value is not None and value < 0:
            raise ValueError(f"{name} must be >= 0, got {value}")


_JSON_TYPES = {
    "str": "string",
    "int": "integer",
    "float": "number",
    "bool": "boolean",
}


class _Serializable:
    """Dict/JSON round-trip + JSON-schema generation for the dataclass
    result models — the stdlib twin of what the reference's Pydantic
    models expose via ``model_dump()`` / ``model_dump_json()`` /
    ``model_json_schema()`` (exercised by reference tests/test_models.py:
    18-331).

    - ``to_dict()`` includes computed properties (``_COMPUTED``), like
      Pydantic's ``@computed_field`` members appear in ``model_dump()``.
    - ``from_dict()`` ignores computed/unknown keys, so
      ``from_dict(to_dict())`` round-trips.
    - ``json_schema()`` emits properties/required/type plus ``minimum: 0``
      for the ge=0-constrained fields (``_NON_NEGATIVE``).
    """

    _COMPUTED: tuple[str, ...] = ()
    _NON_NEGATIVE: tuple[str, ...] = ()

    @staticmethod
    def _encode(value: Any) -> Any:
        if isinstance(value, pd.DataFrame):
            return value.to_dict("records")
        if isinstance(value, tuple):
            return list(value)
        if isinstance(value, list):
            return [_Serializable._encode(v) for v in value]
        return value

    @classmethod
    def _decode_field(cls, name: str, value: Any) -> Any:
        return value

    def to_dict(self) -> dict[str, Any]:
        out = {f.name: self._encode(getattr(self, f.name)) for f in fields(self)}
        for name in self._COMPUTED:
            out[name] = getattr(self, name)
        return out

    @classmethod
    def from_dict(cls, data: dict[str, Any]):
        names = {f.name for f in fields(cls)}
        return cls(
            **{k: cls._decode_field(k, v) for k, v in data.items() if k in names}
        )

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), default=str)

    @classmethod
    def from_json(cls, text: str):
        return cls.from_dict(json.loads(text))

    @classmethod
    def json_schema(cls) -> dict[str, Any]:
        props: dict[str, Any] = {}
        required: list[str] = []
        for f in fields(cls):
            ann = f.type if isinstance(f.type, str) else getattr(f.type, "__name__", "")
            base = ann.split("|")[0].strip()
            prop: dict[str, Any] = {"type": _JSON_TYPES.get(base, "object")}
            if f.name in cls._NON_NEGATIVE:
                prop["minimum"] = 0
            props[f.name] = prop
            if f.default is MISSING and f.default_factory is MISSING:
                required.append(f.name)
        return {
            "title": cls.__name__,
            "type": "object",
            "properties": props,
            "required": required,
        }


@dataclass
class UpdateResult(_Serializable):
    """Outcome of an incremental data update (models.py:125-223)."""

    pair: str
    months_added: list[tuple[int, int]] = field(default_factory=list)
    ticks_added_raw: int = 0
    ticks_added_std: int = 0
    ohlc_bars_generated: int = 0
    gaps_detected: int = 0
    duration_seconds: float = 0.0

    _COMPUTED = ("total_ticks_added", "avg_ticks_per_month")
    _NON_NEGATIVE = (
        "ticks_added_raw",
        "ticks_added_std",
        "ohlc_bars_generated",
        "gaps_detected",
        "duration_seconds",
    )

    def __post_init__(self) -> None:
        _require_non_negative(
            ticks_added_raw=self.ticks_added_raw,
            ticks_added_std=self.ticks_added_std,
            ohlc_bars_generated=self.ohlc_bars_generated,
            gaps_detected=self.gaps_detected,
            duration_seconds=self.duration_seconds,
        )

    @classmethod
    def _decode_field(cls, name: str, value: Any) -> Any:
        if name == "months_added":
            return [tuple(m) for m in value]
        return value

    @property
    def total_ticks_added(self) -> int:
        return self.ticks_added_raw + self.ticks_added_std

    @property
    def avg_ticks_per_month(self) -> float:
        """Computed field (models.py:171-189): 0.0 when nothing was added."""
        if not self.months_added:
            return 0.0
        return self.total_ticks_added / len(self.months_added)


@dataclass
class CoverageInfo(_Serializable):
    """Storage/coverage stats for one instrument (models.py:226-365)."""

    database: str
    storage_bytes: int = 0
    raw_spread_ticks: int = 0
    standard_ticks: int = 0
    ohlc_bars: int = 0
    earliest_date: str | None = None
    latest_date: str | None = None
    date_range_days: int = 0

    _COMPUTED = (
        "total_ticks",
        "coverage_percentage",
        "storage_efficiency_mb_per_million_ticks",
    )
    _NON_NEGATIVE = (
        "storage_bytes",
        "raw_spread_ticks",
        "standard_ticks",
        "ohlc_bars",
        "date_range_days",
    )

    def __post_init__(self) -> None:
        _require_non_negative(
            storage_bytes=self.storage_bytes,
            raw_spread_ticks=self.raw_spread_ticks,
            standard_ticks=self.standard_ticks,
            ohlc_bars=self.ohlc_bars,
            date_range_days=self.date_range_days,
        )

    @property
    def total_ticks(self) -> int:
        """Computed field (models.py:285-299)."""
        return self.raw_spread_ticks + self.standard_ticks

    @property
    def coverage_percentage(self) -> float:
        """Exact parity with the reference formula (models.py:301-328):
        ``date_range_days / (date_range_days * 0.69) * 100`` — which
        algebraically reduces to a constant ≈144.93% whenever any data
        exists. The reference intends "actual days / expected trading
        days (252/365 ≈ 0.69)" but uses the calendar-day span for the
        numerator, so the ratio degenerates; we reproduce it bit-for-bit
        (values >100% are even documented there as "full coverage
        including weekends/holidays"). 0.0 when no data.
        """
        if self.date_range_days == 0:
            return 0.0
        expected_trading_days = self.date_range_days * 0.69
        if expected_trading_days <= 0:
            return 0.0
        return (self.date_range_days / expected_trading_days) * 100

    @property
    def storage_efficiency_mb_per_million_ticks(self) -> float:
        """Computed field (models.py:330-348): MB per million ticks."""
        if self.total_ticks == 0:
            return 0.0
        storage_mb = self.storage_bytes / (1024 * 1024)
        return (storage_mb / self.total_ticks) * 1_000_000

    @property
    def storage_efficiency_bytes_per_tick(self) -> float:
        """Convenience twin in raw bytes (not in the reference)."""
        if self.total_ticks == 0:
            return 0.0
        return self.storage_bytes / self.total_ticks


@dataclass
class CursorResult(_Serializable):
    """One page of keyset pagination (models.py:368-412)."""

    data: pd.DataFrame
    next_cursor: str | None
    has_more: bool
    page_size: int

    _NON_NEGATIVE = ("page_size",)

    def __post_init__(self) -> None:
        _require_non_negative(page_size=self.page_size)

    @classmethod
    def _decode_field(cls, name: str, value: Any) -> Any:
        if name == "data" and not isinstance(value, pd.DataFrame):
            return pd.DataFrame(value)
        return value

    def __len__(self) -> int:
        return len(self.data)


@dataclass
class DryRunResult(_Serializable):
    """Estimation-only update preview (models.py:415-501).

    Constant factors replicate processor.py:356-377: ~9.5M ticks and ~11 MB
    per month per variant.
    """

    pair: str
    months_to_download: list[tuple[int, int]] = field(default_factory=list)
    estimated_ticks: int = 0
    estimated_size_mb: float = 0.0
    estimated_duration_seconds: float = 0.0

    # ClassVar (review find): a bare annotation made these dataclass
    # FIELDS — serialized by to_dict()/json_schema() and overridable per
    # instance via from_dict, unlike the reference's constants
    TICKS_PER_MONTH: ClassVar[int] = 9_500_000
    MB_PER_MONTH: ClassVar[float] = 11.0

    _COMPUTED = ("month_count",)
    _NON_NEGATIVE = (
        "estimated_ticks",
        "estimated_size_mb",
        "estimated_duration_seconds",
    )

    def __post_init__(self) -> None:
        _require_non_negative(
            estimated_ticks=self.estimated_ticks,
            estimated_size_mb=self.estimated_size_mb,
            estimated_duration_seconds=self.estimated_duration_seconds,
        )

    @classmethod
    def _decode_field(cls, name: str, value: Any) -> Any:
        if name == "months_to_download":
            return [tuple(m) for m in value]
        return value

    @classmethod
    def estimate(cls, pair: str, months: list[tuple[int, int]]) -> "DryRunResult":
        n = len(months)
        return cls(
            pair=pair,
            months_to_download=months,
            # reference parity quirk, kept bit-for-bit: ticks are
            # estimated for BOTH variants (x2) but size is a flat 11
            # MB/month total (x1) — processor.py:359-371's exact model
            estimated_ticks=n * cls.TICKS_PER_MONTH * 2,  # both variants
            estimated_size_mb=n * cls.MB_PER_MONTH,
            estimated_duration_seconds=n * 6.0,
        )

    @property
    def month_count(self) -> int:
        return len(self.months_to_download)


@dataclass
class SourceValidationResult(_Serializable):
    """Outcome of one external-oracle validation day — the typed twin of
    the reference's ``ValidationResult`` (scripts/validate_migration_data.py:
    74-135): the ORIGINAL exness archive is the oracle the store is
    diffed against.

    Pass criteria (validate_migration_data.py:425-473): row-count
    difference ≤ ``row_tolerance_pct`` (dedup slack), ZERO bid/ask
    mismatches beyond ``price_tolerance``, and exact min/max timestamp
    agreement. ``error_message`` concatenates every failed criterion.
    """

    pair: str
    day: str
    variant: str
    source_row_count: int = 0
    store_row_count: int = 0
    matching_rows: int = 0
    only_in_source: int = 0
    only_in_store: int = 0
    bid_mismatch_count: int = 0
    ask_mismatch_count: int = 0
    source_min_ts: str | None = None
    source_max_ts: str | None = None
    store_min_ts: str | None = None
    store_max_ts: str | None = None
    mismatch_samples: list[dict] = field(default_factory=list)
    price_tolerance: float = 1e-10
    row_tolerance_pct: float = 0.1
    passed: bool = False
    error_message: str = ""

    @property
    def row_count_diff_pct(self) -> float:
        if self.source_row_count == 0:
            return 0.0
        return (
            abs(self.source_row_count - self.store_row_count)
            / self.source_row_count
            * 100.0
        )

    _COMPUTED = ("row_count_diff_pct",)

    def summary(self) -> str:
        """Human-readable block, shaped like the reference's summary()."""
        lines = [
            "=" * 60,
            "SOURCE VALIDATION SUMMARY",
            f"Pair: {self.pair}  Day: {self.day}  Variant: {self.variant}",
            "-" * 60,
            f"  Source archive: {self.source_row_count:,} rows "
            f"[{self.source_min_ts} .. {self.source_max_ts}]",
            f"  Store:          {self.store_row_count:,} rows "
            f"[{self.store_min_ts} .. {self.store_max_ts}]",
            f"  Count diff:     {self.row_count_diff_pct:.3f}% "
            f"(tolerance {self.row_tolerance_pct}%)",
            f"  Matching keys:  {self.matching_rows:,}  "
            f"(source-only {self.only_in_source:,}, "
            f"store-only {self.only_in_store:,})",
            f"  Price mismatches > {self.price_tolerance}: "
            f"bid {self.bid_mismatch_count:,}, ask {self.ask_mismatch_count:,}",
            "-" * 60,
            "RESULT: PASSED" if self.passed
            else f"RESULT: FAILED - {self.error_message}",
            "=" * 60,
        ]
        return "\n".join(lines)


@dataclass
class BatchIterator:
    """Wrapper over the batch generator (F4, clickhouse_query_engine.py:474-534)."""

    batches: Iterator[pd.DataFrame]

    def __iter__(self) -> Iterator[pd.DataFrame]:
        return self.batches


# ---------------------------------------------------------------------------
# Domain helper functions (reference models.py:509-560)
# ---------------------------------------------------------------------------
def supported_pairs() -> tuple[str, ...]:
    """All supported currency pairs (reference models.py:509-525)."""
    from typing import get_args

    return get_args(PairType)


def supported_timeframes() -> tuple[str, ...]:
    """All supported OHLC timeframes (reference models.py:527-543)."""
    from typing import get_args

    return get_args(TimeframeType)


def supported_variants() -> tuple[str, ...]:
    """All supported data variants (reference models.py:545-560)."""
    from typing import get_args

    return get_args(VariantType)
