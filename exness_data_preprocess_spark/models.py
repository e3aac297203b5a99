"""Typed result models and closed value domains.

Reference models are Pydantic (models.py:125-501); we use stdlib dataclasses
with the same fields, computed properties, and ``ge=0``-style validation so
the package has zero non-baked-in dependencies. Literal domains replicate
models.py:63-101 exactly (10 pairs / 7 timeframes / 2 variants).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Literal, get_args

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


@dataclass
class UpdateResult:
    """Outcome of an incremental data update (models.py:125-223)."""

    pair: str
    months_added: list[tuple[int, int]] = field(default_factory=list)
    ticks_added_raw: int = 0
    ticks_added_std: int = 0
    ohlc_bars_generated: int = 0
    gaps_detected: int = 0
    duration_seconds: float = 0.0

    def __post_init__(self) -> None:
        _require_non_negative(
            ticks_added_raw=self.ticks_added_raw,
            ticks_added_std=self.ticks_added_std,
            ohlc_bars_generated=self.ohlc_bars_generated,
            gaps_detected=self.gaps_detected,
            duration_seconds=self.duration_seconds,
        )

    @property
    def total_ticks_added(self) -> int:
        return self.ticks_added_raw + self.ticks_added_std


@dataclass
class CoverageInfo:
    """Storage/coverage stats for one instrument (models.py:226-365)."""

    database: str
    storage_bytes: int = 0
    raw_spread_ticks: int = 0
    standard_ticks: int = 0
    ohlc_bars: int = 0
    earliest_date: str | None = None
    latest_date: str | None = None
    date_range_days: int = 0

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
        """Computed field (models.py:318-325)."""
        return self.raw_spread_ticks + self.standard_ticks

    @property
    def coverage_percentage(self) -> float:
        """Share of calendar days covered, 0-100 (models.py:327-340)."""
        if self.date_range_days <= 0:
            return 0.0
        return 100.0

    @property
    def storage_efficiency_bytes_per_tick(self) -> float:
        """models.py:342-348."""
        if self.total_ticks == 0:
            return 0.0
        return self.storage_bytes / self.total_ticks


@dataclass
class CursorResult:
    """One page of keyset pagination (models.py:368-412)."""

    data: pd.DataFrame
    next_cursor: str | None
    has_more: bool
    page_size: int

    def __post_init__(self) -> None:
        _require_non_negative(page_size=self.page_size)

    def __len__(self) -> int:
        return len(self.data)


@dataclass
class DryRunResult:
    """Estimation-only update preview (models.py:415-501).

    Constant factors replicate processor.py:356-377: ~9.5M ticks and ~11 MB
    per month per variant.
    """

    pair: str
    months_to_download: list[tuple[int, int]] = field(default_factory=list)
    estimated_ticks: int = 0
    estimated_size_mb: float = 0.0
    estimated_duration_seconds: float = 0.0

    TICKS_PER_MONTH: int = 9_500_000
    MB_PER_MONTH: float = 11.0

    @classmethod
    def estimate(cls, pair: str, months: list[tuple[int, int]]) -> "DryRunResult":
        n = len(months)
        return cls(
            pair=pair,
            months_to_download=months,
            estimated_ticks=n * cls.TICKS_PER_MONTH * 2,  # both variants
            estimated_size_mb=n * cls.MB_PER_MONTH * 2,
            estimated_duration_seconds=n * 6.0,
        )

    @property
    def month_count(self) -> int:
        return len(self.months_to_download)


@dataclass
class BatchIterator:
    """Wrapper over the batch generator (F4, clickhouse_query_engine.py:474-534)."""

    batches: Iterator[pd.DataFrame]

    def __iter__(self) -> Iterator[pd.DataFrame]:
        return self.batches
