"""Static registry of the 10 exchanges whose trading sessions enrich OHLC bars.

Same public-knowledge facts (MIC codes, IANA timezones, regular trading
hours) as the reference registry (exchanges.py:53-166). Hours are local
exchange time; lunch breaks for the Asian venues are carried here too so the
rule-based calendar fallback (operators/sessions.py) can honor them the way
``exchange_calendars.is_open_on_minute`` does in the reference
(session_detector.py:94-120).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExchangeConfig:
    code: str  # ISO 10383 MIC
    name: str
    currency: str
    timezone: str  # IANA
    country: str
    open_hour: int
    open_minute: int
    close_hour: int
    close_minute: int
    # (start_hour, start_minute, end_hour, end_minute) local time, or None
    lunch_break: tuple[int, int, int, int] | None = field(default=None)
    # Dated changes to the regular close: ((effective_from_iso, hour,
    # minute), ...) applied in order — real exchanges amend their hours
    # (review find: TSE moved its cash close 15:00 → 15:30 on
    # 2024-11-05, so a single static close mislabels every bar in the
    # extended half hour after that date). base close_hour/minute are
    # the hours BEFORE the first change.
    close_changes: tuple = field(default=())

    def close_on(self, d) -> tuple[int, int]:
        """(hour, minute) of the regular close in effect on local date
        ``d`` (datetime.date)."""
        h, m = self.close_hour, self.close_minute
        for eff, ch, cm in self.close_changes:
            import datetime as _dt

            if d >= _dt.date.fromisoformat(eff):
                h, m = ch, cm
        return h, m


EXCHANGES: dict[str, ExchangeConfig] = {
    "nyse": ExchangeConfig("XNYS", "New York Stock Exchange", "USD",
                           "America/New_York", "United States", 9, 30, 16, 0),
    "lse": ExchangeConfig("XLON", "London Stock Exchange", "GBP",
                          "Europe/London", "United Kingdom", 8, 0, 16, 30),
    "xswx": ExchangeConfig("XSWX", "SIX Swiss Exchange", "CHF",
                           "Europe/Zurich", "Switzerland", 9, 0, 17, 30),
    "xfra": ExchangeConfig("XFRA", "Frankfurt Stock Exchange", "EUR",
                           "Europe/Berlin", "Germany", 9, 0, 17, 30),
    "xtse": ExchangeConfig("XTSE", "Toronto Stock Exchange", "CAD",
                           "America/Toronto", "Canada", 9, 30, 16, 0),
    "xnze": ExchangeConfig("XNZE", "New Zealand Exchange", "NZD",
                           "Pacific/Auckland", "New Zealand", 10, 0, 16, 45),
    "xtks": ExchangeConfig("XTKS", "Tokyo Stock Exchange", "JPY",
                           "Asia/Tokyo", "Japan", 9, 0, 15, 0,
                           lunch_break=(11, 30, 12, 30),
                           # cash session extended to 15:30 (TSE "extension
                           # of trading hours", effective 2024-11-05)
                           close_changes=(("2024-11-05", 15, 30),)),
    "xasx": ExchangeConfig("XASX", "Australian Securities Exchange", "AUD",
                           "Australia/Sydney", "Australia", 10, 0, 16, 0),
    "xhkg": ExchangeConfig("XHKG", "Hong Kong Stock Exchange", "HKD",
                           "Asia/Hong_Kong", "Hong Kong", 9, 30, 16, 0,
                           lunch_break=(12, 0, 13, 0)),
    "xses": ExchangeConfig("XSES", "Singapore Exchange", "SGD",
                           "Asia/Singapore", "Singapore", 9, 0, 17, 0,
                           lunch_break=(12, 0, 13, 0)),
}


def get_exchange_names() -> list[str]:
    """Registry keys, in declaration order (drives the 10 flag columns)."""
    return list(EXCHANGES.keys())


def get_exchange_config(name: str) -> ExchangeConfig:
    """Lookup with explicit error, no fallback (exchanges.py:188-212)."""
    if name not in EXCHANGES:
        available = ", ".join(EXCHANGES.keys())
        raise ValueError(f"Unknown exchange: {name}. Available: {available}")
    return EXCHANGES[name]


SESSION_FLAG_COLUMNS: list[str] = [f"is_{n}_session" for n in EXCHANGES]
