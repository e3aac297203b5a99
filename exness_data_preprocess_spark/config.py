"""User config-file support — Spark twin of the reference's ``config.py``
(config.py:1-123).

Loads user preferences from ``~/.exness-preprocess.yaml``. Values override
built-in defaults but are overridden by explicit arguments (defaults <
config file < explicit args — the reference's CLI precedence).

Example config file::

    base_dir: ~/eon/exness-data
    default_pair: EURUSD
    default_timeframe: 1h

The reference validates with Pydantic; we use a stdlib dataclass with the
same field set, ``~``-expansion, closed-domain validation, and unknown-key
tolerance (Pydantic's default ``extra='ignore'``), keeping the package
free of non-baked-in dependencies. YAML parsing is feature-gated on
``yaml`` being importable.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

from exness_data_preprocess_spark.models import (
    validate_pair,
    validate_timeframe,
)

_CONFIG_FIELDS = ("base_dir", "default_pair", "default_timeframe")


@dataclass(frozen=True)
class UserConfig:
    """Validated user configuration (reference ``ConfigModel``,
    config.py:27-74).

    - ``base_dir``: storage root; ``~`` expanded and resolved to absolute
      (reference ``expand_base_dir`` validator, config.py:56-62).
    - ``default_pair`` / ``default_timeframe``: closed-domain validated on
      construction (Literal types in the reference).
    """

    base_dir: Path | None = None
    default_pair: str | None = None
    default_timeframe: str | None = None

    def __post_init__(self) -> None:
        if self.base_dir is not None:
            object.__setattr__(
                self, "base_dir", Path(self.base_dir).expanduser().resolve()
            )
        if self.default_pair is not None:
            object.__setattr__(self, "default_pair", validate_pair(self.default_pair))
        if self.default_timeframe is not None:
            validate_timeframe(self.default_timeframe)

    # dict round-trip (reference models expose .model_dump()/ctor kwargs)
    def to_dict(self) -> dict[str, Any]:
        return {
            "base_dir": str(self.base_dir) if self.base_dir else None,
            "default_pair": self.default_pair,
            "default_timeframe": self.default_timeframe,
        }

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "UserConfig":
        # tolerate unknown keys, like Pydantic's default extra='ignore'
        return cls(**{k: data.get(k) for k in _CONFIG_FIELDS})


def get_default_config_path() -> Path:
    """``~/.exness-preprocess.yaml`` (reference config.py:77-88)."""
    return Path.home() / ".exness-preprocess.yaml"


def load_config(path: Path | str | None = None) -> UserConfig | None:
    """Load + validate the config file (reference config.py:91-123).

    Returns ``None`` when the file does not exist (not an error); raises
    on invalid YAML or invalid field values.
    """
    config_path = Path(path) if path else get_default_config_path()
    if not config_path.exists():
        return None
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover - yaml is baked in
        raise RuntimeError(
            "PyYAML is required to read the user config file"
        ) from exc
    with open(config_path, "r", encoding="utf-8") as f:
        data = yaml.safe_load(f)
    if data is None:
        return UserConfig()
    if not isinstance(data, dict):
        raise ValueError(
            f"Config file {config_path} must be a YAML mapping, got {type(data).__name__}"
        )
    return UserConfig.from_dict(data)
