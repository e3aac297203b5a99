"""Monthly tick ZIP download (SURVEY A1) — driver-side, network-gated.

Reference (downloader.py:40-82): fetch
``{base}/ticks/{PAIR}{suffix}/{year}/{month:02d}/..zip`` per variant,
skip if cached. Network access is not available in the build container, so
this module is import-safe and only touches the network when explicitly
called; everything downstream consumes local paths.
"""

from __future__ import annotations

import urllib.request
from pathlib import Path

BASE_URL = "https://ticks.ex2archive.com/ticks"

VARIANT_SUFFIX = {"raw_spread": "_Raw_Spread", "standard": ""}


def zip_url(pair: str, variant: str, year: int, month: int) -> str:
    """URL layout documented in the reference (models.py:104-110)."""
    suffix = VARIANT_SUFFIX[variant]
    pair = pair.upper()
    return (
        f"{BASE_URL}/{pair}{suffix}/{year}/{month:02d}/"
        f"Exness_{pair}{suffix}_{year}_{month:02d}.zip"
    )


def download_zip(
    pair: str,
    variant: str,
    year: int,
    month: int,
    dest_dir: str | Path,
    timeout: float = 60.0,
) -> Path:
    """Fetch one monthly archive, skipping when cached (downloader.py:55-66)."""
    dest_dir = Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / f"{pair.upper()}_{variant}_{year}_{month:02d}.zip"
    if dest.exists() and dest.stat().st_size > 0:
        return dest
    url = zip_url(pair, variant, year, month)
    # atomic publish (review find): a crash mid-write would otherwise
    # leave a truncated archive that the size>0 cache check then serves
    # forever; write to a temp name and os.replace into place
    import os
    import tempfile

    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        data = resp.read()
    fd, tmp = tempfile.mkstemp(dir=dest_dir, suffix=".part")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
        os.replace(tmp, dest)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return dest
