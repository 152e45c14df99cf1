"""Date standardization kernel.

Reproduces the reference's multi-format date parser
(/root/reference/scripts/data/clean_dataset.py:65-97): try a fixed list
of formats in order, emit ``YYYY-MM-DD``; unparseable input returns ""
(the reference records a MISSING_FIELD issue and keeps the row).
"""

from __future__ import annotations

from datetime import datetime

DATE_FORMATS = (
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%d/%m/%Y",
    "%Y.%m.%d",
    "%Y年%m月%d日",
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d %H:%M:%S",
)


def standardize_date(raw: str) -> str:
    """Multi-format parse -> 'YYYY-MM-DD' or '' when unparseable."""
    if not raw:
        return ""
    raw = raw.strip()
    for fmt in DATE_FORMATS:
        try:
            return datetime.strptime(raw, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return ""
