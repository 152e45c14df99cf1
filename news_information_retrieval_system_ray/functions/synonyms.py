"""Query-side synonym expansion (reference
/root/reference/src/ir_app/services/text_quality.py:90-177: bidirectional
synonym map applied to query terms — ai↔人工智慧, 台灣↔臺灣,
半導體↔晶片 …)."""

from __future__ import annotations

# the reference's pairs (text_quality.py synonym table)
_PAIRS: list[tuple[str, ...]] = [
    ("ai", "人工智慧"),
    ("台灣", "臺灣"),
    ("半導體", "晶片"),
    ("武漢肺炎", "新冠肺炎", "covid"),
    ("美國", "美方"),
    ("中國", "中方", "大陸"),
]

SYNONYMS: dict[str, set[str]] = {}
for group in _PAIRS:
    for t in group:
        SYNONYMS.setdefault(t, set()).update(x for x in group if x != t)


def expand_terms(terms: list[str]) -> list[str]:
    """Terms plus their synonyms, original order first, no duplicates."""
    out: list[str] = []
    seen: set[str] = set()
    for t in terms:
        if t not in seen:
            out.append(t)
            seen.add(t)
    for t in list(out):
        for s in sorted(SYNONYMS.get(t, ())):
            if s not in seen:
                out.append(s)
                seen.add(s)
    return out
