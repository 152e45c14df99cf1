"""Query-side synonym expansion (reference
/root/reference/src/ir_app/services/text_quality.py:41-51: the app's
DIRECTED synonym map — e.g. 半導體 -> [晶片, 芯片] but 晶片 -> [半導體]
only, 美國 -> [美方] one-way — applied in list order)."""

from __future__ import annotations

# the reference's SYNONYM_MAP verbatim (text_quality.py:41-51):
# directed, value-list order significant (iteration order drives the
# suggestion/expansion term order)
SYNONYMS: dict[str, list[str]] = {
    "ai": ["人工智慧"],
    "人工智慧": ["ai"],
    "台灣": ["臺灣"],
    "臺灣": ["台灣"],
    "半導體": ["晶片", "芯片"],
    "晶片": ["半導體"],
    "美國": ["美方"],
    "中國": ["大陸", "中方"],
    "氣候變遷": ["氣候變化"],
}


def expand_terms(terms: list[str]) -> list[str]:
    """Terms plus their mapped synonyms, original order first, synonyms
    in map-list order, no duplicates (the searcher's query expansion)."""
    out: list[str] = []
    seen: set[str] = set()
    for t in terms:
        if t not in seen:
            out.append(t)
            seen.add(t)
    for t in list(out):
        for s in SYNONYMS.get(t, ()):
            if s not in seen:
                out.append(s)
                seen.add(s)
    return out
