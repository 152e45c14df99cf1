"""Query text-quality analysis (reference
/root/reference/src/ir_app/services/text_quality.py): the news
low-information term list, the protected-term guard, significant-term
selection and the query-analysis payload.

All pure per-query kernels (O(q)); used query-side by the serving
composites and exposed as the oracle-checked ``q:query_analysis``."""

from __future__ import annotations

from .stopwords import load_stopwords
from .synonyms import SYNONYMS
from .textnorm import normalize_text

# text_quality.py:11-26 verbatim
NEWS_LOW_INFORMATION_TERMS = frozenset({
    "中央社", "記者", "報導", "綜合報導", "編輯", "新聞稿", "快訊",
    "圖", "文", "指出", "表示", "今天", "昨天", "明天",
})

# text_quality.py:29-38 verbatim
PROTECTED_TERMS = frozenset({
    "ai", "人工智慧", "台灣", "臺灣", "美國", "中國", "台積電", "半導體",
})

_STOPS = load_stopwords("zh") | NEWS_LOW_INFORMATION_TERMS
_PROTECTED_NORM = frozenset(normalize_text(t) for t in PROTECTED_TERMS)


def is_low_information(term: str) -> bool:
    """Stopword-or-news-boilerplate, unless protected
    (text_quality.py:158-169)."""
    n = normalize_text(term)
    if n in _PROTECTED_NORM:
        return False
    return n in _STOPS


def significant_terms(terms: list[str]) -> list[str]:
    """Terms that drive ranking/snippets (text_quality.py:89-99)."""
    return [t for t in terms if t and not is_low_information(t)]


def removed_stopwords(terms: list[str]) -> list[str]:
    """The complement (text_quality.py:101-112)."""
    return [t for t in terms if t and is_low_information(t)]


def synonym_terms(terms: list[str], raw_text: str = "") -> list[str]:
    """Conservative synonym expansions (text_quality.py:114-135):
    map hits for query terms plus map phrases found inside the
    normalized raw text, excluding anything whose normalized form is
    already a (normalized) query term; map order, first-wins dedup."""
    expanded: list[str] = []
    originals = {normalize_text(t) for t in terms}
    for t in terms:
        for s in SYNONYMS.get(t, ()):
            if normalize_text(s) not in originals:
                expanded.append(s)
    ntext = normalize_text(raw_text)
    for phrase, syns in SYNONYMS.items():
        if phrase in terms:
            continue
        np = normalize_text(phrase)
        if np and np in ntext:
            for s in syns:
                if normalize_text(s) not in originals:
                    expanded.append(s)
    return list(dict.fromkeys(expanded))


def matching_terms(query_terms: list[str], raw_text: str = "") -> list[str]:
    """Significant terms + their synonyms (text_quality.py:169-177)."""
    sig = significant_terms(query_terms)
    return list(dict.fromkeys(sig + synonym_terms(sig, raw_text)))


def analysis(query: str, terms: list[str]) -> dict:
    """The query-analysis API payload (text_quality.py:137-156).
    ``terms`` is the tokenized query (the app's segmenter; space-split
    of the normalized query in this container — no CJK segmenter)."""
    sig = significant_terms(terms)
    return {
        "raw_query": query or "",
        "normalized_query": normalize_text(query or ""),
        "term_count": len(terms),
        "significant_terms": sig,
        "removed_stopwords": removed_stopwords(terms),
        "synonym_terms": synonym_terms(sig, query),
    }
