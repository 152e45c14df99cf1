"""Stopword sets + O(1) filtering (reference
/root/reference/src/ir/text/stopwords.py:31-137 semantics: file-driven
set, one word per line, ``#`` comments ignored, frozenset membership).

The Traditional-Chinese list is vendored DATA (stopwords-iso /
Traditional-Chinese-Stopwords-Library per its own header — public
word-list data, same file the reference ships at
datasets/stopwords/zh_traditional.txt).  The English list is the
classic compact SMART-derived core set (public domain), used by the
RAKE extractor over the English test tables.
"""

from __future__ import annotations

import os
from functools import lru_cache

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "data")

# compact English stopword core (SMART list subset, public domain)
EN_STOPWORDS = frozenset("""
a about above after again against all am an and any are as at be because
been before being below between both but by can did do does doing down
during each few for from further had has have having he her here hers
herself him himself his how i if in into is it its itself just me more
most my myself no nor not now of off on once only or other our ours
ourselves out over own same she should so some such than that the their
theirs them themselves then there these they this those through to too
under until up very was we were what when where which while who whom why
will with you your yours yourself yourselves
""".split())


@lru_cache(maxsize=8)
def load_stopwords(lang: str = "zh") -> frozenset[str]:
    """Stopword set by language tag ('zh' -> vendored TC file, 'en' ->
    built-in set).  Unknown tags -> empty set (filter is a no-op)."""
    if lang == "en":
        return EN_STOPWORDS
    if lang in ("zh", "zh-tw", "zh_traditional"):
        path = os.path.join(_DATA_DIR, "zh_traditional_stopwords.txt")
        words = set()
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                w = line.strip()
                if w and not w.startswith("#"):
                    words.add(w)
        return frozenset(words)
    return frozenset()


def filter_stopwords(tokens: list[str], stops: frozenset[str]) -> list[str]:
    """Drop stopword tokens (stopwords.py:101-137 filter semantics)."""
    if not stops:
        return tokens
    return [t for t in tokens if t not in stops]
