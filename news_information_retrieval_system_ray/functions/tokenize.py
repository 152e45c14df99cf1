"""Deterministic tokenizers (pluggable engines, reference §2.10).

The reference tokenizes with jieba 0.42.1 ``cut(cut_all=False)`` after
the app normalization chain (/root/reference/src/ir_app/services/
index_service.py:83-100) and filters tokens to those containing a
word/CJK character.  jieba is NOT available in this container, so the
engine registry mirrors the reference's pluggable-tokenizer surface
(inverted_index.py:68-85) with deterministic fallbacks:

- ``whitespace``  : split normalized text on spaces (the reference's
  build_indexes.py:164-169 path for pre-tokenized text; also the engine
  whose semantics are exactly expressible in the DuckDB oracle SQL).
- ``cjk_bigram``  : English/digit runs as whole tokens, CJK runs as
  character bigrams (plus the lone char for length-1 runs) — the
  standard deterministic CJK fallback when no segmenter is present
  (same fallback idea as the reference's char-split on CKIP failure,
  ckip_tokenizer.py:139-203).
- ``jieba``       : the reference engine, used iff the package is
  importable (import-try; never required).

All engines receive text already passed through
:func:`..functions.textnorm.normalize_text` and apply the reference's
token filter (must contain ``[\\w一-鿿]``).  ``doc_len`` downstream is
``max(1, len(tokens))`` (index_service.py:285 app semantics — pinned in
SURVEY §7.6.4).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from .textnorm import keep_token, normalize_text

# runs of word chars (ascii words / digits / underscore) or single CJK chars
_CJK_RANGE = "一-鿿"
# \w includes CJK — exclude it from the "word run" branch via lookahead
_SEG = re.compile(rf"([{_CJK_RANGE}]+)|((?:(?![{_CJK_RANGE}])\w)+)")

Tokenizer = Callable[[str], list[str]]


def _tokenize_whitespace(norm_text: str) -> list[str]:
    if not norm_text:
        return []
    return [t for t in norm_text.split(" ") if t and keep_token(t)]


def _tokenize_cjk_bigram(norm_text: str) -> list[str]:
    toks: list[str] = []
    for m in _SEG.finditer(norm_text):
        cjk, word = m.group(1), m.group(2)
        if word is not None:
            toks.append(word)
        else:
            n = len(cjk)
            if n == 1:
                toks.append(cjk)
            else:
                toks.extend(cjk[i : i + 2] for i in range(n - 1))
    return toks


def _make_jieba() -> Tokenizer:
    import jieba  # noqa: F401  (import-try; absent in this container)

    jieba.initialize()

    def tok(norm_text: str) -> list[str]:
        out = []
        for t in jieba.cut(norm_text, cut_all=False):
            t = t.strip().lower()
            if t and keep_token(t):
                out.append(t)
        return out

    return tok


_ENGINES: dict[str, Callable[[], Tokenizer]] = {
    "whitespace": lambda: _tokenize_whitespace,
    "cjk_bigram": lambda: _tokenize_cjk_bigram,
    "jieba": _make_jieba,
}

DEFAULT_ENGINE = "cjk_bigram"


def get_tokenizer(engine: str = DEFAULT_ENGINE) -> Tokenizer:
    """Return a ``norm_text -> tokens`` callable for the named engine."""
    try:
        factory = _ENGINES[engine]
    except KeyError:
        raise ValueError(f"unknown tokenizer engine {engine!r}; have {sorted(_ENGINES)}")
    return factory()


def tokenize(text: str, engine: str = DEFAULT_ENGINE, *, pre_normalized: bool = False) -> list[str]:
    """normalize_text + engine tokenization in one call (index_service.py:83-100)."""
    norm = text if pre_normalized else normalize_text(text)
    return get_tokenizer(engine)(norm)
