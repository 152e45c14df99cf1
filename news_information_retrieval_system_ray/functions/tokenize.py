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


def _make_jieba(mode: str = "default") -> Callable[[], Tokenizer]:
    """jieba engine factory for the reference's segmentation modes
    (chinese_tokenizer.py:258-267): 'default' = cut(cut_all=False,
    HMM=True); 'search' = cut_for_search (finer recall-oriented
    splits); 'nohmm' = cut(HMM=False) (dictionary-only)."""

    def factory() -> Tokenizer:
        import jieba  # noqa: F401  (import-try; absent in this container)

        jieba.initialize()

        def tok(norm_text: str) -> list[str]:
            if mode == "search":
                it = jieba.cut_for_search(norm_text)
            elif mode == "nohmm":
                it = jieba.cut(norm_text, cut_all=False, HMM=False)
            else:
                it = jieba.cut(norm_text, cut_all=False)
            out = []
            for t in it:
                t = t.strip().lower()
                if t and keep_token(t):
                    out.append(t)
            return out

        return tok

    return factory


def add_custom_words(words: list[str]) -> None:
    """Register domain words (the reference's jieba add_word surface,
    chinese_tokenizer.py:597-628).  Applied to jieba when importable;
    always recorded so :func:`with_custom_words` can wrap the
    deterministic engines with the same longest-match-first behavior."""
    _CUSTOM_WORDS.extend(w for w in words if w)
    try:
        import jieba

        for w in words:
            jieba.add_word(w)
    except ImportError:
        pass


_CUSTOM_WORDS: list[str] = []


def with_custom_words(base: Tokenizer, words: list[str] | None = None) -> Tokenizer:
    """Wrap a tokenizer so registered custom words always come out as
    whole tokens: occurrences are cut out longest-first from the
    normalized text and the remainder goes through the base engine —
    the deterministic-engine equivalent of jieba's custom dictionary."""
    vocab = sorted({w for w in (words if words is not None else _CUSTOM_WORDS) if w},
                   key=len, reverse=True)
    if not vocab:
        return base
    pat = re.compile("|".join(re.escape(w) for w in vocab))

    def tok(norm_text: str) -> list[str]:
        out: list[str] = []
        pos = 0
        for m in pat.finditer(norm_text):
            if m.start() > pos:
                out.extend(base(norm_text[pos:m.start()]))
            out.append(m.group(0))
            pos = m.end()
        if pos < len(norm_text):
            out.extend(base(norm_text[pos:]))
        return out

    return tok


def _make_ckip() -> Tokenizer:
    """CKIP word-segmentation engine (the reference's CkipWordSegmenter
    path, chinese_tokenizer.py CKIP mode) — import-try seam like jieba:
    instantiable only where ``ckip_transformers`` (and its model
    weights) are installed; this container documents it absent."""
    from ckip_transformers.nlp import CkipWordSegmenter  # noqa: F401 (import-try)

    ws = CkipWordSegmenter(model="bert-base")

    def tok(norm_text: str) -> list[str]:
        out = []
        for t in ws([norm_text])[0]:
            t = t.strip().lower()
            if t and keep_token(t):
                out.append(t)
        return out

    return tok


_ENGINES: dict[str, Callable[[], Tokenizer]] = {
    "whitespace": lambda: _tokenize_whitespace,
    "cjk_bigram": lambda: _tokenize_cjk_bigram,
    "jieba": _make_jieba("default"),
    "jieba_search": _make_jieba("search"),
    "jieba_nohmm": _make_jieba("nohmm"),
    "ckip": _make_ckip,
}

# package each model-backed engine needs at construction time
_ENGINE_PACKAGE = {
    "jieba": "jieba", "jieba_search": "jieba", "jieba_nohmm": "jieba",
    "ckip": "ckip_transformers",
}


def engine_available(engine: str) -> bool:
    """True iff the engine can actually be constructed here: always for
    the deterministic engines, package-import-resolvable for the
    model-backed ones."""
    pkg = _ENGINE_PACKAGE.get(engine)
    if pkg is None:
        return engine in _ENGINES
    import importlib.util

    return importlib.util.find_spec(pkg) is not None


def select_engine(preferred: str, fallback: str | None = None) -> str:
    """The model-present upgrade seam: return ``preferred`` iff its
    backing package imports, else the deterministic ``fallback``
    (default: DEFAULT_ENGINE) — the same pipeline code upgrades in
    place in an environment that ships the real model (jieba/CKIP),
    and stays deterministic here."""
    if engine_available(preferred):
        return preferred
    return fallback if fallback is not None else DEFAULT_ENGINE

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
