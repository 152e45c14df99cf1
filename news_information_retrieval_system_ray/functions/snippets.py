"""Snippet / highlight / KWIC kernels (serving-side maps, SURVEY §2.2).

Reference semantics reproduced:

- ``make_snippet`` (/root/reference/src/ir_app/services/search_service.py:627-672):
  split text into sentences on ``[。！？.!?]``, pick the sentence with the
  most DISTINCT query-term hits (first wins ties), trim to 180 chars with
  an ellipsis appended when truncated.
- ``highlight`` (search_service.py:688-703): HTML-escape, then wrap each
  query-term occurrence (case-insensitive) in ``<mark>..</mark>``.
- ``kwic_windows`` (/root/reference/src/ir/summarize/dynamic.py:100-472
  fixed-window mode): for each term occurrence, a window of ``width``
  chars each side, occurrence position reported.
"""

from __future__ import annotations

import html
import re

_SENT_SPLIT = re.compile(r"[。！？.!?]")
SNIPPET_LEN = 180


def split_sentences(text: str) -> list[str]:
    return [s.strip() for s in _SENT_SPLIT.split(text) if s.strip()]


def make_snippet(text: str, query_terms: list[str], max_len: int = SNIPPET_LEN) -> str:
    """Best sentence by distinct query-term hits, trimmed to max_len."""
    if not text:
        return ""
    sentences = split_sentences(text)
    if not sentences:
        sentences = [text.strip()]
    lower_terms = [t.lower() for t in query_terms]
    best, best_hits = sentences[0], -1
    for s in sentences:
        sl = s.lower()
        hits = sum(1 for t in lower_terms if t and t in sl)
        if hits > best_hits:
            best, best_hits = s, hits
    if len(best) > max_len:
        return best[:max_len] + "…"
    return best


def highlight(text: str, query_terms: list[str]) -> str:
    """HTML-escape then <mark>-wrap query-term occurrences (case-insensitive).

    A single combined alternation (longest-first) substitutes every term in
    one pass, so a later term can never match inside a previously inserted
    ``<mark>`` tag or escaped entity (e.g. terms like 'mar' or 'amp').
    """
    out = html.escape(text, quote=False)
    terms = sorted({t for t in query_terms if t}, key=len, reverse=True)
    if not terms:
        return out
    escaped = [html.escape(t, quote=False) for t in terms]
    # Terms whose escaped form contains an entity (e.g. '&' -> '&amp;') must
    # outrank the generic entity-skip branch; everything else comes after it.
    entity_like = [e for t, e in zip(terms, escaped) if e != t]
    plain = [e for t, e in zip(terms, escaped) if e == t]
    branches = []
    if entity_like:
        branches.append("(?P<ent_term>" + "|".join(map(re.escape, entity_like)) + ")")
    branches.append(r"(?P<entity>&#?\w+;)")  # skip escaped entities untouched
    if plain:
        branches.append("(?P<term>" + "|".join(map(re.escape, plain)) + ")")
    pat = re.compile("|".join(branches), flags=re.IGNORECASE)

    def _sub(m: re.Match) -> str:
        if m.lastgroup == "entity":  # bare entity, not a query term
            return m.group(0)
        return f"<mark>{m.group(0)}</mark>"

    return pat.sub(_sub, out)


def lead_k_summary(text: str, k: int = 2) -> str:
    """First-k-sentences summary (reference lead-k summarizer,
    /root/reference/src/ir/summarize/static.py:110-698 lead mode)."""
    sents = split_sentences(text)
    return "。".join(sents[:k]) if sents else ""


def kwic_windows(text: str, term: str, width: int = 30,
                 max_windows: int = 5) -> list[tuple[int, str]]:
    """(position, window) pairs for each occurrence of term (fixed width)."""
    if not text or not term:
        return []
    out: list[tuple[int, str]] = []
    tl, low = term.lower(), text.lower()
    start = 0
    while len(out) < max_windows:
        p = low.find(tl, start)
        if p < 0:
            break
        out.append((p, text[max(0, p - width): p + len(term) + width]))
        start = p + len(term)
    return out
