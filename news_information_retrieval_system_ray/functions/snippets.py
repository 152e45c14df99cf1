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


# ---------------------------------------------------- KWIC window modes

_SENT_TERM = ".!?"
_BREAKPOINTS = (",", ";", ":", "-", "(", ")")


def kwic_contexts(text: str, position: int, keyword_length: int,
                  window_type: str = "fixed",
                  window_size: int = 30) -> tuple[str, str]:
    """(left, right) context for one keyword hit, per window mode
    (dynamic.py:302-413).

    - ``fixed``: char window trimmed to word boundaries;
    - ``sentence``: up to the enclosing sentence terminators, stripped;
    - ``adaptive``: fixed window, then cut at the nearest natural
      breakpoint (comma/semicolon/...) on each side.
    """
    if window_type == "sentence":
        sent_start = 0
        for i in range(position - 1, -1, -1):
            if text[i] in _SENT_TERM:
                sent_start = i + 1
                break
        sent_end = len(text)
        for i in range(position + keyword_length, len(text)):
            if text[i] in _SENT_TERM:
                sent_end = i
                break
        return (text[sent_start:position].strip(),
                text[position + keyword_length:sent_end].strip())

    left_start = max(0, position - window_size)
    left = text[left_start:position]
    if left_start > 0 and " " in left:
        left = left[left.find(" ") + 1:]
    right_end = min(len(text), position + keyword_length + window_size)
    right = text[position + keyword_length:right_end]
    if right_end < len(text) and " " in right:
        right = right[:right.rfind(" ")]
    if window_type == "adaptive":
        for bp in _BREAKPOINTS:
            if bp in left:
                left = left[left.rfind(bp) + 1:].strip()
                break
        for bp in _BREAKPOINTS:
            if bp in right:
                right = right[:right.find(bp)].strip()
                break
    return left, right


def kwic_matches(text: str, keyword: str, window_type: str = "fixed",
                 window_size: int = 30, max_matches: int = 5,
                 case_sensitive: bool = False) -> list[dict]:
    """All KWIC matches of one keyword with mode-specific contexts
    (dynamic.py:150-300)."""
    if not text or not keyword:
        return []
    hay = text if case_sensitive else text.lower()
    needle = keyword if case_sensitive else keyword.lower()
    out: list[dict] = []
    start = 0
    while len(out) < max_matches:
        p = hay.find(needle, start)
        if p < 0:
            break
        left, right = kwic_contexts(text, p, len(keyword),
                                    window_type, window_size)
        out.append({"position": p, "left": left,
                    "keyword": text[p:p + len(keyword)], "right": right})
        start = p + len(keyword)
    return out
