"""Text cleaning / normalization kernels.

Byte-identical reimplementation of the reference's two normalization
chains (these are the per-row invariants pinned by golden fixtures):

- ``clean_text``: collapse all whitespace runs to a single space and
  strip (reference /root/reference/scripts/data/clean_dataset.py:39-63).
- ``normalize_text``: NFKC -> 臺→台 -> lower -> whitespace collapse ->
  strip (reference /root/reference/src/ir_app/services/index_service.py:71-81);
  this is the canonical normalization feeding the BM25 index path.
- ``extract_text_from_html``: reproduce the crawler extraction chain —
  paragraph texts (``<p>...</p>``), each cleaned with ``clean_text``,
  joined with a single space (reference
  /root/reference/scripts/crawlers/cna_spider.py:175-179).  Implemented
  with a compiled regex (no HTML lib in this container); our synthetic
  pages generator emits HTML of exactly this shape.
"""

from __future__ import annotations

import re
import unicodedata

_WS = re.compile(r"\s+")
_P_TAG = re.compile(r"<p(?:\s[^>]*)?>(.*?)</p>", re.S | re.I)
_ANY_TAG = re.compile(r"<[^>]+>")
# token must contain at least one word char or CJK char to survive
# (reference index_service.py:97 — filter r"[\w一-鿿]")
_TOKEN_KEEP = re.compile(r"[\w一-鿿]")


def clean_text(text: str) -> str:
    """Whitespace-collapse + strip (clean_dataset.py:39-63).

    ``" ".join(text.split())`` is byte-identical to
    ``_WS.sub(" ", text).strip()`` — str.split()'s no-arg whitespace set
    equals re ``\\s`` over ALL of Unicode (pinned by
    tests/test_textnorm_tokenize.py::test_ws_collapse_equivalence) —
    and measures ~4x faster; this runs per paragraph in the extraction
    hot path."""
    if not text:
        return ""
    return " ".join(text.split())


def normalize_text(text: str) -> str:
    """NFKC → 臺→台 → lower → collapse whitespace → strip (index_service.py:71-81)."""
    if not text:
        return ""
    t = unicodedata.normalize("NFKC", text)
    t = t.replace("臺", "台")
    t = t.lower()
    return " ".join(t.split())


def _extract_regex(html: str) -> str:
    """Reference-exact regex extraction loop (the authoritative path)."""
    paras = []
    for m in _P_TAG.finditer(html):
        inner = _ANY_TAG.sub("", m.group(1))
        c = clean_text(inner)
        if c:
            paras.append(c)
    return " ".join(paras)


def extract_text_from_html(html: str) -> str:
    """Crawler-style extraction: join cleaned <p> paragraph texts with ' '.

    Fast path: split on the literal ``</p>`` and take each segment's
    first valid ``<p...>`` opener — ~1.6x the regex finditer loop on
    webtext, with ONE whitespace collapse per doc instead of one per
    paragraph (equivalent: per-paragraph collapse+strip+drop-empty then
    ' '-join == global ' '-join then collapse+strip, since lowering
    never introduces whitespace and empty segments vanish in the
    collapse).  Any input the scan can't prove identical — mixed-case
    ``<P``/``</P`` (the regex is re.I) or an opener whose tag has no
    ``>`` inside its segment (the regex tag ``[^>]*>`` would then
    swallow a ``</p>`` and span segments) — falls back to
    ``_extract_regex``; byte-identity is pinned by
    tests/test_extract_vectorized.py including these adversarial shapes.
    """
    if not html:
        return ""
    if "<P" in html or "</P" in html:
        return _extract_regex(html)
    parts = html.split("</p>")
    if len(parts) == 1:
        return ""
    out = []
    for seg in parts[:-1]:
        i = seg.find("<p")
        g = None
        while i >= 0:
            nxt = seg[i + 2:i + 3]
            if nxt == ">":
                g = seg[i + 3:]
                break
            if nxt and nxt.isspace():
                j = seg.find(">", i + 2)
                if j < 0:
                    return _extract_regex(html)
                g = seg[j + 1:]
                break
            i = seg.find("<p", i + 1)
        if g:
            if "<" in g:
                g = _ANY_TAG.sub("", g)
            out.append(g)
    return " ".join(" ".join(out).split())


def keep_token(tok: str) -> bool:
    """True iff the token contains a word/CJK char (index_service.py:97)."""
    return bool(_TOKEN_KEEP.search(tok))
