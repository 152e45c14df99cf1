"""Extractive summarization kernels beyond lead-k.

Reference semantics reproduced from
/root/reference/src/ir/summarize/static.py:

- sentence segmentation (:142-190): split on ``[.!?。！？]+``, strip,
  keep sentences with ``min_len <= n_tokens <= max_len`` (defaults
  5..100); positions count RAW sentences (filtered ones still advance
  the position counter).
- sentence tokenization (:58-75): strip non-word/CJK chars, lowercase,
  whitespace split; CJK segments explode to single characters.
- key-sentence TF-IDF (:303-407): sentence-as-document IDF
  ``ln(n_sents/df)``, sentence score = sum(tf*idf)/len, optional
  position bias ``score * (1 + 0.5/(1+position))``; top-k by score
  desc, re-ordered by position.
- query-focused (:413-303): overlap / sqrt(|q| * |s|) cosine-style
  normalization over token SETS; top-k by score desc, position order.
- multi-document (:507-571): global TF-IDF scores, greedy selection
  skipping candidates with Jaccard similarity > diversity threshold
  to any already-selected sentence; output ordered (doc, position).

All pure Python/NumPy; used per-doc (or per-group for multi-doc)
inside map_batches / map_groups stages.
"""

from __future__ import annotations

import math
import re
from collections import Counter

_SENT_SPLIT = re.compile(r"[.!?。！？]+")
_NONWORD = re.compile(r"[^\w\s一-鿿]")


def sent_tokenize(text: str) -> list[str]:
    """Sentence-level tokenizer (static.py:58-75)."""
    text = _NONWORD.sub(" ", text.lower())
    out: list[str] = []
    for seg in text.split():
        if any("一" <= c <= "鿿" for c in seg):
            out.extend(c for c in seg if c.strip())
        elif seg.strip():
            out.append(seg)
    return out


def segment_sentences(text: str, min_len: int = 5, max_len: int = 100
                      ) -> list[tuple[int, str, list[str]]]:
    """(position, text, tokens) per kept sentence (static.py:142-190)."""
    out = []
    pos = 0
    for raw in _SENT_SPLIT.split(text.strip()):
        raw = raw.strip()
        if not raw:
            continue
        toks = sent_tokenize(raw)
        if min_len <= len(toks) <= max_len:
            out.append((pos, raw, toks))
        pos += 1
    return out


def _tf_idf(sents: list[tuple[int, str, list[str]]]) -> tuple[dict, dict]:
    tf: Counter = Counter()
    df: Counter = Counter()
    for _, _, toks in sents:
        tf.update(toks)
        df.update(set(toks))
    n = len(sents)
    idf = {t: math.log(n / d) for t, d in df.items()}
    return dict(tf), idf


def _score_tfidf(toks: list[str], tf: dict, idf: dict) -> float:
    s = sum(tf.get(t, 0) * idf.get(t, 0.0) for t in toks)
    return s / len(toks) if toks else 0.0


def key_sentence_summary(text: str, k: int = 3, position_bias: bool = True,
                         min_len: int = 5, max_len: int = 100) -> list[str]:
    """Top-k sentences by TF-IDF score (static.py:334-407), position order."""
    sents = segment_sentences(text, min_len, max_len)
    if not sents:
        return []
    tf, idf = _tf_idf(sents)
    scored = []
    for pos, raw, toks in sents:
        sc = _score_tfidf(toks, tf, idf)
        if position_bias:
            sc *= 1.0 + 0.5 * (1.0 / (1.0 + pos))
        scored.append((sc, pos, raw))
    # stable sort by -score preserves segment order among ties (as the
    # reference's sorted(..., reverse=True) does)
    scored.sort(key=lambda x: -x[0])
    selected = sorted(scored[:k], key=lambda x: x[1])
    return [raw for _, _, raw in selected]


def query_focused_summary(text: str, query: str, k: int = 3,
                          min_len: int = 5, max_len: int = 100) -> list[str]:
    """Top-k sentences by query-overlap score (static.py:413-503)."""
    sents = segment_sentences(text, min_len, max_len)
    if not sents:
        return []
    q_tokens = set(re.sub(r"[^\w\s]", " ", query.lower()).split())
    scored = []
    for pos, raw, toks in sents:
        st = set(toks)
        overlap = len(q_tokens & st)
        if overlap > 0:
            norm = math.sqrt(len(q_tokens) * len(st))
            sc = overlap / norm if norm > 0 else 0.0
        else:
            sc = 0.0
        scored.append((sc, pos, raw))
    scored.sort(key=lambda x: -x[0])
    selected = sorted(scored[:k], key=lambda x: x[1])
    return [raw for _, _, raw in selected]


def multi_doc_summary(texts: list[str], k: int = 5,
                      diversity_threshold: float = 0.5,
                      min_len: int = 5, max_len: int = 100
                      ) -> list[tuple[int, str]]:
    """Greedy diverse top-k sentences across documents
    (static.py:507-571); returns (doc_index, sentence) in (doc,
    position) order."""
    all_s: list[tuple[int, int, str, list[str]]] = []  # (doc, pos, raw, toks)
    for di, text in enumerate(texts):
        for pos, raw, toks in segment_sentences(text, min_len, max_len):
            all_s.append((di, pos, raw, toks))
    if not all_s:
        return []
    as_sents = [(pos, raw, toks) for _, pos, raw, toks in all_s]
    tf, idf = _tf_idf(as_sents)
    scored = sorted(
        ((_score_tfidf(toks, tf, idf), di, pos, raw, set(toks))
         for di, pos, raw, toks in all_s),
        key=lambda x: -x[0])
    selected: list[tuple[float, int, int, str, set]] = []
    for cand in scored:
        if len(selected) >= k:
            break
        _, _, _, _, ct = cand
        diverse = True
        for _, _, _, _, et in selected:
            union = ct | et
            jac = len(ct & et) / len(union) if union else 0.0
            if jac > diversity_threshold:
                diverse = False
                break
        if diverse:
            selected.append(cand)
    selected.sort(key=lambda x: (x[1], x[2]))
    return [(di, raw) for _, di, _, raw, _ in selected]
