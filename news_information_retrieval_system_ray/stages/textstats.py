"""Text-analysis stages: quality scoring, language ID, token counting,
document fingerprinting (the large-scale-training-pipeline operators).

All deterministic and seedless; per-doc work in ``map_batches`` bodies
(regexes compiled once per actor in ``__init__``).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..functions.hashing import simhash64, winnow_fingerprints
from ..functions.tokenize import get_tokenizer
from ..functions.textnorm import normalize_text

# tiny deterministic marker sets (language-ID heuristic)
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset({"the", "and", "of", "to", "in", "is", "a", "for", "with", "news"}),
    "de": frozenset({"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"}),
    "fr": frozenset({"le", "la", "les", "et", "est", "une", "pour", "dans", "que"}),
    "es": frozenset({"el", "los", "las", "es", "una", "para", "con", "por", "como"}),
}
_CJK = re.compile(r"[一-鿿]")

QUALITY_STOPWORDS = frozenset({"the", "a"})


class QualityStage:
    """(doc_id, text) -> quality features (whitespace tokenization to stay
    SQL-oracle-expressible): n_tokens, n_distinct, distinct_ratio,
    stop_ratio, mean_token_len — the reference's quality/"significant
    terms" signals (text_quality.py:11-50) generalized to score columns."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tokenize = get_tokenizer("whitespace")

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tok, n_dis, d_ratio, s_ratio, m_len = [], [], [], [], []
        for t in batch.column(self.text_col).to_pylist():
            toks = self.tokenize(normalize_text(t or ""))
            n = len(toks)
            dis = len(set(toks))
            stop = sum(1 for x in toks if x in QUALITY_STOPWORDS)
            n_tok.append(n)
            n_dis.append(dis)
            d_ratio.append(round(dis / n, 4) if n else 0.0)
            s_ratio.append(round(stop / n, 4) if n else 0.0)
            m_len.append(round(sum(map(len, toks)) / n, 4) if n else 0.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_distinct": pa.array(n_dis, pa.int64()),
            "distinct_ratio": pa.array(d_ratio, pa.float64()),
            "stop_ratio": pa.array(s_ratio, pa.float64()),
            "mean_token_len": pa.array(m_len, pa.float64()),
        })


def _round4_half_away(x: float) -> float:
    """Half-away-from-zero 4-dp rounding (matches SQL ROUND, unlike
    Python's banker's round — scores like 1/32 land exactly on .5)."""
    import math

    return math.floor(x * 10000.0 + 0.5) / 10000.0


class LangIdStage:
    """Marker-word + CJK-ratio heuristic -> (doc_id, pred_lang, confidence)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tokenize = get_tokenizer("whitespace")

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs, confs = [], []
        for t in batch.column(self.text_col).to_pylist():
            t = t or ""
            n_chars = max(1, len(t))
            cjk = len(_CJK.findall(t))
            if cjk / n_chars > 0.2:
                langs.append("zh")
                confs.append(_round4_half_away(cjk / n_chars))
                continue
            toks = self.tokenize(normalize_text(t))
            n = max(1, len(toks))
            best_lang, best = "en", 0.0
            for lang, markers in _LANG_MARKERS.items():
                score = sum(1 for x in toks if x in markers) / n
                if score > best:
                    best_lang, best = lang, score
            langs.append(best_lang)
            confs.append(_round4_half_away(best))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "pred_lang": pa.array(langs, pa.string()),
            "confidence": pa.array(confs, pa.float64()),
        })


class FingerprintStage:
    """(doc_id, text) -> 64-bit SimHash + winnowed fingerprint count
    (rolling-hash winnowing, Schleimer et al. 2003)."""

    def __init__(self, text_col: str = "text", k: int = 5, window: int = 4):
        self.text_col = text_col
        self.k = k
        self.window = window
        self.tokenize = get_tokenizer("whitespace")

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims, n_fps, fp_mins = [], [], []
        for t in batch.column(self.text_col).to_pylist():
            toks = self.tokenize(normalize_text(t or ""))
            sims.append(simhash64(toks))
            fps = winnow_fingerprints(toks, k=self.k, window=self.window)
            n_fps.append(int(fps.size))
            fp_mins.append(int(fps.min()) if fps.size else 0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "simhash": pa.array(np.array(sims, dtype=np.uint64)),
            "n_fingerprints": pa.array(n_fps, pa.int64()),
            "min_fingerprint": pa.array(np.array(fp_mins, dtype=np.uint64)),
        })


# BPE-ish token counting: word pieces of up to 4 chars (a deterministic
# stand-in for a subword vocab — counts segments, not learned merges)
_BPE_SPLIT = re.compile(r"[a-z0-9]{1,4}|[一-鿿]")


class TokenCountStage:
    """(doc_id, text) -> whitespace token count + BPE-ish subword count."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.tokenize = get_tokenizer("whitespace")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, bpe = [], []
        for t in batch.column(self.text_col).to_pylist():
            norm = normalize_text(t or "")
            ws.append(len(self.tokenize(norm)))
            bpe.append(len(_BPE_SPLIT.findall(norm)))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_ws_tokens": pa.array(ws, pa.int64()),
            "n_subword_tokens": pa.array(bpe, pa.int64()),
        })
