"""YAKE keyword extraction (Campos et al., ECIR 2018 / Inf. Sciences 2020).

The reference wraps the ``yake`` pip library
(/root/reference/src/ir/keyextract/yake_extractor.py:120-439, language
'zh', max_ngram 3, dedup 0.9 'seqm', window 1); that library is absent
in this container, so the published algorithm is implemented natively:

Per-term features over a single document:
- ``W_Case``  = max(TF_allcaps, TF_proper) / (1 + ln TF)
- ``W_Pos``   = ln(ln(3 + median(sentence indices of occurrences)))
- ``TF_Norm`` = TF / (mean TF + std TF) over candidate terms
- ``W_Rel``   = 1 + (WL + WR) * TF / maxTF, where WL(=right resp.) is
  |distinct left co-occurring terms| / |left co-occurrences| in ``window``
- ``W_Dif``   = |sentences containing t| / |sentences|
- ``S(t)``    = (W_Rel * W_Pos) / (W_Case + TF_Norm/W_Rel + W_Dif/W_Rel)

Phrase score (contiguous in-sentence n-grams, no stopwords):
``S(kw) = prod S(w) / (TF(kw) * (1 + sum S(w)))`` — LOWER is better.
Near-duplicate keyphrases are pruned with SequenceMatcher ratio
(the library's 'seqm' deduplication).

``yake_unigram_scores`` is the *sentence-free* variant used for the
SQL-oracle-checked query: the whole doc is one sentence (W_Dif = 1,
W_Case = 0 on the lowercased stream) and W_Pos uses the median 1-based
token position — every feature is then expressible in DuckDB window
functions, so the Ray and SQL sides can be hash-compared.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from difflib import SequenceMatcher

_SENT_SPLIT = re.compile(r"[.!?\n。！？]+")
_WORD = re.compile(r"\w+")


def yake_unigram_scores(terms: list[str],
                        positions: list[list[int]]) -> list[tuple[str, float]]:
    """Sentence-free unigram YAKE over a tokenized doc.

    ``terms``/``positions`` follow the TokenizeStage ``with_positions``
    layout: per-term 0-based position lists over the filtered token
    sequence.  Returns (term, score) sorted (score asc, term asc);
    lower = better keyword.
    """
    if not terms:
        return []
    tf = {t: len(p) for t, p in zip(terms, positions)}
    n_pos = sum(tf.values())
    seq: list[str] = [""] * n_pos
    for t, plist in zip(terms, positions):
        for p in plist:
            seq[p] = t
    left: dict[str, set[str]] = {t: set() for t in terms}
    right: dict[str, set[str]] = {t: set() for t in terms}
    for i, t in enumerate(seq):
        if i > 0:
            left[t].add(seq[i - 1])
        if i < n_pos - 1:
            right[t].add(seq[i + 1])
    tfs = list(tf.values())
    mean_tf = sum(tfs) / len(tfs)
    std_tf = math.sqrt(sum((x - mean_tf) ** 2 for x in tfs) / len(tfs))
    max_tf = max(tfs)
    out = []
    for t, plist in zip(terms, positions):
        k = tf[t]
        # median of 1-based positions (matches DuckDB median over
        # generate_subscripts); even counts -> .5 midpoint
        sp = sorted(plist)
        m = len(sp)
        med = (sp[m // 2] + 1) if m % 2 else (sp[m // 2 - 1] + sp[m // 2]) / 2.0 + 1
        pos_w = math.log(math.log(3.0 + med))
        lc = k - (1 if sp[0] == 0 else 0)          # occurrences with a left nbr
        rc = k - (1 if sp[-1] == n_pos - 1 else 0)  # ... with a right nbr
        wl = len(left[t]) / lc if lc else 0.0
        wr = len(right[t]) / rc if rc else 0.0
        rel = 1.0 + (wl + wr) * k / max_tf
        tfnorm = k / (mean_tf + std_tf)
        score = (rel * pos_w) / ((tfnorm + 1.0) / rel)
        out.append((t, score))
    out.sort(key=lambda x: (x[1], x[0]))
    return out


def _sentences(text: str) -> list[list[str]]:
    """Case-preserving tokenized sentences (\\w+ runs per sentence)."""
    sents = []
    for chunk in _SENT_SPLIT.split(text):
        toks = _WORD.findall(chunk)
        if toks:
            sents.append(toks)
    return sents


def yake_keywords(text: str, k: int = 10, max_ngram: int = 3, window: int = 1,
                  dedup_lim: float = 0.9,
                  stops: frozenset[str] = frozenset()) -> list[tuple[str, float]]:
    """Full YAKE over raw text: top-k (keyphrase, score), score asc
    (lower = better), ties keyphrase asc.  Parameters mirror the
    reference wrapper defaults (yake_extractor.py:115-127)."""
    sents = _sentences(text or "")
    if not sents:
        return []
    n_sents = len(sents)
    tf: Counter[str] = Counter()
    tf_caps: Counter[str] = Counter()
    tf_proper: Counter[str] = Counter()
    occ_sents: dict[str, list[int]] = {}
    sent_set: dict[str, set[int]] = {}
    left: dict[str, set[str]] = {}
    right: dict[str, set[str]] = {}
    lcount: Counter[str] = Counter()
    rcount: Counter[str] = Counter()
    for si, sent in enumerate(sents):
        low = [w.lower() for w in sent]
        for wi, raw in enumerate(sent):
            t = low[wi]
            tf[t] += 1
            if len(raw) > 1 and raw.isupper():
                tf_caps[t] += 1
            elif raw[0].isupper() and wi > 0:
                tf_proper[t] += 1
            occ_sents.setdefault(t, []).append(si)
            sent_set.setdefault(t, set()).add(si)
            for j in range(max(0, wi - window), wi):
                left.setdefault(t, set()).add(low[j])
                lcount[t] += 1
            for j in range(wi + 1, min(len(sent), wi + 1 + window)):
                right.setdefault(t, set()).add(low[j])
                rcount[t] += 1
    cand_terms = [t for t in tf if t not in stops]
    if not cand_terms:
        return []
    tfs = [tf[t] for t in cand_terms]
    mean_tf = sum(tfs) / len(tfs)
    std_tf = math.sqrt(sum((x - mean_tf) ** 2 for x in tfs) / len(tfs))
    max_tf = max(tf.values())
    s: dict[str, float] = {}
    for t in tf:
        f = tf[t]
        w_case = max(tf_caps[t], tf_proper[t]) / (1.0 + math.log(f))
        sl = sorted(occ_sents[t])
        m = len(sl)
        med = sl[m // 2] if m % 2 else (sl[m // 2 - 1] + sl[m // 2]) / 2.0
        w_pos = math.log(math.log(3.0 + med))
        wl = len(left.get(t, ())) / lcount[t] if lcount[t] else 0.0
        wr = len(right.get(t, ())) / rcount[t] if rcount[t] else 0.0
        rel = 1.0 + (wl + wr) * f / max_tf
        tfnorm = f / (mean_tf + std_tf) if (mean_tf + std_tf) else 0.0
        w_dif = len(sent_set[t]) / n_sents
        s[t] = (rel * w_pos) / (w_case + tfnorm / rel + w_dif / rel)
    # candidate phrases: contiguous in-sentence n-grams, stopword-free
    ph_tf: Counter[tuple[str, ...]] = Counter()
    for sent in sents:
        low = [w.lower() for w in sent]
        for n in range(1, max_ngram + 1):
            for i in range(len(low) - n + 1):
                gram = tuple(low[i:i + n])
                if any(w in stops for w in gram):
                    continue
                ph_tf[gram] += 1
    scored: list[tuple[float, str]] = []
    for gram, f in ph_tf.items():
        prod = 1.0
        ssum = 0.0
        for w in gram:
            prod *= s[w]
            ssum += s[w]
        scored.append((prod / (f * (1.0 + ssum)), " ".join(gram)))
    scored.sort(key=lambda x: (x[0], x[1]))
    picked: list[tuple[str, float]] = []
    for score, phrase in scored:
        if len(picked) >= k:
            break
        if any(SequenceMatcher(None, phrase, p).ratio() >= dedup_lim
               for p, _ in picked):
            continue
        picked.append((phrase, score))
    return picked
