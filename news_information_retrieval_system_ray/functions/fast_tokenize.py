"""Vectorized cjk_bigram tokenize+count over codepoint arrays.

The per-doc Python loop (regex finditer + Counter) costs ~1.5 us/token;
on a 100 TB webtext corpus tokenization IS the build.  This kernel
reproduces ``tokenize._tokenize_cjk_bigram`` + ``Counter`` exactly for
"simple" documents — every codepoint either ASCII or in the CJK basic
block U+4E00..U+9FFF (the reference's ``一-鿿`` class) — by classifying
a whole batch's codepoints at once:

- token IDENTITY is a 64-bit key (single CJK char = its codepoint; CJK
  bigram = (hi<<16)|lo; ASCII word of <=10 chars = 6-bit-packed with a
  tag bit; longer words via a tiny Python dict), so counting is ONE
  lexsort over (doc, key) instead of a Counter per doc;
- only the batch's UNIQUE keys (the vocab, ~1e4) ever materialize as
  Python strings.

Docs with any other codepoint (rare at webtext margins: accented latin,
kana, CJK ext-A...) are returned in ``fallback_docs`` for the caller's
exact per-doc loop — semantics stay byte-identical overall.
"""

from __future__ import annotations

import numpy as np

CJK_LO, CJK_HI = 0x4E00, 0x9FFF
_WORD_TAG = np.int64(1) << np.int64(61)
_LONG_TAG = np.int64(1) << np.int64(62)

# 6-bit char codes for ASCII word chars (1..63; 0 = end-of-word)
_CODE6 = np.zeros(128, dtype=np.int64)
_CHARS = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_"
for _i, _c in enumerate(_CHARS):
    _CODE6[ord(_c)] = _i + 1
_DECODE6 = {i + 1: c for i, c in enumerate(_CHARS)}
_IS_WORD = _CODE6 > 0
MAX_PACK = 10  # 10 chars x 6 bits = 60 bits < the tag bits


def tokenize_batch(texts: list[str]):
    """-> (pair_doc, pair_key, pair_tf, key_to_term, fallback_docs).

    ``pair_*`` are aligned arrays of per-(doc, term) counts sorted by
    (doc, key); ``key_to_term`` maps each unique key to its term string;
    ``fallback_docs`` are doc indices the caller must tokenize with the
    exact Python loop (their codepoints were excluded here).
    """
    n = len(texts)
    joined = "\x00".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]  # doc char offsets

    is_cjk = (cp >= CJK_LO) & (cp <= CJK_HI)
    ascii_mask = cp < 128
    is_word = np.zeros(cp.size, dtype=bool)
    is_word[ascii_mask] = _IS_WORD[cp[ascii_mask]]

    # Codepoints outside ASCII + CJK-basic are only a problem when Python
    # \w matches them (they would EXTEND a word run: e, kana, CJK ext-A);
    # non-word ones (CJK punctuation etc.) separate runs in both paths.
    # Test only the handful of DISTINCT offenders, not every char.
    cand = ~ascii_mask & ~is_cjk
    if cand.any():
        import re as _re

        distinct = np.unique(cp[cand])
        wordish = np.array([bool(_re.match(r"\w", chr(int(c)))) for c in distinct])
        bad_vals = distinct[wordish]
    else:
        bad_vals = np.empty(0, dtype=np.int64)
    if bad_vals.size:
        bad_cp = cand & np.isin(cp, bad_vals)
        bad_pos = np.flatnonzero(bad_cp)
        fallback_docs = np.unique(np.searchsorted(starts, bad_pos, side="right") - 1)
        # neutralize ALL their chars so no token leaks from this path
        fb_set = np.zeros(n + 1, dtype=bool)
        fb_set[fallback_docs] = True
        char_doc = np.searchsorted(
            starts, np.arange(cp.size), side="right") - 1
        drop = fb_set[char_doc]
        is_cjk &= ~drop
        is_word &= ~drop
    else:
        fallback_docs = np.empty(0, dtype=np.int64)

    cls = is_word.astype(np.int8) + 2 * is_cjk.astype(np.int8)
    if cp.size == 0 or not cls.any():
        e = np.empty(0, dtype=np.int64)
        return e, e, e, {}, fallback_docs
    brk = np.flatnonzero(np.diff(cls) != 0) + 1
    rs = np.concatenate(([0], brk))
    re_ = np.concatenate((brk, [cp.size]))
    rc = cls[rs]
    run_mask = rc > 0
    rs, re_, rc = rs[run_mask], re_[run_mask], rc[run_mask]
    rl = re_ - rs

    # tokens per run: word -> 1; cjk -> max(1, L-1)
    k = np.where(rc == 1, 1, np.maximum(1, rl - 1))
    total = int(k.sum())
    run_of_tok = np.repeat(np.arange(rs.size), k)
    within = np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(k)))[:-1], k)
    tok_pos = rs[run_of_tok] + within  # start char of each token
    tok_cls = rc[run_of_tok]
    tok_runlen = rl[run_of_tok]

    keys = np.empty(total, dtype=np.int64)
    cjk_tok = tok_cls == 2
    if cjk_tok.any():
        p = tok_pos[cjk_tok]
        single = tok_runlen[cjk_tok] == 1
        kk = np.where(single, cp[p], (cp[p] << 16) | cp[np.minimum(p + 1, cp.size - 1)])
        keys[cjk_tok] = kk
    word_tok = tok_cls == 1
    long_words: dict[str, int] = {}
    if word_tok.any():
        wrs = tok_pos[word_tok]
        wl = tok_runlen[word_tok]
        packable = wl <= MAX_PACK
        # 6-bit pack: sum code(char_j) << 6j over the run, via one
        # repeat/arange expansion + bincount onto the word index
        widx = np.flatnonzero(packable)
        if widx.size:
            ws, wln = wrs[packable], wl[packable]
            m = int(wln.sum())
            wi = np.repeat(np.arange(widx.size), wln)
            off = np.arange(m) - np.repeat(np.concatenate(([0], np.cumsum(wln)))[:-1], wln)
            contrib = _CODE6[cp[np.repeat(ws, wln) + off]] << (6 * off)
            # integer-safe reduce per word (sums can exceed float64's 2^53)
            packed = np.zeros(widx.size, dtype=np.int64)
            np.add.at(packed, wi, contrib)
            wkeys = np.full(word_tok.sum(), 0, dtype=np.int64)
            wkeys[packable] = packed | _WORD_TAG
        else:
            wkeys = np.zeros(word_tok.sum(), dtype=np.int64)
        if (~packable).any():
            for j in np.flatnonzero(~packable):
                s = int(wrs[j])
                w = joined[s:s + int(wl[j])]
                wid = long_words.setdefault(w, len(long_words))
                wkeys[j] = np.int64(wid) | _LONG_TAG
        keys[word_tok] = wkeys

    tok_doc = np.searchsorted(starts, tok_pos, side="right") - 1

    order = np.lexsort((keys, tok_doc))
    d_s, k_s = tok_doc[order], keys[order]
    newg = np.concatenate(([True], (np.diff(d_s) != 0) | (np.diff(k_s) != 0)))
    gidx = np.flatnonzero(newg)
    pair_doc = d_s[gidx]
    pair_key = k_s[gidx]
    pair_tf = np.diff(np.concatenate((gidx, [d_s.size])))

    # decode ONLY the unique keys to strings
    uniq_keys = np.unique(pair_key)
    rev_long = {v: w for w, v in long_words.items()}
    key_to_term: dict[int, str] = {}
    for kv in uniq_keys.tolist():
        if kv & _LONG_TAG:
            key_to_term[kv] = rev_long[kv & ~_LONG_TAG]
        elif kv & _WORD_TAG:
            v = kv & ~_WORD_TAG
            chars = []
            while v:
                chars.append(_DECODE6[v & 63])
                v >>= 6
            key_to_term[kv] = "".join(chars)
        elif kv > 0xFFFF:
            key_to_term[kv] = chr(kv >> 16) + chr(kv & 0xFFFF)
        else:
            key_to_term[kv] = chr(kv)
    return pair_doc, pair_key, pair_tf, key_to_term, fallback_docs
