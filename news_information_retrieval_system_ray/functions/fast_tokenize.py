"""Vectorized cjk_bigram tokenize+count over codepoint arrays.

The per-doc Python loop (regex finditer + Counter) costs ~1.5 us/token;
on a 100 TB webtext corpus tokenization IS the build.  This kernel
reproduces ``tokenize._tokenize_cjk_bigram`` + ``Counter`` exactly for
"simple" documents — every codepoint either ASCII or in the CJK basic
block U+4E00..U+9FFF (the reference's ``一-鿿`` class) — by classifying
a whole batch's codepoints at once:

- token IDENTITY is a 64-bit key (single CJK char = its codepoint; CJK
  bigram = (hi<<16)|lo; ASCII word of <=10 chars = 6-bit-packed with a
  tag bit; longer words via a tiny Python dict);
- the (doc, term)->tf count is ONE argsort of a combined
  ``(doc << 33) | key33`` int64 (keys are remapped into 33 bits: CJK
  keys already fit, word keys dictionary-encode through ``np.unique``
  on the much smaller word-token subset) — not a two-key lexsort over
  the full token stream;
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

_KEY33_WORD = np.int64(1) << np.int64(32)  # word-vocab tag in the sort key
_MASK33 = (np.int64(1) << np.int64(33)) - 1


def _decode_key(kv: int, rev_long: dict[int, str]) -> str:
    """64-bit token key -> term string (unique keys only)."""
    if kv & _LONG_TAG:
        return rev_long[kv & ~_LONG_TAG]
    if kv & _WORD_TAG:
        v = kv & ~_WORD_TAG
        chars = []
        while v:
            chars.append(_DECODE6[v & 63])
            v >>= 6
        return "".join(chars)
    if kv > 0xFFFF:
        return chr(kv >> 16) + chr(kv & 0xFFFF)
    return chr(kv)


def tokenize_batch(texts: list[str], decode_cache: dict[int, str] | None = None):
    """-> (pair_doc, term_idx, pair_tf, vocab, fallback_docs).

    ``pair_doc``/``term_idx``/``pair_tf`` are aligned per-(doc, term)
    count rows grouped by ascending doc (term order within a doc is the
    numeric key order); ``term_idx`` indexes into ``vocab`` (the batch's
    unique term strings, key-sorted); ``fallback_docs`` are doc indices
    the caller must tokenize with the exact Python loop (their
    codepoints were excluded here, and they emit no rows from this
    path).

    ``decode_cache`` (per-actor) memoizes key->string decodes across
    batches — webtext vocabularies repeat heavily, so most of a batch's
    unique keys were already decoded by an earlier batch.  Long-word
    keys are batch-local ids and are never cached.
    """
    n = len(texts)
    empty = np.empty(0, dtype=np.int64)
    joined = "\x00".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]  # doc char offsets

    is_cjk = (cp >= CJK_LO) & (cp <= CJK_HI)
    # single table take: clipped >=128 codepoints land on DEL (non-word)
    is_word = _IS_WORD[np.minimum(cp, 127)]

    # Codepoints outside ASCII + CJK-basic are only a problem when Python
    # \w matches them (they would EXTEND a word run: e, kana, CJK ext-A);
    # non-word ones (CJK punctuation etc.) separate runs in both paths.
    # Test only the handful of DISTINCT offenders, not every char.
    cand = (cp >= 128) & ~is_cjk
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
        return empty, empty, empty, [], fallback_docs
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
    # runs never span docs (the \x00 separator is class 0): assign docs
    # per RUN and repeat, instead of a searchsorted per token
    tok_doc = np.repeat(np.searchsorted(starts, rs, side="right") - 1, k)

    # 33-bit sort keys: CJK keys are (hi<<16)|lo < 2^32; word keys
    # dictionary-encode (np.unique over the word-token subset) into
    # dense ids tagged with bit 32.  np.unique returns keys SORTED, and
    # word/long tag bits order the same way in 64-bit space, so key33
    # order == original 64-bit key order everywhere.
    keys33 = np.empty(total, dtype=np.int64)
    cjk_tok = tok_cls == 2
    if cjk_tok.any():
        p = tok_pos[cjk_tok]
        single = rl[run_of_tok[cjk_tok]] == 1
        keys33[cjk_tok] = np.where(
            single, cp[p], (cp[p] << 16) | cp[np.minimum(p + 1, cp.size - 1)])
    word_tok = tok_cls == 1
    long_words: dict[str, int] = {}
    uniq_wk = empty
    if word_tok.any():
        wrs = tok_pos[word_tok]
        wl = rl[run_of_tok[word_tok]]
        packable = wl <= MAX_PACK
        wkeys = np.zeros(int(word_tok.sum()), dtype=np.int64)
        if packable.any():
            # 6-bit pack: sum code(char_j) << 6j over the run, via one
            # repeat/arange expansion + segmented reduce (word segments
            # are contiguous in the expansion, so reduceat applies and
            # is integer-exact — sums can exceed float64's 2^53)
            ws, wln = wrs[packable], wl[packable]
            off_starts = np.concatenate(([0], np.cumsum(wln)))[:-1]
            off = np.arange(int(wln.sum())) - np.repeat(off_starts, wln)
            contrib = _CODE6[cp[np.repeat(ws, wln) + off]] << (6 * off)
            wkeys[packable] = np.add.reduceat(contrib, off_starts) | _WORD_TAG
        if (~packable).any():
            for j in np.flatnonzero(~packable):
                s = int(wrs[j])
                w = joined[s:s + int(wl[j])]
                wid = long_words.setdefault(w, len(long_words))
                wkeys[j] = np.int64(wid) | _LONG_TAG
        uniq_wk, winv = np.unique(wkeys, return_inverse=True)
        keys33[word_tok] = _KEY33_WORD | winv

    # ONE argsort of the combined (doc, key33) int64 counts every
    # (doc, term) pair; boundary rows gather only at group starts
    combined = (tok_doc << np.int64(33)) | keys33
    order = np.argsort(combined, kind="stable")
    c_s = combined[order]
    gidx = np.concatenate(([0], np.flatnonzero(np.diff(c_s) != 0) + 1))
    heads = c_s[gidx]
    pair_doc = heads >> np.int64(33)
    pair_key33 = heads & _MASK33
    pair_tf = np.diff(np.concatenate((gidx, [c_s.size])))

    # vocab: unique key33 over the (already much smaller) pair stream;
    # decode ONLY those to strings
    uniq33, term_idx = np.unique(pair_key33, return_inverse=True)
    if uniq_wk.size:
        is_w = (uniq33 & _KEY33_WORD) != 0
        dense = np.minimum(uniq33 & np.int64(0xFFFFFFFF), uniq_wk.size - 1)
        uniq_keys = np.where(is_w, uniq_wk[dense], uniq33)
    else:
        uniq_keys = uniq33
    rev_long = {v: w for w, v in long_words.items()}
    if decode_cache is None:
        vocab = [_decode_key(kv, rev_long) for kv in uniq_keys.tolist()]
    else:
        get = decode_cache.get
        long_tag = int(_LONG_TAG)
        vocab = []
        for kv in uniq_keys.tolist():
            s = get(kv)
            if s is None:
                s = _decode_key(kv, rev_long)
                if not kv & long_tag:  # long-word ids are batch-local
                    decode_cache[kv] = s
            vocab.append(s)
        if len(decode_cache) > (1 << 20):
            decode_cache.clear()
    return pair_doc, term_idx, pair_tf, vocab, fallback_docs
