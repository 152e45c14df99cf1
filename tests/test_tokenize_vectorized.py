"""ASCII fast-path parity: TokenizeStage._call_ascii must produce the
same per-doc (term, tf) multiset, doc_len, and hashpair vocab as the
per-doc Python loop, for both engines."""

import numpy as np
import pyarrow as pa
import pytest

from news_information_retrieval_system_ray.stages.tokenizer import TokenizeStage

TEXTS = [
    "the quick brown fox jumps over the lazy dog the fox",
    "hello,world!!  double  spaces\tand_tabs mixed.punct",
    "",
    "a",
    "...",
    "unicode stays out of this batch plain ascii only 123 numbers 123",
    "trailing spaces   ",
    "   leading",
    "dup dup dup dup",
]


def _rows(tbl: pa.Table):
    out = []
    for r in tbl.to_pylist():
        pairs = sorted(zip(r["terms"], r["tfs"]))
        out.append((r["doc_id"], r["doc_len"], pairs))
    return out


@pytest.mark.parametrize("engine", ["cjk_bigram", "whitespace"])
@pytest.mark.parametrize("stops", [None, "en"])
def test_ascii_fast_path_matches_loop(engine, stops):
    batch = pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text_norm": pa.array(TEXTS, pa.string()),
    })
    st = TokenizeStage(engine=engine, stopword_lang=stops, emit_hashpairs=True)
    fast = st(batch)
    # force the loop path by disabling the engine gate
    st_loop = TokenizeStage(engine=engine, stopword_lang=stops, emit_hashpairs=True)
    st_loop.engine = "forced-loop"
    slow = st_loop(batch)
    assert _rows(fast.select(["doc_id", "doc_len", "terms", "tfs"])) == \
        _rows(slow.select(["doc_id", "doc_len", "terms", "tfs"]))
    # hashpair vocab sets agree (order may differ)
    fh = fast.column("hc_hash").to_pylist()[0]
    sh = slow.column("hc_hash").to_pylist()[0]
    assert set(fh) == set(sh)
    assert fast.schema.names == slow.schema.names


def test_cjk_batch_falls_back_to_loop():
    texts = ["純文字的句子測試", "mixed 中文 and ascii"]
    batch = pa.table({
        "doc_id": pa.array(range(2), pa.int64()),
        "text_norm": pa.array(texts, pa.string()),
    })
    st = TokenizeStage(engine="cjk_bigram")
    out = st(batch)
    r0 = out.to_pylist()[0]
    # CJK bigrams present -> proves the loop path ran (fast path would
    # have been wrong here and is gated off by string_is_ascii)
    assert "純文" in r0["terms"]


CJK_TEXTS = [
    "中國 影響 颱風 救援 技術 詞彙600 颱風 詞彙174 台灣",
    "停班停課 詞彙90 word4092 美國 word353 颱風",
    "一",
    "",
    "supercalifragilistic longwordtokenizers12 普通 mixed",
    "只有中文字串沒有空白的長句測試著斷詞",
    "a b c a b a",
    "word_under_score 123 123 123",
    "fallback doc with café accent",      # é -> per-doc loop
    "かな fallback too 中文",              # kana -> per-doc loop
    "   ",
    "標點，測試。括號（內容）！",
]


@pytest.mark.parametrize("stops", [None, "en"])
def test_cjk_simple_path_matches_loop(stops):
    batch = pa.table({
        "doc_id": pa.array(range(len(CJK_TEXTS)), pa.int64()),
        "text_norm": pa.array(CJK_TEXTS, pa.string()),
    })
    st = TokenizeStage(engine="cjk_bigram", stopword_lang=stops,
                       emit_hashpairs=True)
    fast = st._call_cjk_simple(batch, batch.column("text_norm"))
    st_loop = TokenizeStage(engine="cjk_bigram", stopword_lang=stops,
                            emit_hashpairs=True)
    st_loop.engine = "forced-loop"
    slow = st_loop(batch)
    assert _rows(fast.select(["doc_id", "doc_len", "terms", "tfs"])) == \
        _rows(slow.select(["doc_id", "doc_len", "terms", "tfs"]))
    assert set(fast.column("hc_hash").to_pylist()[0]) == \
        set(slow.column("hc_hash").to_pylist()[0])


def test_cjk_simple_random_fuzz():
    import random

    rng = random.Random(42)
    pool = ["颱風", "word", "a", "中", "x1", "測試字", "_", "12345678901234",
            "mixed中文word", "café", "ノ", "。", "()", "z" * 11]
    texts = [" ".join(rng.choices(pool, k=rng.randrange(0, 30)))
             for _ in range(300)]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text_norm": pa.array(texts, pa.string()),
    })
    st = TokenizeStage(engine="cjk_bigram")
    fast = st._call_cjk_simple(batch, batch.column("text_norm"))
    st_loop = TokenizeStage(engine="cjk_bigram")
    st_loop.engine = "forced-loop"
    slow = st_loop(batch)
    assert _rows(fast) == _rows(slow)
