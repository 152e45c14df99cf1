"""CSoundex phonetic encoding parity (csoundex.py:232-533 formulas over
the vendored pinyin lexicon) + the index/query stopword-filter option."""

import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from news_information_retrieval_system_ray.functions.csoundex import (
    code_key,
    encode,
    encode_character,
    find_similar,
    normalize_pinyin,
    similarity,
    split_initial_final,
)
from news_information_retrieval_system_ray.pipelines.index_build import build_index
from news_information_retrieval_system_ray.pipelines.query import IndexSearcher


# ------------------------------------------------------------- csoundex

def test_normalize_pinyin_components():
    # docstring examples csoundex.py:245-251
    assert normalize_pinyin("zhang1") == ("zh", "ang", "1")
    assert normalize_pinyin("yi4") == ("", "i", "4")
    assert normalize_pinyin("a1") == ("", "a", "1")
    assert normalize_pinyin("ZHANG1") == ("zh", "ang", "1")
    assert normalize_pinyin("zhang") == ("zh", "ang", "0")  # no tone -> neutral


def test_split_special_cases():
    assert split_initial_final("yu") == ("", "v")      # yu -> v
    assert split_initial_final("wu") == ("", "u")
    assert split_initial_final("yi") == ("", "i")
    assert split_initial_final("an") == ("", "an")     # zero initial


def test_encode_examples():
    # 張 = zhang1 -> Z + zh(8) + ang(9); docstring example csoundex.py:52
    assert encode_character("張") == "Z89"
    assert encode_character("張", include_tone=True) == "Z891"
    assert encode("張三") == "Z89 S99"        # 三 = san1 -> S + s(9) + an(9)
    # ASCII letters -> uppercase letter; digits/punct skipped
    assert encode("ab3!") == "A B"


def test_similarity_modes():
    assert similarity("張三", "章三") == 1.0   # 章 is also zhang1 -> same codes
    assert similarity("張三", "李四") == 0.0
    assert similarity("spark", "spork") == 0.8  # 4/5 positional letters
    assert similarity("張三", "張三", mode="exact") == 1.0
    # weighted: first position dominates
    w = similarity("spark", "szark", mode="weighted")
    assert 0.0 < w < 1.0
    with pytest.raises(ValueError):
        similarity("a", "b", mode="nope")


def test_find_similar_threshold_topk():
    out = find_similar("張", ["章", "李", "王"], threshold=0.5, topk=8)
    assert out == [("章", 1.0)]
    # app parameters (search_service.py:397-411)
    out = find_similar("spark", ["spark", "spork", "stark", "zzz"],
                       threshold=0.72, topk=8)
    assert out[0] == ("spark", 1.0)
    assert all(s >= 0.72 for _, s in out)


def test_code_key_buckets_homophones():
    assert code_key("張三") == code_key("章三")
    assert code_key("張三") != code_key("李四")


# ------------------------------------------------- stopword filter option

def test_stopword_filtered_build_and_query(ray_session, tmp_path):
    texts = ["the cat sat on the mat", "a dog and the bird", "cat bird dance"]
    pq.write_table(pa.table({"doc_id": pa.array(range(3), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   str(tmp_path / "docs.parquet"))
    idx = tempfile.mkdtemp(prefix="stop_idx_")
    build_index(str(tmp_path / "docs.parquet"), idx, text_source="text",
                id_col="doc_id", engine="whitespace", n_shards=1,
                chunk_bits=8, resume=False, stopword_lang="en")
    s = IndexSearcher(idx)
    # stopwords have no postings
    assert s.postings("the")[0].size == 0
    assert s.postings("and")[0].size == 0
    # content words do
    assert list(s.postings("cat")[0]) == [0, 2]
    # doc_len counts only surviving tokens: doc0 "cat sat mat" -> 3
    ids, _, dls = s.postings("cat")
    assert dls[list(ids).index(0)] == 3
    # query-side filter drops the stopword from the query
    assert s._query_terms("the cat") == ["cat"]
    res = s.search("the cat", k=5)
    assert {d for d, _ in res} == {0, 2}
