"""SMART weighting schemes (term_weighting.py:101-189) and synonym
expansion (text_quality.py:90-177)."""

import math

import pytest

from news_information_retrieval_system_ray.functions.synonyms import SYNONYMS, expand_terms
from news_information_retrieval_system_ray.functions.term_weighting import cosine, smart_vector

DF = {"a": 1, "b": 2, "c": 4}
N = 4
TFS = {"a": 3, "b": 1, "c": 2}


def test_smart_nnn_is_raw_tf():
    assert smart_vector(TFS, DF, N, "nnn") == TFS


def test_smart_ltn():
    v = smart_vector(TFS, DF, N, "ltn")
    assert v["a"] == pytest.approx((1 + math.log10(3)) * math.log10(4 / 1))
    assert v["b"] == pytest.approx(1.0 * math.log10(4 / 2))
    assert "c" not in v  # idf t of df==N -> log10(1)=0 -> dropped


def test_smart_ann_augmented():
    v = smart_vector(TFS, DF, N, "ann")
    assert v["a"] == pytest.approx(0.5 + 0.5 * 3 / 3)
    assert v["c"] == pytest.approx(0.5 + 0.5 * 2 / 3)


def test_smart_bpn_boolean_prob():
    v = smart_vector(TFS, DF, N, "bpn")
    assert v["a"] == pytest.approx(math.log10((4 - 1) / 1))
    assert "b" not in v  # p-idf of df==N/2 -> log10(1)=0 -> dropped
    assert "c" not in v  # p-idf of df==N -> 0


def test_smart_cosine_normalized():
    v = smart_vector(TFS, DF, N, "ltc")
    assert math.sqrt(sum(x * x for x in v.values())) == pytest.approx(1.0)
    assert cosine(v, v) == pytest.approx(1.0)


def test_smart_rejects_bad_scheme():
    with pytest.raises(ValueError):
        smart_vector(TFS, DF, N, "xxx")
    with pytest.raises(ValueError):
        smart_vector(TFS, DF, N, "ltcz")


def test_cosine_disjoint_zero():
    assert cosine({"a": 1.0}, {"b": 1.0}) == 0.0


def test_synonyms_bidirectional():
    assert "人工智慧" in SYNONYMS["ai"] and "ai" in SYNONYMS["人工智慧"]
    assert "晶片" in SYNONYMS["半導體"]


def test_expand_terms_order_and_dedup():
    out = expand_terms(["ai", "半導體"])
    assert out[:2] == ["ai", "半導體"]
    assert "人工智慧" in out and "晶片" in out
    assert len(out) == len(set(out))
    assert expand_terms(["novel"]) == ["novel"]
