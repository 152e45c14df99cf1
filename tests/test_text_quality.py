"""Text-quality kernels (text_quality.py:11-177): low-info/protected
classification, significant terms, synonym map semantics."""

from news_information_retrieval_system_ray.functions.synonyms import (
    SYNONYMS,
    expand_terms,
)
from news_information_retrieval_system_ray.functions.text_quality import (
    analysis,
    is_low_information,
    matching_terms,
    removed_stopwords,
    significant_terms,
    synonym_terms,
)


def test_low_information_classes():
    assert is_low_information("的")            # zh stopword
    assert is_low_information("記者")          # news low-info list
    assert not is_low_information("ai")        # protected beats stopword
    assert not is_low_information("台灣")      # protected
    assert not is_low_information("臺灣")      # protected via 臺->台 collapse
    assert not is_low_information("spark")     # ordinary term


def test_significant_and_removed_partition():
    terms = ["的", "spark", "ai", "記者", "foo"]
    assert significant_terms(terms) == ["spark", "ai", "foo"]
    assert removed_stopwords(terms) == ["的", "記者"]


def test_synonym_map_is_directed_reference_verbatim():
    # directed edges (text_quality.py:41-51): 半導體 -> [晶片, 芯片]
    # in list order; 晶片 -> [半導體] only; 美方 is NOT a key
    assert SYNONYMS["半導體"] == ["晶片", "芯片"]
    assert SYNONYMS["晶片"] == ["半導體"]
    assert "美方" not in SYNONYMS
    assert SYNONYMS["中國"] == ["大陸", "中方"]
    assert SYNONYMS["氣候變遷"] == ["氣候變化"]


def test_synonym_terms_excludes_normalized_originals():
    # 臺灣's synonym 台灣 normalizes onto the original -> excluded
    assert synonym_terms(["臺灣"]) == []
    assert synonym_terms(["ai"]) == ["人工智慧"]
    # phrase-in-text branch: 氣候變遷 appears in the raw text only
    assert synonym_terms(["news"], "今日 氣候變遷 專題") == ["氣候變化"]


def test_matching_terms_and_expand_terms():
    assert matching_terms(["的", "ai"]) == ["ai", "人工智慧"]
    out = expand_terms(["中國"])
    assert out == ["中國", "大陸", "中方"]   # map-list order preserved


def test_analysis_payload():
    q = "的 Spark ai 臺灣 記者 foo"
    terms = ["的", "spark", "ai", "台灣", "記者", "foo"]
    a = analysis(q, terms)
    assert a["normalized_query"] == "的 spark ai 台灣 記者 foo"
    assert a["term_count"] == 6
    assert a["significant_terms"] == ["spark", "ai", "台灣", "foo"]
    assert a["removed_stopwords"] == ["的", "記者"]
    assert a["synonym_terms"] == ["人工智慧"]
