"""Taxonomy normalization (functions/taxonomy.py) — semantics parity
with the reference's taxonomy.py:118-203."""

from news_information_retrieval_system_ray.functions.taxonomy import (
    classify_category,
    facet_label,
    normalize_source,
    normalize_taxonomy,
)


def test_normalize_source_casing_and_labels():
    assert normalize_source("yahoo") == ("Yahoo", "Yahoo 新聞", "Yahoo 新聞")
    assert normalize_source("CNA")[0] == "cna"
    assert normalize_source("CNA")[2] == "中央社 CNA"
    # unknown source: name and label fall back to the code
    assert normalize_source("misc") == ("misc", "misc", "misc")
    assert normalize_source(None) == ("unknown", "unknown", "unknown")
    # explicit name wins over the label table for the name slot
    assert normalize_source("LTN", "自由")[1] == "自由"


def test_classify_category_priority():
    # yahoo filename prefix outranks the category
    assert classify_category("政治", None, "raw/yahoo_finance_01.jsonl") == \
        ("business", "finance")
    # exact alias (incl. CJK and case-sensitive keys)
    assert classify_category("AI科技") == ("tech", "ai")
    assert classify_category("3C") == ("tech", "gadget")
    assert classify_category("兩岸") == ("politics", "cross_strait")
    # lowercased fallback
    assert classify_category("TECH") == ("tech", "tech")
    # category_name is the second candidate
    assert classify_category("nope", "財經") == ("business", "finance")
    # nothing matches -> other/unknown
    assert classify_category("zzz") == ("other", "unknown")
    assert classify_category(None) == ("other", "unknown")


def test_normalize_taxonomy_field_fallbacks():
    info = normalize_taxonomy({"crawl_source": "dcard", "forum_alias": "生活"})
    assert info.source == "dcard"
    assert info.source_label == "Dcard"
    assert info.taxonomy_topic == "lifestyle"
    assert info.taxonomy_path == "news/lifestyle/life"
    assert info.taxonomy_label == "生活 Lifestyle"
    assert info.to_dict()["taxonomy_path"] == "news/lifestyle/life"


def test_facet_label():
    assert facet_label("taxonomy_topic", "tech") == "科技 Tech"
    assert facet_label("source", "PTS") == "公視 PTS"
    assert facet_label("content_type", "forum_post") == "論壇 Forum"
    assert facet_label("anything", "x") == "x"
    assert facet_label("source", None) == ""
