"""Source / topic taxonomy normalization for news records.

Reference parity: ``src/ir_app/services/taxonomy.py`` — the vendored
mapping tables (TOPIC_LABELS :10-22, SOURCE_LABELS :24-33,
YAHOO_FILE_TOPICS :35-44, CATEGORY_ALIASES :46-84) and the
normalization functions: ``normalize_source`` (:118-132: strip ->
'unknown' default -> yahoo/cna casing fixes -> label fallback chain),
``classify_category`` (:134-160: yahoo-filename prefix first, then
exact alias, then lowercased alias, over (category, category_name) in
order, defaulting to other/unknown), ``normalize_taxonomy`` (:162-186:
field-fallback across source|crawl_source etc., taxonomy_path =
``news/{topic}/{leaf}``), ``facet_label`` (:188-203).

These are per-record O(1) lookups — in the Ray rebuild they run inside
``map_batches`` as a vectorizable dictionary map (the tables are tiny
constants captured by the stage closure)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

TOPIC_LABELS = {
    "politics": "政治 Politics",
    "world": "國際 World",
    "business": "財經 Business",
    "tech": "科技 Tech",
    "society": "社會 Society",
    "lifestyle": "生活 Lifestyle",
    "entertainment": "娛樂 Entertainment",
    "sports": "體育 Sports",
    "health": "健康 Health",
    "local": "地方 Local",
    "other": "其他 Other",
}

SOURCE_LABELS = {
    "cna": "中央社 CNA",
    "LTN": "自由時報 LTN",
    "NextApple": "壹蘋新聞網 NextApple",
    "SETN": "三立新聞 SETN",
    "UDN": "聯合新聞網 UDN",
    "PTS": "公視 PTS",
    "Yahoo": "Yahoo 新聞",
    "dcard": "Dcard",
}

YAHOO_FILE_TOPICS = {
    "yahoo_entertainment": ("entertainment", "entertainment"),
    "yahoo_finance": ("business", "finance"),
    "yahoo_health": ("health", "health"),
    "yahoo_lifestyle": ("lifestyle", "lifestyle"),
    "yahoo_politics": ("politics", "politics"),
    "yahoo_sports": ("sports", "sports"),
    "yahoo_tech": ("tech", "tech"),
    "yahoo_world": ("world", "world"),
}

CATEGORY_ALIASES = {
    "aipl": ("politics", "politics"),
    "政治": ("politics", "politics"),
    "politics": ("politics", "politics"),
    "國際": ("world", "world"),
    "全球": ("world", "world"),
    "world": ("world", "world"),
    "財經": ("business", "finance"),
    "產經": ("business", "finance"),
    "finance": ("business", "finance"),
    "business": ("business", "business"),
    "AI科技": ("tech", "ai"),
    "3C": ("tech", "gadget"),
    "gadget": ("tech", "gadget"),
    "aitech": ("tech", "ai"),
    "tech": ("tech", "tech"),
    "社會": ("society", "society"),
    "society": ("society", "society"),
    "生活": ("lifestyle", "life"),
    "life": ("lifestyle", "life"),
    "娛樂": ("entertainment", "entertainment"),
    "entertainment": ("entertainment", "entertainment"),
    "體育": ("sports", "sports"),
    "sports": ("sports", "sports"),
    "健康": ("health", "health"),
    "health": ("health", "health"),
    "地方": ("local", "local"),
    "local": ("local", "local"),
    "兩岸": ("politics", "cross_strait"),
    "房地產": ("business", "property"),
    "property": ("business", "property"),
    "其他": ("other", "other"),
    "other": ("other", "other"),
    "unknown": ("other", "unknown"),
    "未分類": ("other", "unknown"),
    "": ("other", "unknown"),
}

CONTENT_TYPE_LABELS = {"news_article": "新聞 News", "forum_post": "論壇 Forum"}


@dataclass(frozen=True)
class TaxonomyInfo:
    source: str
    source_name: str
    source_label: str
    taxonomy_topic: str
    taxonomy_label: str
    taxonomy_path: str

    def to_dict(self) -> dict[str, str]:
        return {
            "source": self.source,
            "source_name": self.source_name,
            "source_label": self.source_label,
            "taxonomy_topic": self.taxonomy_topic,
            "taxonomy_label": self.taxonomy_label,
            "taxonomy_path": self.taxonomy_path,
        }


def normalize_source(source: Any, source_name: Any = None) -> tuple[str, str, str]:
    """(code, name, label) — taxonomy.py:118-132 semantics."""
    code = str(source or "").strip() or "unknown"
    if code.lower() == "yahoo":
        code = "Yahoo"
    if code.lower() == "cna":
        code = "cna"
    name = str(source_name or "").strip() or SOURCE_LABELS.get(code, code)
    return code, name, SOURCE_LABELS.get(code, name)


def classify_category(category: Any, category_name: Any = None,
                      origin_path: Any = None) -> tuple[str, str]:
    """(topic, leaf) — taxonomy.py:134-160 priority order."""
    path_text = str(origin_path or "")
    if path_text:
        path_name = path_text.replace("\\", "/").rsplit("/", 1)[-1].lower()
        for prefix, mapped in YAHOO_FILE_TOPICS.items():
            if path_name.startswith(prefix):
                return mapped
    for value in (category, category_name):
        key = str(value or "").strip()
        if key in CATEGORY_ALIASES:
            return CATEGORY_ALIASES[key]
        lower_key = key.lower()
        if lower_key in CATEGORY_ALIASES:
            return CATEGORY_ALIASES[lower_key]
    return CATEGORY_ALIASES["unknown"]


def normalize_taxonomy(raw: dict[str, Any], origin_path: Any = None) -> TaxonomyInfo:
    """taxonomy.py:162-186 with the same field-fallback chains."""
    source, source_name, source_label = normalize_source(
        raw.get("source") or raw.get("crawl_source"),
        raw.get("source_name") or raw.get("forum_name"),
    )
    topic, leaf = classify_category(
        raw.get("category") or raw.get("forum_alias"),
        raw.get("category_name") or raw.get("forum_name"),
        origin_path or raw.get("origin_path"),
    )
    return TaxonomyInfo(
        source=source,
        source_name=source_name,
        source_label=source_label,
        taxonomy_topic=topic,
        taxonomy_label=TOPIC_LABELS.get(topic, TOPIC_LABELS["other"]),
        taxonomy_path=f"news/{topic}/{leaf}",
    )


def facet_label(field: str, value: Any) -> str:
    """taxonomy.py:188-203."""
    text = str(value or "")
    if field == "taxonomy_topic":
        return TOPIC_LABELS.get(text, text)
    if field == "source":
        return SOURCE_LABELS.get(text, text)
    if field == "content_type":
        return CONTENT_TYPE_LABELS.get(text, text)
    return text
