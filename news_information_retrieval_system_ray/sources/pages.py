"""Deterministic synthetic Common-Crawl-style pages corpus.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

- ``text`` is the golden extracted text: the reference's crawler
  extraction chain (paragraph texts, whitespace-collapsed, joined with
  a single space — /root/reference/scripts/crawlers/cna_spider.py:175-179,
  scripts/data/clean_dataset.py:39-63) applied to ``html``.  The
  extraction stage must reproduce it byte-identically.
- Vocabulary includes every reference query term (FIXTURES.md §2) so
  each query has matching docs, stopword-class heavy terms (的 在 是 …)
  for skew, Zipfian filler, and ~1.3% planted exact duplicates
  (matching the reference's observed 530/41000 rate,
  /root/reference/data/index_50k/meta/checkpoint.json).

Everything is seeded and reproducible; generation is for tests/bench
only (real runs read existing Parquet).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.textnorm import clean_text

# Reference query terms (data/evaluation/test_queries.txt) + heavy stopword-class
# terms + English/AI vocabulary.
QUERY_TERMS = [
    "颱風", "災害", "淹水", "救援", "人工智慧", "中國", "政策", "美國", "關係",
    "蘇澳", "宜蘭", "台灣", "鳳凰", "影響", "氣候變遷", "對策", "停班停課",
    "技術", "發展", "兩岸", "經濟", "國防", "安全", "疫苗", "選舉", "半導體", "晶片",
]
HEAVY_TERMS = ["的", "在", "是", "了", "與", "和"]
EN_TERMS = ["ai", "technology", "taiwan", "chip", "economy", "news", "climate", "policy"]
# Web-realistic Zipf tail: a real crawl's vocabulary is 10^5-10^7 terms
# with query terms in the head and most tokens drawn from a long tail
# (FIXTURES.md §1 "filler vocabulary with a Zipfian frequency
# distribution").  A few hundred filler words would make EVERY term a
# df/N~0.5 stopword-class list, which no web corpus looks like.
FILLER = [f"詞彙{i}" for i in range(10000)] + [f"word{i}" for i in range(5000)]

VOCAB = QUERY_TERMS + HEAVY_TERMS + EN_TERMS + FILLER

REFERENCE_QUERIES: dict[str, str] = {
    "Q001": "颱風災害", "Q002": "淹水救援", "Q003": "人工智慧", "Q004": "中國政策",
    "Q005": "美國關係", "Q006": "蘇澳", "Q007": "宜蘭", "Q008": "台灣",
    "Q009": "颱風鳳凰影響", "Q010": "氣候變遷對策", "Q011": "災害 救援 停班停課",
    "Q012": "AI 技術 發展", "Q013": "兩岸 關係 政策", "Q014": "經濟政策", "Q015": "國防安全",
}

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _zipf_weights(n: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** 1.1
    return w / w.sum()


def generate_pages(out_dir: str, n_docs: int = 1000, seed: int = 42,
                   n_files: int = 4, dup_rate: float = 0.013,
                   para_range: tuple[int, int] = (1, 5),
                   words_range: tuple[int, int] = (8, 40)) -> list[str]:
    """Write a deterministic pages corpus as ``n_files`` parquet files.

    Returns the sorted list of file paths. Idempotent for identical
    parameters (regenerates byte-identical files).
    """
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB, dtype=object)
    weights = _zipf_weights(len(vocab))
    cumw = np.cumsum(weights)
    os.makedirs(out_dir, exist_ok=True)

    # bulk-draw all randomness (per-call rng.choice(p=...) rebuilds the
    # CDF every time — searchsorted over one uniform block is ~50x faster)
    srcs = rng.integers(0, 20, size=n_docs)
    ts_jit = rng.integers(0, 50_000_000, size=n_docs)
    dup_draw = rng.random(n_docs)
    dup_pick = rng.random(n_docs)
    n_titles = rng.integers(3, 7, size=n_docs)
    n_paras_all = rng.integers(para_range[0], para_range[1], size=n_docs)
    max_paras = int(n_paras_all.max())
    n_words_all = rng.integers(words_range[0], words_range[1], size=(n_docs, max_paras))
    lang_draw = rng.random(n_docs)
    total_words = int(n_titles.sum()) + int((n_words_all * (np.arange(max_paras) < n_paras_all[:, None])).sum())
    word_stream = vocab[np.searchsorted(cumw, rng.random(total_words) * cumw[-1])]
    wpos = 0

    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = np.datetime64("2025-11-01T00:00:00", "us")
    prev: list[tuple[str, str]] = []  # (html, text) pool for planted dups
    for i in range(n_docs):
        url = f"https://example-src{int(srcs[i])}.tw/news/202511{(i % 28) + 1:02d}{i:06d}"
        ts = base_ts + np.timedelta64(int(i) * 60_000_000 + int(ts_jit[i]), "us")
        if prev and dup_draw[i] < dup_rate:
            html, text = prev[int(dup_pick[i] * len(prev))]
        else:
            nt = int(n_titles[i])
            title = " ".join(word_stream[wpos : wpos + nt])
            wpos += nt
            paras = []
            for j in range(int(n_paras_all[i])):
                nw = int(n_words_all[i, j])
                paras.append("  ".join(word_stream[wpos : wpos + nw]) + "。")
                wpos += nw
            body = "".join(f"<p>{p}</p>" for p in paras)
            html = (
                f"<html><head><title>{title}</title></head><body><h1>{title}</h1>"
                f"<div class=\"nav\">首頁 新聞 分類</div>{body}"
                f"<div class=\"footer\">版權所有 © example</div></body></html>"
            )
            text = " ".join(clean_text(p) for p in paras)
            prev.append((html, text))
        urls.append(url)
        tss.append(ts)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append("zh-tw" if lang_draw[i] < 0.8 else "en")

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    paths = []
    rows_per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        part = table.slice(f * rows_per, rows_per)
        path = os.path.join(out_dir, f"pages_{f:04d}.parquet")
        pq.write_table(part, path, row_group_size=max(1, rows_per // 2))
        paths.append(path)
    return sorted(paths)
