"""Vectorized ExtractNormalize parity vs the per-doc Python chain."""

import pyarrow as pa
import pytest

from news_information_retrieval_system_ray.functions.textnorm import (
    extract_text_from_html, normalize_text)
from news_information_retrieval_system_ray.stages.extract import ExtractNormalize

HTMLS = [
    "<html><body><p>hello world</p><p>second  para</p></body></html>",
    "<p>中文 段落 測試。</p><p>第二 段</p>",
    "<p class='x'>attr <b>bold</b> text</p>junk between<p>tail</p>trailing",
    "no paragraphs at all",
    "",
    "<p></p><p>  </p><p>only real one</p>",
    "<p>nested <p>inner</p> after</p>",
    "<P>UPPER case tags</P>",
    "<p>multi\nline\t\twhitespace</p>",
    "<p>臺灣 should normalize to 台灣</p>",
    "<p>unicode café fallback row</p>",          # non-simple -> loop
    "<p>ideographic　space fallback</p>",    # non-simple -> loop
]


def test_extract_vectorized_parity():
    batch = pa.table({
        "doc_id": pa.array(range(len(HTMLS)), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(len(HTMLS))], pa.string()),
        "html": pa.array(HTMLS, pa.string()),
    })
    out = ExtractNormalize(text_col="text", use_html=True)(batch)
    want_text = [extract_text_from_html(h) for h in HTMLS]
    want_norm = [normalize_text(t) for t in want_text]
    assert out.column("text").to_pylist() == want_text
    assert out.column("text_norm").to_pylist() == want_norm


def test_extract_text_passthrough_parity():
    texts = ["Plain TEXT  here", "中文　non-simple　row", "", "臺北 ok"]
    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = ExtractNormalize(use_html=False)(batch)
    assert out.column("text").to_pylist() == [t or "" for t in texts]
    assert out.column("text_norm").to_pylist() == [normalize_text(t) for t in texts]


def test_extract_real_corpus_file_parity():
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob("/tmp/nirs_bench_pages_v2_400000/*.parquet"))
    if not files:
        pytest.skip("bench corpus not generated")
    t = pq.read_table(files[0], columns=["url", "html"]).slice(0, 1500)
    t = t.append_column("doc_id", pa.array(range(t.num_rows), pa.int64()))
    out = ExtractNormalize(text_col="text", use_html=True)(t)
    htmls = [h.decode("utf-8") if isinstance(h, (bytes, bytearray)) else h
             for h in t.column("html").to_pylist()]
    want = [extract_text_from_html(h) for h in htmls]
    assert out.column("text").to_pylist() == want
    assert out.column("text_norm").to_pylist() == [normalize_text(w) for w in want]
