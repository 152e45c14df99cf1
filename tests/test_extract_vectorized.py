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


def test_extract_split_scan_parity_adversarial():
    """The split-scan fast path must be byte-identical to the regex loop
    (textnorm._extract_regex) on every shape, including the ones that
    force its exact-fallback guards."""
    from news_information_retrieval_system_ray.functions.textnorm import _extract_regex

    cases = [
        # mixed-case tags (re.I in the regex) -> case guard fallback
        "<P>upper open</P>",
        "<p>lower open, upper close</P>",
        "<P attr='x'>upper with attr</P><p>then lower</p>",
        # opener whose tag never closes inside its segment: the regex tag
        # [^>]*> swallows the first </p>'s '>' and the match spans
        # segments -> pathological-guard fallback
        "<p foo</p>bar</p>",
        "<p attr\nnever-closes</p>tail</p>",
        # opener candidates the regex skips (<pre>, <param...) before a
        # real one
        "<pre>skip me</pre><p>real</p>",
        "<param x><p>after param</p>",
        "<p　ideographic-space attr>unicode ws in tag</p>",
        # empty / whitespace-only paragraphs, nested openers, tags inside
        "<p></p><p> \t </p><p>keep</p>",
        "<p>a<p>b</p>",
        "<p>x <b>y</b> z</p><p>w</p>",
        # stray closers / openers with no partner
        "</p></p><p>only</p>",
        "<p>unclosed at end",
        "text </p> then <p>ok</p>",
        # multi-paragraph whitespace variety (per-para vs per-doc collapse)
        "<p>a  b</p><p></p><p>  c\nd  </p><p>\te\t</p>",
    ]
    for h in cases:
        assert extract_text_from_html(h) == _extract_regex(h), h


def test_normalize_vec_precollapsed_skip_is_noop():
    """pre_collapsed=True must equal the full chain whenever the input is
    already collapsed+stripped (the HTML-extract invariant)."""
    texts = pa.array(
        ["already collapsed text", "", "臺灣 MIXED Case 中文",
         "single", "a b c 中 文"], pa.string())
    full = ExtractNormalize._normalize_vec(texts, False)
    fast = ExtractNormalize._normalize_vec(texts, True)
    assert full.equals(fast)
