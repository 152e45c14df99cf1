"""Extraction / normalization stage (map_batches bodies).

Reproduces, per url, the reference's extraction + cleaning chain
byte-identically (crawler paragraph join, cna_spider.py:175-179 +
clean_dataset.py:39-63) and the app normalization
(index_service.py:71-81).  Stateless pure function over Arrow batches;
``html`` is dropped from the output immediately (SURVEY §7.6.9 — wide
binary columns must not travel further than needed).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textnorm import extract_text_from_html, normalize_text


class ExtractNormalize:
    """Callable stage: html/text -> (passthrough cols, text, text_norm).

    If ``html_col`` is present and ``use_html`` is True the text is
    re-extracted from HTML (the byte-identical invariant path);
    otherwise the existing ``text_col`` is used.
    """

    def __init__(self, html_col: str = "html", text_col: str = "text",
                 use_html: bool = True, keep_cols: tuple[str, ...] = ("url", "doc_id", "shard")):
        self.html_col = html_col
        self.text_col = text_col
        self.use_html = use_html
        self.keep_cols = keep_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_html and self.html_col in batch.column_names:
            htmls = batch.column(self.html_col).to_pylist()
            texts = [extract_text_from_html(h.decode("utf-8") if isinstance(h, (bytes, bytearray)) else (h or "")) for h in htmls]
        else:
            texts = [t or "" for t in batch.column(self.text_col).to_pylist()]
        norms = [normalize_text(t) for t in texts]
        cols: dict[str, pa.Array] = {}
        for c in self.keep_cols:
            if c in batch.column_names:
                cols[c] = batch.column(c)
        cols["text"] = pa.array(texts, pa.string())
        cols["text_norm"] = pa.array(norms, pa.string())
        return pa.table(cols)
