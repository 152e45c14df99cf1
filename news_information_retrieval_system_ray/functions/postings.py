"""Block-compressed posting-list layout.

Replaces the reference's in-heap ``Dict[term, List[(doc_id, tf)]]``
(/root/reference/src/ir/index/inverted_index.py:45-59) with a columnar,
shardable layout: postings are split into fixed-size blocks; within a
block doc_ids are delta-encoded (first value absolute) + VByte, tfs and
doc_lens VByte.  Every block is self-contained, so posting lists built
for disjoint doc-id chunks (the skew-splitting shuffle, SURVEY §7.5)
merge by plain concatenation — no re-encode.

Per-block metadata (``block_last_doc``, ``block_max_weight``) enables
block-max WAND skipping (the reference's term upper bounds,
query_optimization.py:164-189, extended to per-block maxima).
``block_max_weight`` stores the max BM25 tf/doc-len weight (IDF
excluded — IDF is a per-term constant applied at query time).

Storing doc_len inline with each posting makes query scoring
self-contained (no doc-id -> length sidecar lookup at 10^12-doc scale).
"""

from __future__ import annotations

import numpy as np

from .bm25 import tf_weight
from .codecs import vbyte_decode, vbyte_encode

BLOCK_SIZE = 128

PACKED_FIELDS = (
    "df", "cf", "docs_bytes", "tfs_bytes", "dls_bytes",
    "block_doc_nbytes", "block_tf_nbytes", "block_dl_nbytes",
    "block_len", "block_last_doc", "block_max_weight",
)


def pack_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                  avgdl: float, block_size: int = BLOCK_SIZE) -> dict:
    """Encode one (chunk of a) posting list sorted by doc_id.

    Returns a dict of the PACKED_FIELDS columns (term not included).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    dls = np.ascontiguousarray(dls, dtype=np.int64)
    n = doc_ids.size
    docs_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    dl_parts: list[bytes] = []
    b_doc_nb: list[int] = []
    b_tf_nb: list[int] = []
    b_dl_nb: list[int] = []
    b_len: list[int] = []
    b_last: list[int] = []
    b_maxw: list[float] = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        ids = doc_ids[s:e]
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = np.uint64(ids[0])
        if e - s > 1:
            deltas[1:] = np.diff(ids).astype(np.uint64)
        db = vbyte_encode(deltas)
        tb = vbyte_encode(tfs[s:e].astype(np.uint64))
        lb = vbyte_encode(dls[s:e].astype(np.uint64))
        docs_parts.append(db)
        tf_parts.append(tb)
        dl_parts.append(lb)
        b_doc_nb.append(len(db))
        b_tf_nb.append(len(tb))
        b_dl_nb.append(len(lb))
        b_len.append(e - s)
        b_last.append(int(ids[-1]))
        b_maxw.append(float(tf_weight(tfs[s:e], dls[s:e], avgdl).max()))
    return {
        "df": n,
        "cf": int(tfs.sum()),
        "docs_bytes": b"".join(docs_parts),
        "tfs_bytes": b"".join(tf_parts),
        "dls_bytes": b"".join(dl_parts),
        "block_doc_nbytes": b_doc_nb,
        "block_tf_nbytes": b_tf_nb,
        "block_dl_nbytes": b_dl_nb,
        "block_len": b_len,
        "block_last_doc": b_last,
        "block_max_weight": b_maxw,
    }


def merge_packed(chunks: list[dict]) -> dict:
    """Concatenate packed chunks with disjoint, increasing doc-id ranges.

    Chunks must be ordered by their doc-id range (the chunked groupby
    emits them keyed by ``doc_id >> CHUNK_BITS``, so sorting by first
    block_last_doc is sufficient).  Blocks are self-contained, so the
    merge is pure byte/list concatenation (SURVEY §7.5 skew handling).
    """
    if len(chunks) == 1:
        return chunks[0]
    out = {
        "df": sum(c["df"] for c in chunks),
        "cf": sum(c["cf"] for c in chunks),
        "docs_bytes": b"".join(c["docs_bytes"] for c in chunks),
        "tfs_bytes": b"".join(c["tfs_bytes"] for c in chunks),
        "dls_bytes": b"".join(c["dls_bytes"] for c in chunks),
    }
    for f in ("block_doc_nbytes", "block_tf_nbytes", "block_dl_nbytes",
              "block_len", "block_last_doc", "block_max_weight"):
        acc: list = []
        for c in chunks:
            acc.extend(c[f])
        out[f] = acc
    if "positions_bytes" in chunks[0]:
        out["positions_bytes"] = b"".join(c["positions_bytes"] for c in chunks)
        pos_nb: list = []
        for c in chunks:
            pos_nb.extend(c["pos_nbytes"])
        out["pos_nbytes"] = pos_nb
    return out


def unpack_postings(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a packed posting row -> (doc_ids int64, tfs int64, dls int64)."""
    n_blocks = len(row["block_len"])
    doc_out = np.empty(int(row["df"]), dtype=np.int64)
    tf_out = np.empty(int(row["df"]), dtype=np.int64)
    dl_out = np.empty(int(row["df"]), dtype=np.int64)
    d_off = t_off = l_off = 0
    p = 0
    docs_b = row["docs_bytes"]
    tfs_b = row["tfs_bytes"]
    dls_b = row["dls_bytes"]
    for i in range(n_blocks):
        dn = int(row["block_doc_nbytes"][i])
        tn = int(row["block_tf_nbytes"][i])
        ln = int(row["block_dl_nbytes"][i])
        m = int(row["block_len"][i])
        deltas = vbyte_decode(docs_b[d_off : d_off + dn])
        doc_out[p : p + m] = np.cumsum(deltas.astype(np.int64))
        tf_out[p : p + m] = vbyte_decode(tfs_b[t_off : t_off + tn]).astype(np.int64)
        dl_out[p : p + m] = vbyte_decode(dls_b[l_off : l_off + ln]).astype(np.int64)
        d_off += dn
        t_off += tn
        l_off += ln
        p += m
    return doc_out, tf_out, dl_out


def unpack_block(row: dict, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode only block ``i`` of a packed posting row (WAND skipping path)."""
    d_off = int(sum(row["block_doc_nbytes"][:i]))
    t_off = int(sum(row["block_tf_nbytes"][:i]))
    l_off = int(sum(row["block_dl_nbytes"][:i]))
    dn = int(row["block_doc_nbytes"][i])
    tn = int(row["block_tf_nbytes"][i])
    ln = int(row["block_dl_nbytes"][i])
    deltas = vbyte_decode(row["docs_bytes"][d_off : d_off + dn])
    ids = np.cumsum(deltas.astype(np.int64))
    tfs = vbyte_decode(row["tfs_bytes"][t_off : t_off + tn]).astype(np.int64)
    dls = vbyte_decode(row["dls_bytes"][l_off : l_off + ln]).astype(np.int64)
    return ids, tfs, dls
