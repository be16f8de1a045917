"""Posting-block codec: delta-gap + LEB128 varint, skip pointers, block-max.

Pure numpy, fully vectorized (no per-value Python in encode or decode) — this
runs inside Arrow pandas UDFs on the executors, so it must be allocation-lean
and loop-free except over the ≤10 varint byte positions.

Format (one posting list = one (term, shard) unit, doc_ids strictly
increasing):

- docs are split into blocks of ``block_size`` (default 128);
- per block we store:
    first_doc   int64   absolute doc_id of the first entry (skip pointer key)
    last_doc    int64   absolute doc_id of the last entry (skip pointer key)
    n           int32   entries in the block
    deltas      binary  varint(doc_id diffs; first diff vs first_doc, ≥1)
    tfs         binary  varint(term frequencies, ≥1)
    dls         binary  varint(doc lengths) — co-stored so scoring needs no
                        query-time join against a doc_stats table
    max_tf      int32   max tf in block
    max_score   double  max BM25 impact of any entry in the block, given the
                        corpus stats at build time (block-max WAND bound)
- the per-list array of (first_doc, last_doc) IS the skip-pointer table:
  query-time navigation is np.searchsorted over first_doc/last_doc, i.e. an
  O(log #blocks) skip to the first block that can contain a target doc.

The reference has no postings at all (it stores per-doc dicts,
/root/reference/search_engine/bm25.py:37-43); this layout is a north-rule
requirement, not reference parity.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE_DEFAULT = 128

# ---------------------------------------------------------------------------
# varint (LEB128) — vectorized
# ---------------------------------------------------------------------------


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array → LEB128 bytes. Vectorized: ≤10 passes over the array."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbytes = np.ones(vals.shape, dtype=np.int64)
    cur = vals >> np.uint64(7)
    while cur.any():
        nbytes += (cur != 0).astype(np.int64)
        cur >>= np.uint64(7)
    offsets = np.zeros(vals.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    cur = vals.copy()
    active = np.ones(vals.shape, dtype=bool)
    r = 0
    while active.any():
        b = (cur & np.uint64(0x7F)).astype(np.uint8)
        more = cur >= np.uint64(0x80)
        b[more] |= 0x80
        idx = offsets[:-1][active] + r
        out[idx] = b[active]
        cur >>= np.uint64(7)
        active = more
        r += 1
    return out.tobytes()


def varint_decode(buf: bytes, n: int | None = None) -> np.ndarray:
    """LEB128 bytes → uint64 array. Vectorized over byte positions."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(arr < 0x80)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    if n is not None and ends.size != n:
        raise ValueError(f"expected {n} varints, found {ends.size}")
    vals = np.zeros(ends.size, dtype=np.uint64)
    max_len = int(lengths.max())
    for r in range(max_len):
        mask = lengths > r
        vals[mask] |= (arr[starts[mask] + r] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * r)
    return vals


# ---------------------------------------------------------------------------
# block building / reading
# ---------------------------------------------------------------------------


def bm25_impact(tf: np.ndarray, doc_len: np.ndarray, idf: float,
                avgdl: float, k1: float, b: float) -> np.ndarray:
    """Exact per-posting BM25 contribution (float64) — used both for
    block-max bounds at build time and for scoring at query time."""
    tf = tf.astype(np.float64)
    denom = tf + k1 * (1.0 - b + b * (doc_len.astype(np.float64) / avgdl))
    return idf * tf * (k1 + 1.0) / denom


def encode_posting_list(doc_ids: np.ndarray, tfs: np.ndarray,
                        doc_lens: np.ndarray, idf: float, avgdl: float,
                        k1: float, b: float,
                        block_size: int = BLOCK_SIZE_DEFAULT) -> list[dict]:
    """One sorted posting list → list of block dicts (see module docstring).

    ``doc_ids`` must be strictly increasing int64; ``doc_lens`` aligned with
    ``doc_ids`` (needed to compute exact impact bounds per block).
    """
    n = doc_ids.size
    if n == 0:
        return []
    doc_ids = doc_ids.astype(np.int64)
    order_ok = np.all(doc_ids[1:] > doc_ids[:-1])
    if not order_ok:
        raise ValueError("doc_ids must be strictly increasing")
    impacts = bm25_impact(tfs, doc_lens, idf, avgdl, k1, b)
    blocks = []
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        d = doc_ids[s:e]
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = 0  # first doc stored absolutely in first_doc
        deltas[1:] = (d[1:] - d[:-1]).astype(np.uint64)
        blocks.append({
            "block_id": s // block_size,
            "first_doc": int(d[0]),
            "last_doc": int(d[-1]),
            "n": int(e - s),
            "deltas": varint_encode(deltas[1:]),  # n-1 gaps
            "tfs": varint_encode(tfs[s:e].astype(np.uint64)),
            "dls": varint_encode(doc_lens[s:e].astype(np.uint64)),
            "max_tf": int(tfs[s:e].max()),
            "max_score": float(impacts[s:e].max()),
        })
    return blocks


def decode_block(first_doc: int, n: int, deltas: bytes, tfs: bytes,
                 dls: bytes | None = None):
    """→ (doc_ids int64[n], tfs int64[n][, dls int64[n]])."""
    gaps = varint_decode(deltas, n - 1).astype(np.int64)
    docs = np.empty(n, dtype=np.int64)
    docs[0] = first_doc
    if n > 1:
        np.cumsum(gaps, out=docs[1:])
        docs[1:] += first_doc
    tf = varint_decode(tfs, n).astype(np.int64)
    if dls is None:
        return docs, tf
    return docs, tf, varint_decode(dls, n).astype(np.int64)


def decode_posting_blocks(block_rows):
    """Concatenate decoded blocks (rows ordered by first_doc) →
    (docs, tfs, dls) full arrays."""
    docs_parts, tf_parts, dl_parts = [], [], []
    for r in block_rows:
        d, t, l = decode_block(r["first_doc"], r["n"], r["deltas"], r["tfs"],
                               r["dls"])
        docs_parts.append(d)
        tf_parts.append(t)
        dl_parts.append(l)
    if not docs_parts:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    return (np.concatenate(docs_parts), np.concatenate(tf_parts),
            np.concatenate(dl_parts))


def skip_to(first_docs: np.ndarray, last_docs: np.ndarray, target_doc: int) -> int:
    """Skip-pointer navigation: index of the first block whose last_doc >=
    target (candidate block), using the sorted block bounds."""
    return int(np.searchsorted(last_docs, target_doc, side="left"))
