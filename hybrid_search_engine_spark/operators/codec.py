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


def varint_encode_ex(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """uint64 array → (LEB128 bytes, per-value byte lengths).

    The lengths array lets callers slice the stream into sub-ranges (e.g.
    per posting block) without re-encoding. Vectorized: ≤10 passes."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b"", np.empty(0, dtype=np.int64)
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
    return out.tobytes(), nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array → LEB128 bytes."""
    return varint_encode_ex(values)[0]


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
        du = d.view(np.uint64)
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = 0  # first doc stored absolutely in first_doc
        deltas[1:] = du[1:] - du[:-1]  # uint64 gap, overflow-safe
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
    """→ (doc_ids int64[n], tfs int64[n][, dls int64[n]]).

    Reconstruction runs in uint64 (mod-2^64 cumsum) then reinterprets as
    int64 — exact for full-range signed ids."""
    gaps = varint_decode(deltas, n - 1)
    docs_u = np.empty(n, dtype=np.uint64)
    docs_u[0] = np.uint64(int(first_doc) & 0xFFFFFFFFFFFFFFFF)
    docs_u[1:] = gaps
    np.cumsum(docs_u, out=docs_u)
    docs = docs_u.view(np.int64)
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


def _encode_runs_core(shard: np.ndarray, new_run: np.ndarray,
                      doc: np.ndarray, tf: np.ndarray, dl: np.ndarray,
                      idf: np.ndarray, avgdl: float, k1: float, b: float,
                      block_size: int = BLOCK_SIZE_DEFAULT) -> dict:
    """Term-agnostic numpy core of the block encoder: the caller supplies
    the run-boundary mask (``new_run``) so run detection can happen without
    materializing per-row Python strings (the Arrow path compares adjacent
    term values in C++; the pandas path compares object arrays).

    Returns a dict of column arrays plus CONTIGUOUS varint buffers with
    per-block offset arrays (``*_off`` of length n_blocks+1) — block i's
    payload is ``buf[off[i]:off[i+1]]``, which is exactly the Arrow
    BinaryArray layout, so the Arrow path wraps the buffers zero-copy."""
    n = doc.size
    doc = doc.astype(np.int64)
    tf64 = tf.astype(np.int64)
    dl64 = dl.astype(np.int64)
    run_id = np.cumsum(new_run) - 1
    run_start_pos = np.flatnonzero(new_run)
    pos_in_run = np.arange(n) - run_start_pos[run_id]

    # strict ordering within runs (postings invariant) — signed compare;
    # gaps computed in uint64 so full-range int64 ids (xxhash64) can't
    # overflow: for doc[i+1] > doc[i] the two's-complement difference IS the
    # true unsigned gap
    not_increasing = np.empty(n, dtype=bool)
    not_increasing[0] = False
    not_increasing[1:] = doc[1:] <= doc[:-1]
    if np.any(not_increasing & ~new_run):
        raise ValueError("doc_ids must be strictly increasing within a run")
    doc_u = doc.view(np.uint64)
    gaps_full = np.empty(n, dtype=np.uint64)
    gaps_full[0] = 0
    gaps_full[1:] = doc_u[1:] - doc_u[:-1]

    # block segmentation
    block_start = (pos_in_run % block_size) == 0
    starts = np.flatnonzero(block_start)
    ends = np.empty(starts.size, dtype=np.int64)
    ends[:-1] = starts[1:]
    ends[-1] = n
    n_blk = ends - starts

    impacts = bm25_impact(tf64, dl64, idf, avgdl, k1, b)
    max_tf = np.maximum.reduceat(tf64, starts)
    max_score = np.maximum.reduceat(impacts, starts)

    # delta stream: every element except block firsts contributes one gap
    sel = ~block_start
    gap_buf, gap_len = varint_encode_ex(gaps_full[sel])
    gap_cum = np.zeros(gap_len.size + 1, dtype=np.int64)
    np.cumsum(gap_len, out=gap_cum[1:])
    sel_counts = n_blk - 1
    sel_starts = np.zeros(starts.size, dtype=np.int64)
    np.cumsum(sel_counts[:-1], out=sel_starts[1:])
    gap_b0 = gap_cum[sel_starts]
    gap_b1 = gap_cum[sel_starts + sel_counts]

    # tf / dl streams: every element contributes
    tf_buf, tf_len = varint_encode_ex(tf64.astype(np.uint64))
    dl_buf, dl_len = varint_encode_ex(dl64.astype(np.uint64))
    tf_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tf_len, out=tf_cum[1:])
    dl_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(dl_len, out=dl_cum[1:])
    tf_b0, tf_b1 = tf_cum[starts], tf_cum[ends]
    dl_b0, dl_b1 = dl_cum[starts], dl_cum[ends]

    # block payload slices are CONTIGUOUS by construction (consecutive
    # cumsum windows), so a single offsets array describes them all
    def offsets(b0, b1):
        return np.concatenate([b0, b1[-1:]]).astype(np.int64)

    return {
        "starts": starts,
        "shard_id": shard[starts].astype(np.int32),
        "block_id": (pos_in_run[starts] // block_size).astype(np.int32),
        "first_doc": doc[starts],
        "last_doc": doc[ends - 1],
        "n": n_blk.astype(np.int32),
        "gap_buf": gap_buf, "gap_off": offsets(gap_b0, gap_b1),
        "tf_buf": tf_buf, "tf_off": offsets(tf_b0, tf_b1),
        "dl_buf": dl_buf, "dl_off": offsets(dl_b0, dl_b1),
        "max_tf": max_tf.astype(np.int32),
        "max_score": max_score.astype(np.float64),
    }


def encode_runs(shard: np.ndarray, term: np.ndarray, doc: np.ndarray,
                tf: np.ndarray, dl: np.ndarray, idf: np.ndarray,
                avgdl: float, k1: float, b: float,
                block_size: int = BLOCK_SIZE_DEFAULT):
    """Vectorized block encoding of MANY posting runs at once (pandas form).

    Input: columnar arrays sorted by (shard, term, doc). One numpy pass
    regardless of run count; only the final byte-slicing touches Python.
    The distributed build uses the Arrow-native stream in postings.py
    (shared numpy core, no object-string materialization); this wrapper
    remains the reference implementation for property tests and local use.
    """
    import pandas as pd

    n = doc.size
    if n == 0:
        return None
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    new_run[1:] = (shard[1:] != shard[:-1]) | (term[1:] != term[:-1])
    c = _encode_runs_core(shard, new_run, doc, tf, dl, idf,
                          avgdl=avgdl, k1=k1, b=b, block_size=block_size)
    go, to, do = c["gap_off"], c["tf_off"], c["dl_off"]
    return pd.DataFrame({
        "shard_id": c["shard_id"],
        "term": term[c["starts"]],
        "block_id": c["block_id"],
        "first_doc": c["first_doc"],
        "last_doc": c["last_doc"],
        "n": c["n"],
        "deltas": [c["gap_buf"][a:z] for a, z in zip(go[:-1], go[1:])],
        "tfs": [c["tf_buf"][a:z] for a, z in zip(to[:-1], to[1:])],
        "dls": [c["dl_buf"][a:z] for a, z in zip(do[:-1], do[1:])],
        "max_tf": c["max_tf"],
        "max_score": c["max_score"],
    })


def skip_to(first_docs: np.ndarray, last_docs: np.ndarray, target_doc: int) -> int:
    """Skip-pointer navigation: index of the first block whose last_doc >=
    target (candidate block), using the sorted block bounds."""
    return int(np.searchsorted(last_docs, target_doc, side="left"))
