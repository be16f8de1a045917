"""Codec round-trip + block invariant tests (property-based, no Spark)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_search_engine_spark.operators.codec import (
    bm25_impact,
    decode_block,
    decode_posting_blocks,
    encode_posting_list,
    skip_to,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(a))) == vals


@given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                min_size=1, max_size=200, unique=True))
@settings(max_examples=100, deadline=None)
def test_posting_roundtrip_full_range_ids(ids):
    """xxhash64 doc ids span the whole signed 64-bit range; gap arithmetic
    must not overflow (regression: int64 gap wrap)."""
    docs = np.array(sorted(ids), dtype=np.int64)
    tfs = np.ones(docs.size, dtype=np.int64)
    dls = np.full(docs.size, 7, dtype=np.int64)
    blocks = encode_posting_list(docs, tfs, dls, 1.0, 10.0, 1.5, 0.75,
                                 block_size=8)
    got_docs, got_tfs, _ = decode_posting_blocks(blocks)
    assert np.array_equal(got_docs, docs)


def test_varint_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_single_byte_values():
    a = np.arange(128, dtype=np.uint64)
    assert varint_encode(a) == bytes(range(128))


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1,
             max_size=500, unique=True),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=100, deadline=None)
def test_posting_roundtrip(docs, block_size):
    docs = np.array(sorted(docs), dtype=np.int64)
    rng = np.random.RandomState(0)
    tfs = rng.randint(1, 50, size=docs.size).astype(np.int64)
    dls = rng.randint(1, 500, size=docs.size).astype(np.int64)
    blocks = encode_posting_list(docs, tfs, dls, idf=1.3, avgdl=120.0,
                                 k1=1.5, b=0.75, block_size=block_size)
    got_docs, got_tfs, got_dls = decode_posting_blocks(blocks)
    assert np.array_equal(got_docs, docs)
    assert np.array_equal(got_tfs, tfs)
    assert np.array_equal(got_dls, dls)
    # block invariants
    impacts = bm25_impact(tfs, dls, 1.3, 120.0, 1.5, 0.75)
    for blk in blocks:
        s = blk["block_id"] * block_size
        e = s + blk["n"]
        assert blk["first_doc"] == docs[s]
        assert blk["last_doc"] == docs[e - 1]
        assert blk["max_tf"] == tfs[s:e].max()
        # block_max >= every impact in block (WAND soundness)
        assert blk["max_score"] >= impacts[s:e].max() - 1e-12


def test_skip_pointer_navigation():
    docs = np.arange(0, 1000, 3, dtype=np.int64)  # 334 docs
    tfs = np.ones(docs.size, dtype=np.int64)
    dls = np.full(docs.size, 100, dtype=np.int64)
    blocks = encode_posting_list(docs, tfs, dls, 1.0, 100.0, 1.5, 0.75, block_size=32)
    firsts = np.array([b["first_doc"] for b in blocks])
    lasts = np.array([b["last_doc"] for b in blocks])
    for target in [0, 1, 95, 96, 97, 500, 998, 999, 2000]:
        bi = skip_to(firsts, lasts, target)
        if target > docs[-1]:
            assert bi == len(blocks)
            continue
        # the chosen block is the first that can contain target
        assert lasts[bi] >= target
        assert bi == 0 or lasts[bi - 1] < target
        d, _ = decode_block(blocks[bi]["first_doc"], blocks[bi]["n"],
                            blocks[bi]["deltas"], blocks[bi]["tfs"])
        expected = docs[np.searchsorted(docs, target)]
        if expected <= blocks[bi]["last_doc"]:
            assert expected in d


@given(st.integers(min_value=1, max_value=6), st.integers(min_value=1, max_value=40),
       st.integers(min_value=2, max_value=33))
@settings(max_examples=50, deadline=None)
def test_encode_runs_equals_per_run_encoder(n_runs, max_docs, block_size):
    """Vectorized multi-run encoder == the single-list reference encoder."""
    from hybrid_search_engine_spark.operators.codec import encode_runs

    rng = np.random.RandomState(n_runs * 1000 + max_docs)
    shards, terms, docs, tfs, dls, idfs = [], [], [], [], [], []
    runs = []
    for r in range(n_runs):
        nd = rng.randint(1, max_docs + 1)
        d = np.sort(rng.choice(10**6, size=nd, replace=False)).astype(np.int64)
        t = rng.randint(1, 30, nd).astype(np.int64)
        l = rng.randint(1, 400, nd).astype(np.int64)
        idf = float(rng.uniform(0.1, 8.0))
        key = (r // 3, f"term{r}")
        runs.append((key, d, t, l, idf))
        shards += [key[0]] * nd
        terms += [key[1]] * nd
        docs.append(d); tfs.append(t); dls.append(l)
        idfs += [idf] * nd
    pdf = encode_runs(
        np.array(shards, np.int32), np.array(terms, object),
        np.concatenate(docs), np.concatenate(tfs), np.concatenate(dls),
        np.array(idfs, np.float64), avgdl=150.0, k1=1.5, b=0.75,
        block_size=block_size,
    )
    got = {
        (r["shard_id"], r["term"], r["block_id"]): r
        for _, r in pdf.iterrows()
    }
    n_expected = 0
    for (shard, term), d, t, l, idf in runs:
        blocks = encode_posting_list(d, t, l, idf=idf, avgdl=150.0, k1=1.5,
                                     b=0.75, block_size=block_size)
        n_expected += len(blocks)
        for blk in blocks:
            g = got[(shard, term, blk["block_id"])]
            for f in ("first_doc", "last_doc", "n", "max_tf"):
                assert g[f] == blk[f], (shard, term, blk["block_id"], f)
            assert bytes(g["deltas"]) == blk["deltas"]
            assert bytes(g["tfs"]) == blk["tfs"]
            assert bytes(g["dls"]) == blk["dls"]
            assert abs(g["max_score"] - blk["max_score"]) < 1e-12
    assert len(got) == n_expected


def test_rejects_unsorted():
    import pytest

    with pytest.raises(ValueError):
        encode_posting_list(np.array([3, 1], dtype=np.int64),
                            np.array([1, 1]), np.array([10, 10]),
                            1.0, 10.0, 1.5, 0.75)
