"""Dedup operators vs the fixture's planted duplicates.

The pages corpus plants exact duplicates at i ≡ 0 (mod 97) (copy of row
i-1's body, different url) and near duplicates (5% token swaps) at
i ≡ 0 (mod 131) — FIXTURES.md §A1.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_idx(spark, extracted_1k):
    """(doc_id = fixture row index, text) — row index recovered from url."""
    d = extracted_1k.select(
        F.regexp_extract("url", r"/path/(\d+)$", 1).cast("long").alias("doc_id"),
        "text",
    ).cache()
    d.count()
    return d


PLANTED_EXACT = [i for i in range(1, 1000) if i % 97 == 0]


def test_exact_duplicates_finds_planted(spark, docs_idx):
    from hybrid_search_engine_spark.operators.dedup import exact_duplicates

    res = exact_duplicates(docs_idx).cache()
    dups = {r["doc_id"]: r["canonical_doc_id"]
            for r in res.where("is_duplicate").collect()}
    for i in PLANTED_EXACT:
        # i duplicates i-1 (html differs, text body identical)
        assert i in dups, f"planted exact dup {i} not found"
        assert dups[i] < i
    # non-planted docs are not flagged (body generation is random enough)
    flagged = set(dups)
    unexpected = flagged - set(PLANTED_EXACT)
    assert len(unexpected) <= 3, f"too many unexpected dups: {sorted(unexpected)[:10]}"


def test_minhash_lsh_finds_planted_near_dups(spark, docs_idx):
    from hybrid_search_engine_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs_idx, num_perm=32, bands=8,
                              jaccard_threshold=0.6).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # exact dups (jaccard 1.0) must all be found
    for i in PLANTED_EXACT:
        assert any((a, b) == (i - 1, i) or (a, b) == (i, i - 1) or
                   (min(a, b), max(a, b)) == (i - 1, i)
                   for a, b in found), f"exact pair ({i-1},{i}) missed by LSH"
    for r in pairs:
        assert r["jaccard"] >= 0.6


def test_simhash64_near_dups(spark, docs_idx):
    from hybrid_search_engine_spark.operators.dedup import simhash_near_pairs

    pairs = simhash_near_pairs(docs_idx, max_hamming=3).collect()
    found = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
             for r in pairs}
    hits = sum(1 for i in PLANTED_EXACT if (i - 1, i) in found)
    # exact dups have identical token bags → hamming 0 → all found
    assert hits == len(PLANTED_EXACT), (hits, len(PLANTED_EXACT))


def test_ngram_jaccard_planted(spark, docs_idx):
    from hybrid_search_engine_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs_idx, n=2, threshold=0.8, df_cap=0).collect()
    found = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
             for r in pairs}
    hits = sum(1 for i in PLANTED_EXACT if (i - 1, i) in found)
    assert hits == len(PLANTED_EXACT)


def test_embedding_near_dup_lsh_recall(spark):
    """LSH-bucketed near-dup: recall ≥ 0.8 vs brute force on clustered
    vectors (planted near-identical pairs)."""
    import numpy as np

    from hybrid_search_engine_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    rng = np.random.RandomState(0)
    base = rng.standard_normal((40, 16))
    rows = []
    vid = 0
    for i in range(40):
        rows.append((vid, [float(x) for x in base[i]])); vid += 1
        if i % 4 == 0:  # planted near-dup: tiny perturbation
            rows.append((vid, [float(x) for x in
                               (base[i] + 0.01 * rng.standard_normal(16))]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = embedding_near_dup_pairs(emb, threshold=0.95, n_planes=0).collect()
    lsh = embedding_near_dup_pairs(emb, threshold=0.95, n_planes=6).collect()
    bset = {(r["id_a"], r["id_b"]) for r in brute}
    lset = {(r["id_a"], r["id_b"]) for r in lsh}
    assert lset <= bset  # LSH never invents pairs
    assert len(bset) >= 10
    assert len(lset) / len(bset) >= 0.8, (len(lset), len(bset))
