"""Boolean + NEAR retrieval: scan tier ≡ index tier ≡ pure-Python oracle."""

import random

import pytest
from pyspark.sql import functions as F

from hybrid_search_engine_spark.contract_ext import (
    q_bool_query,
    q_near_query,
)
from hybrid_search_engine_spark.localdf import local_df
from hybrid_search_engine_spark.operators.boolquery import (
    bool_query_indexed,
    bool_query_scan,
)
from hybrid_search_engine_spark.operators.phrase import (
    doc_term_positions,
    near_match_scan,
    near_search_indexed,
)


def _rand_rows(seed, n=70, vocab=("a", "b", "c", "d", "e")):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(n)
    ]


def _py_bool(rows, must, should, must_not, min_should=0):
    out = {}
    for doc_id, text in rows:
        toks = set(text.split())
        if all(t in toks for t in must) and not any(
            t in toks for t in must_not
        ):
            ns = sum(1 for t in set(should) if t in toks)
            if not should or min_should <= 0 or ns >= min_should:
                out[doc_id] = ns
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize(
    "must,should,must_not,min_should",
    [
        (["a", "b"], ["c", "d"], ["e"], 0),
        (["a"], [], ["b", "c"], 0),
        ([], ["d", "e"], [], 1),
        (["c"], ["a", "b", "d"], [], 2),
    ],
)
def test_bool_scan_index_python_agree(spark, seed, must, should, must_not,
                                      min_should):
    rows = _rand_rows(seed)
    df = local_df(spark, rows, "doc_id long, text string")
    want = _py_bool(rows, must, should, must_not, min_should)
    got_scan = {
        r["doc_id"]: r["n_should"]
        for r in bool_query_scan(df, must, should, must_not,
                                 min_should).collect()
    }
    assert got_scan == want
    ptf = doc_term_positions(df)
    got_idx = {
        r["doc_id"]: r["n_should"]
        for r in bool_query_indexed(ptf, must, should, must_not,
                                    min_should).collect()
    }
    assert got_idx == want


def test_bool_validation(spark):
    df = local_df(spark, [(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bool_query_scan(df, [], [], ["a"])
    with pytest.raises(ValueError):
        bool_query_scan(df, ["a"], [], ["a"])


def _py_near(rows, a, b, slop):
    out = {}
    for doc_id, text in rows:
        toks = text.split()
        gaps = [
            q - p - 1
            for p, ta in enumerate(toks)
            if ta == a
            for q, tb in enumerate(toks)
            if tb == b and q > p
        ]
        if gaps and min(gaps) <= slop:
            out[doc_id] = min(gaps)
    return out


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("a,b,slop", [("a", "b", 0), ("a", "b", 2),
                                      ("c", "c", 1), ("e", "a", 4)])
def test_near_scan_index_python_agree(spark, seed, a, b, slop):
    rows = _rand_rows(seed)
    df = local_df(spark, rows, "doc_id long, text string")
    want = _py_near(rows, a, b, slop)
    got_scan = {
        r["doc_id"]: r["min_gap"]
        for r in near_match_scan(df, a, b, slop).collect()
    }
    assert got_scan == want, (seed, a, b, slop)
    ptf = doc_term_positions(df)
    got_idx = {
        r["doc_id"]: r["min_gap"]
        for r in near_search_indexed(ptf, a, b, slop).collect()
    }
    assert got_idx == want


def test_near_hand_values(spark):
    rows = [
        (1, "w x x q"),      # gap 2
        (2, "q w"),          # q before w only -> no ordered match
        (3, "w q w q"),      # adjacent -> gap 0
        (4, "w x x x x q"),  # gap 4 > slop 3
    ]
    df = local_df(spark, rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["min_gap"]
        for r in near_match_scan(df, "w", "q", 3).collect()
    }
    assert got == {1: 2, 3: 0}


def test_contract_rows_nonvacuous(spark, sf_dir):
    bq = q_bool_query(spark, sf_dir)
    assert bq.columns == ["doc_id", "n_should"]
    assert bq.count() > 0
    assert bq.where(F.col("n_should") > 0).count() > 0
    nq = q_near_query(spark, sf_dir)
    assert nq.columns == ["doc_id", "min_gap"]
    assert nq.count() > 0


def test_should_only_min_should_zero_divergence(spark):
    """Pins the DOCUMENTED tier divergence (round-5 advice): should-only
    with min_should=0 — scan tier returns every doc (zero-hit docs
    included with n_should=0), index tier only docs containing >=1 query
    term; with min_should=1 the tiers coincide."""
    from hybrid_search_engine_spark.localdf import local_df
    from hybrid_search_engine_spark.operators.boolquery import (
        bool_query_indexed,
        bool_query_scan,
    )
    from hybrid_search_engine_spark.operators.phrase import (
        doc_term_positions,
    )

    docs = local_df(spark, [(1, "x y z"), (2, "a b"), (3, "q")],
                    "doc_id long, text string")
    tf = doc_term_positions(docs)
    scan = {(r["doc_id"], r["n_should"]) for r in
            bool_query_scan(docs, should=["x", "b"]).collect()}
    idx = {(r["doc_id"], r["n_should"]) for r in
           bool_query_indexed(tf, should=["x", "b"]).collect()}
    assert scan == {(1, 1), (2, 1), (3, 0)}      # every doc
    assert idx == {(1, 1), (2, 1)}               # only term-hit docs
    # min_should >= 1: identical
    scan1 = {(r["doc_id"], r["n_should"]) for r in
             bool_query_scan(docs, should=["x", "b"],
                             min_should=1).collect()}
    idx1 = {(r["doc_id"], r["n_should"]) for r in
            bool_query_indexed(tf, should=["x", "b"],
                               min_should=1).collect()}
    assert scan1 == idx1 == {(1, 1), (2, 1)}
