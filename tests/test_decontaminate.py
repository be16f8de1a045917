"""Decontamination: Spark n-gram semi-join ≡ pure-Python oracle."""

import random
from collections import Counter

from pyspark.sql import functions as F

from hybrid_search_engine_spark.contract_ext import q_decontaminate
from hybrid_search_engine_spark.localdf import local_df
from hybrid_search_engine_spark.operators.decontaminate import (
    contamination_flags,
    py_token_ngrams,
)


def _py_flags(doc_rows, probe_texts, n):
    probe_grams = set()
    for p in probe_texts:
        probe_grams.update(py_token_ngrams((p or "").lower().split(), n))
    out = {}
    for doc_id, text in doc_rows:
        grams = py_token_ngrams((text or "").lower().split(), n)
        hits = [g for g in grams if g in probe_grams]
        if hits:
            out[doc_id] = (len(hits), len(set(hits)))
    return out


def _run(spark, doc_rows, probe_texts, n, **kw):
    docs = local_df(spark, doc_rows, "doc_id long, text string")
    probes = local_df(spark, [(p,) for p in probe_texts], "probe string")
    return {
        r["doc_id"]: (r["n_hits"], r["n_probes"])
        for r in contamination_flags(docs, probes, n=n, **kw).collect()
    }


def test_hand_values(spark):
    docs = [
        (1, "the quick brown fox jumps"),      # probe1 at 2 positions? no—once
        (2, "quick brown fox quick brown fox"),  # repeated: 2 hits, 1 probe
        (3, "brown fox quick"),                # wrap order: no trigram match
        (4, "totally unrelated text here"),
        (5, "the quick brown"),                # another probe1 trigram
    ]
    probes = ["quick brown fox", "the quick brown fox"]
    got = _run(spark, docs, probes, 3)
    # probe2 contributes trigrams {the quick brown, quick brown fox}
    assert got == {1: (2, 2), 2: (2, 1), 5: (1, 1)}


def test_short_probe_and_short_doc(spark):
    docs = [(1, "a b"), (2, "x y z w")]
    got = _run(spark, docs, ["a", "a b"], 3)  # probes shorter than n
    assert got == {}
    got2 = _run(spark, docs, ["x y z"], 3)
    assert got2 == {2: (1, 1)}


def test_property_random(spark):
    rng = random.Random(11)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(60)
    ]
    probes = ["a b c", "d d", "b c d a", ""]
    for n in (2, 3):
        got = _run(spark, docs, probes, n)
        assert got == _py_flags(docs, probes, n), n
        # non-broadcast fallback path must agree
        got_shuffle = _run(spark, docs, probes, n, broadcast_probes=False)
        assert got_shuffle == got


def test_contract_row_nonvacuous(spark, sf_dir):
    out = q_decontaminate(spark, sf_dir)
    assert out.columns == ["doc_id", "n_hits", "n_probes"]
    assert out.count() > 0
