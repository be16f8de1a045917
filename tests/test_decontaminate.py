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


def test_hashed_tier_agrees_with_string_tier(spark):
    rng = random.Random(5)
    vocab = ["a", "b", "c", "d", "e", "ff", "ggg"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(80)
    ]
    probes = ["a b c", "ff ggg a", "e e", "c d e a b"]
    for n in (2, 3):
        dfd = local_df(spark, docs, "doc_id long, text string")
        dfp = local_df(spark, [(p,) for p in probes], "probe string")
        exact = {
            r["doc_id"]: (r["n_hits"], r["n_probes"])
            for r in contamination_flags(dfd, dfp, n=n).collect()
        }
        hashed = {
            r["doc_id"]: (r["n_hits"], r["n_probes"])
            for r in contamination_flags(dfd, dfp, n=n,
                                         hashed=True).collect()
        }
        assert hashed == exact, n


def _py_span_flags(doc_rows, n):
    from collections import defaultdict

    gram_docs = defaultdict(set)
    per_doc = {}
    for doc_id, text in doc_rows:
        grams = py_token_ngrams((text or "").lower().split(), n)
        per_doc[doc_id] = grams
        for g in grams:
            gram_docs[g].add(doc_id)
    shared = {g for g, ds in gram_docs.items() if len(ds) > 1}
    out = {}
    for doc_id, grams in per_doc.items():
        hit = [g for g in grams if g in shared]
        if hit:
            out[doc_id] = (len(hit), len(set(hit)))
    return out


def test_span_dedup_hand_values(spark):
    docs = [
        (1, "alpha beta gamma delta"),   # shares 'alpha beta gamma' w/ 2
        (2, "zz alpha beta gamma yy"),
        (3, "alpha beta qq"),            # bigram-only overlap: no trigram
        (4, "solo unique content here"),
        (5, "rr rr rr rr"),              # self-repeats only: NOT shared
    ]
    from hybrid_search_engine_spark.operators.decontaminate import (
        shared_span_flags,
    )

    df = local_df(spark, docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shared_positions"], r["n_shared_spans"])
        for r in shared_span_flags(df, n=3).collect()
    }
    assert got == _py_span_flags(docs, 3) == {1: (1, 1), 2: (1, 1)}
    # hashed tier agrees
    got_h = {
        r["doc_id"]: (r["n_shared_positions"], r["n_shared_spans"])
        for r in shared_span_flags(df, n=3, hashed=True).collect()
    }
    assert got_h == got


def test_span_dedup_property(spark):
    rng = random.Random(19)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18))))
        for i in range(50)
    ]
    from hybrid_search_engine_spark.operators.decontaminate import (
        shared_span_flags,
    )

    df = local_df(spark, docs, "doc_id long, text string")
    for n in (2, 4):
        got = {
            r["doc_id"]: (r["n_shared_positions"], r["n_shared_spans"])
            for r in shared_span_flags(df, n=n).collect()
        }
        assert got == _py_span_flags(docs, n), n


def test_span_dedup_contract_row(spark, sf_dir):
    from hybrid_search_engine_spark.contract_ext import q_span_dedup

    out = q_span_dedup(spark, sf_dir)
    assert out.columns == ["doc_id", "n_shared_positions", "n_shared_spans"]
    assert out.count() > 0


def test_exploded_token_ngrams_matches_array_form(spark):
    """Round-6 positions-explode gram builder == explode(token_ngrams)
    row multisets, string and hashed tiers (incl. short/empty docs)."""
    from hybrid_search_engine_spark.operators.decontaminate import (
        exploded_token_ngrams,
        token_ngram_hashes,
        token_ngrams,
    )

    rng = random.Random(7)
    vocab = ["a", "b", "cc", "ddd", "ee_e", "f0"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(50)
    ] + [(100, ""), (101, None), (102, "one"), (103, "two words")]
    dfd = local_df(spark, docs, "doc_id long, text string")
    from hybrid_search_engine_spark.functions.text import (
        tokens_native_keep_order,
    )

    for n in (2, 3, 5):
        for hashed in (False, True):
            gramf = token_ngram_hashes if hashed else token_ngrams
            old = Counter(
                (r["doc_id"], r["gram"])
                for r in dfd.select(
                    "doc_id",
                    tokens_native_keep_order("text").alias("__toks"))
                .select("doc_id",
                        F.explode(gramf(F.col("__toks"), n)).alias("gram"))
                .collect())
            new = Counter(
                (r["doc_id"], r["gram"])
                for r in exploded_token_ngrams(dfd, n,
                                               hashed=hashed).collect())
            assert new == old, (n, hashed)
