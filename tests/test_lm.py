"""Unigram-LM scoring: Spark plan ≡ pure-Python oracle; signal sanity."""

import math
import random
from collections import Counter

from pyspark.sql import functions as F

from hybrid_search_engine_spark.contract_ext import q_lm_score
from hybrid_search_engine_spark.localdf import local_df
from hybrid_search_engine_spark.operators.lm import unigram_logprob


def _py_unigram(rows):
    cf: Counter = Counter()
    per_doc = {}
    for doc_id, text in rows:
        toks = (text or "").split()
        if toks:
            per_doc[doc_id] = Counter(toks)
            cf.update(toks)
    total = sum(cf.values())
    out = {}
    for doc_id, tfs in per_doc.items():
        n = sum(tfs.values())
        nll = -sum(c * math.log(cf[t] / total) for t, c in tfs.items()) / n
        out[doc_id] = (n, round(nll, 6))
    return out


def test_matches_python_oracle(spark):
    rng = random.Random(3)
    vocab = ["the"] * 0 or [f"w{i}" for i in range(40)]
    weights = [1.0 / (i + 1) for i in range(len(vocab))]  # zipf-ish
    rows = [
        (i, " ".join(rng.choices(vocab, weights=weights,
                                  k=rng.randint(0, 40))))
        for i in range(120)
    ]
    rows.append((120, ""))  # zero-token doc: excluded
    df = local_df(spark, rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"])
        for r in unigram_logprob(df).collect()
    }
    assert got == _py_unigram(rows)
    assert 120 not in got


def test_signal_direction(spark):
    # a doc of corpus-head tokens must score lower nll than rare-token soup
    rows = [(i, "common common common") for i in range(20)]
    rows.append((100, "common common common common"))
    rows.append((101, "rareword anotherrare thirdrare"))
    df = local_df(spark, rows, "doc_id long, text string")
    got = {r["doc_id"]: r["avg_nll"] for r in unigram_logprob(df).collect()}
    assert got[100] < got[101]


def test_contract_row_shape(spark, sf_dir):
    out = q_lm_score(spark, sf_dir)
    assert out.columns == ["doc_id", "n_tokens", "avg_nll"]
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.length(F.coalesce("text", F.lit(""))) > 0).count())
    assert out.count() == n_docs
    assert out.where(F.col("avg_nll") <= 0).count() == 0


def test_broadcast_and_join_paths_identical(spark):
    """Round-6 internals: unigram_logprob scores via a broadcast term→ln p
    model (one row-local Arrow pass) with the pre-round-6 join plan as
    the over-budget fallback. Force both paths on a corpus with empty,
    null and repeated-token docs and require row-identical output."""
    import hybrid_search_engine_spark.operators.lm as lm

    docs = spark.createDataFrame(
        [(1, "spark spark fast"), (2, ""), (3, None),
         (4, "fast query window query"), (5, "spark"),
         (6, "unique_token_here")],
        "doc_id long, text string").select(
        "doc_id",
        # contract rows coalesce null text before the operator
        lm.F.coalesce("text", lm.F.lit("")).alias("text"))

    broadcast_rows = sorted(map(tuple, lm.unigram_logprob(docs).collect()))
    old_cap = lm.LM_BROADCAST_MAX_VOCAB
    try:
        lm.LM_BROADCAST_MAX_VOCAB = 0  # force the join fallback
        join_rows = sorted(map(tuple, lm.unigram_logprob(docs).collect()))
    finally:
        lm.LM_BROADCAST_MAX_VOCAB = old_cap
    assert broadcast_rows == join_rows
    # empty/null docs are absent; n_tokens exact
    ids = [r[0] for r in broadcast_rows]
    assert ids == [1, 4, 5, 6]
    assert [r[1] for r in broadcast_rows] == [3, 4, 1, 1]
