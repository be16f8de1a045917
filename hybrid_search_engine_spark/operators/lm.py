"""Unigram-LM document scoring — corpus cross-entropy as a quality signal.

Web-pipeline curation stacks (CCNet, Gopher, RefinedWeb) score documents by
language-model perplexity and keep/bucket by score. A full LM is out of
scope for this container, but the unigram corpus model is the canonical
degenerate case and is exactly expressible as relational algebra — so it
ships as a first-class, oracle-checked operator rather than a stub.

Model: p(t) = cf(t) / total_tokens over the SAME corpus being scored
(self-perplexity — no held-out smoothing needed since every scored token
has corpus support by construction). Per document:

    avg_nll(d) = - (1/|d|) * sum over token occurrences t in d of ln p(t)

Low avg_nll ≈ stopword-heavy/templated text, high ≈ rare-token soup — the
two tails a curation pipeline trims.

100 TB shape: one token-grain shuffle builds per-doc tf (the SAME shuffle
the BM25 stats build already pays — at build time this operator rides it
for free); corpus frequencies are a vocab-sized table joined back
broadcast (Zipf vocabularies are millions of rows at web scale — far under
broadcast limits after the tf aggregation); the scalar total joins as a
1-row broadcast. No driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.text import tokens_native_keep_order

__all__ = ["unigram_logprob"]


def unigram_logprob(
    docs: DataFrame, text_col: str = "text", round_to: int | None = 6
) -> DataFrame:
    """(doc_id, n_tokens bigint, avg_nll double) for every doc with ≥1
    token. ``round_to`` rounds the float output (contract convention: 6
    decimals so summation-order ulps can't flip a value hash); pass None
    for raw doubles."""
    toks = tokens_native_keep_order(text_col)
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cf = tf.groupBy("term").agg(F.sum("cnt").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total_tokens"))
    model = broadcast(cf.crossJoin(broadcast(total)))
    scored = (
        tf.join(model, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            (
                -F.sum(
                    F.col("cnt")
                    * F.log(F.col("cf") / F.col("total_tokens"))
                )
                / F.sum("cnt")
            ).alias("avg_nll"),
        )
    )
    if round_to is not None:
        scored = scored.withColumn(
            "avg_nll", F.round("avg_nll", round_to))
    return scored
