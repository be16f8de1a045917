"""Exact BM25 scoring via broadcast join — the correctness backstop path.

The core retrieval join (SURVEY.md J1): query terms ⋈ tf ON term. The query
side is tiny → broadcast hash join; Catalyst prunes the tf scan to matching
terms. Per-term contributions are column arithmetic (whole-stage codegen),
summed per doc, then TakeOrderedAndProject gives the global top-k (bounded
per-partition heap + driver merge — exactly the "bounded min-heap per
partition merged to global top-k" shape).

Formula parity (math contract, /root/reference/search_engine/bm25.py:106-110):
    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
with idf = ln((N − df + 0.5)/(df + 0.5) + 1), k1=1.5, b=0.75, stopwords
removed (bm25.py:19-35). All arithmetic float64; ranking tie-break
(-round(score,9), doc_id) per SURVEY.md §5.4.

Multi-query batch path: a queries DataFrame joins the same way with the
per-query top-k taken by window W3 instead of a global limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..localdf import local_df
from ..reference_semantics import tokenize

K1_DEFAULT = 1.5
B_DEFAULT = 0.75


def query_terms_df(spark: SparkSession, query: str, remove_stopwords: bool = True,
                   query_id: int = 0) -> DataFrame:
    """Tokenize one query driver-side (queries are tiny; parity tokenizer).

    Duplicate query tokens are kept as weights: the reference sums a
    contribution per query-token occurrence (bm25.py:99-110), so a term
    appearing twice in the query counts its contribution twice.
    """
    toks = tokenize(query, remove_stopwords=remove_stopwords)
    if not toks:
        toks = []
    from collections import Counter

    rows = [(query_id, t, float(w)) for t, w in Counter(toks).items()]
    return local_df(spark, rows, "query_id int, term string, qweight double")


def queries_terms_df(spark: SparkSession, queries: list[tuple],
                     remove_stopwords: bool = True) -> DataFrame:
    """[(query_id, text)] → (query_id, term, qweight)."""
    from collections import Counter

    rows = []
    for qid, text in queries:
        for t, w in Counter(tokenize(text, remove_stopwords=remove_stopwords)).items():
            rows.append((qid, t, float(w)))
    return local_df(spark, rows, "query_id int, term string, qweight double")


def bm25_contribution(k1: float = K1_DEFAULT, b: float = B_DEFAULT):
    """Column expr for one (term, doc) partial score. Expects columns
    tf, idf, doc_len and a literal-joined avg_doc_len column `avgdl`."""
    tf = F.col("tf").cast("double")
    num = tf * (k1 + 1.0)
    den = tf + k1 * (1.0 - b + b * (F.col("doc_len").cast("double") / F.col("avgdl")))
    return F.col("idf") * num / den


def score_query_terms(qterms: DataFrame, tf: DataFrame, tstats: DataFrame,
                      dstats: DataFrame, avg_doc_len: float,
                      k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> DataFrame:
    """→ (query_id, doc_id, score) for all docs with ≥1 matching term.

    Join order is chosen for scale: broadcast the query terms into the tf
    scan (prunes to candidate postings), broadcast term_stats (vocabulary-
    sized), then join doc lengths on the shrunken candidate set.
    """
    qt = qterms.join(F.broadcast(tstats.select("term", "idf")), "term")
    cand = tf.join(F.broadcast(qt), "term")
    cand = cand.join(dstats, "doc_id").withColumn("avgdl", F.lit(float(avg_doc_len)))
    contrib = (bm25_contribution(k1, b) * F.col("qweight")).alias("contrib")
    return (
        cand.select("query_id", "doc_id", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )


def score_query_terms_inline(qterms_weighted: DataFrame, tf_doclen: DataFrame,
                             avg_doc_len: float, k1: float = K1_DEFAULT,
                             b: float = B_DEFAULT) -> DataFrame:
    """Exact scoring against a tf table that carries doc_len INLINE
    (``term_frequencies_with_doclen`` output, materialized by build_index) —
    no dstats join and no term_stats join: the query side arrives with idf
    already attached (driver-resolved), so the whole plan is one broadcast
    hash join + one doc-grain aggregation, entirely in whole-stage codegen.
    This is the JVM-only latency tier used by ``IndexReader(cache_tf=True)``.

    qterms_weighted: (query_id, term, qweight, idf)."""
    cand = tf_doclen.join(F.broadcast(qterms_weighted), "term")
    cand = cand.withColumn("avgdl", F.lit(float(avg_doc_len)))
    contrib = (bm25_contribution(k1, b) * F.col("qweight")).alias("contrib")
    return (
        cand.select("query_id", "doc_id", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )


def score_single_query_onestage(tf_doclen: DataFrame, term_weights: dict,
                                avg_doc_len: float, k1: float = K1_DEFAULT,
                                b: float = B_DEFAULT) -> DataFrame:
    """→ (doc_id, score), zero joins and zero exchanges — the single-stage
    serving tier. ``term_weights`` maps term → idf·qweight (driver-resolved,
    query-sized), shipped as a literal MAP expression instead of a broadcast
    join: the per-row weight lookup is a codegen map probe, so the whole
    query is filter → project → hash-agg. When ``tf_doclen`` is
    hash-partitioned by doc_id (``IndexReader(cache_tf=True)`` cache layout)
    the groupBy's ClusteredDistribution(doc_id) is already satisfied and
    Catalyst plans NO exchange — one stage, one task wave, followed only by
    the driver-side TakeOrdered merge. Latency floor = scheduler + scan.
    """
    terms = sorted(term_weights)
    wmap = F.create_map(
        *[x for t in terms
          for x in (F.lit(t), F.lit(float(term_weights[t])))])
    tf = F.col("tf").cast("double")
    den = tf + k1 * (1.0 - b + b * (F.col("doc_len").cast("double")
                                    / F.lit(float(avg_doc_len))))
    contrib = (wmap[F.col("term")] * tf * (k1 + 1.0) / den).alias("contrib")
    return (
        tf_doclen.where(F.col("term").isin(terms))
        .select("doc_id", contrib)
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
    )


def topk_single(scores: DataFrame, k: int) -> DataFrame:
    """Global top-k under the tie-break protocol → TakeOrderedAndProject."""
    return (
        scores.orderBy(F.round(F.col("score"), 9).desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )


def topk_batch(scores: DataFrame, k: int) -> DataFrame:
    """Per-query top-k via window W3 (one shuffle by query_id)."""
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id").asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def search(spark: SparkSession, query: str, tf: DataFrame, tstats: DataFrame,
           dstats: DataFrame, avg_doc_len: float, k: int = 10,
           k1: float = K1_DEFAULT, b: float = B_DEFAULT) -> DataFrame:
    """Single-query exact BM25 top-k (sparse: zero-score docs never surface)."""
    qt = query_terms_df(spark, query)
    scores = score_query_terms(qt, tf, tstats, dstats, avg_doc_len, k1, b)
    return topk_single(scores, k)
