"""Top-k query path over the posting index: block-max pruning per shard.

Plan shape (single query and batch share it):

    postings parquet  --filter term ∈ ∪query terms-->  (parquet pushdown:
        dictionary/min-max on `term`; postings sorted by term in-file)
    → groupBy(shard_id).applyInPandas(shard scorer)    [bounded heap, ≤k rows
                                                        per (shard, query)]
    → global merge: orderBy+limit (single query: TakeOrderedAndProject) or
      row_number window per query_id (batch)

Each shard holds complete postings for its doc subset, so per-shard top-k is
exact and the global merge is exact. The batch path scores ALL queries in
one plan with per-term decode caches shared across queries — the throughput
path; the single-query path is the latency path.

Shard scorer = term-at-a-time MaxScore with block-max skipping (block-max
WAND family, vectorized):

1. query terms sorted by shard-local max impact (desc); suffix sums S[i];
2. candidates are introduced term-by-term; a block of term i is skipped iff
   block_max(i)·qw + S[i+1] < θ − ε — docs so skipped provably cannot reach
   the running kth score θ;
3. every candidate is scored EXACTLY at introduction by probing all query
   terms via skip pointers (np.searchsorted over block bounds → decode only
   overlapping blocks, cached);
4. bounded selection: θ = kth best exact score so far (tie ε=1e-9 matching
   the (-round(score,9), doc_id) protocol, SURVEY.md §5.4).

Soundness of the skip rule: let i* be the smallest index (hottest first)
among the query terms containing doc d. If d's block at term i* was skipped,
then — since every other term of d has index > i* —
    score(d) ≤ block_max_{i*}·qw_{i*} + Σ_{j>i*} M_j·qw_j
            = block_max_{i*}·qw_{i*} + S[i*+1]  <  θ_{i*} − ε ≤ final θ,
so d cannot enter the final top-k (ties protected by ε). If the block at i*
survived, d became a candidate there and was scored exactly by probing every
term. Either way no result is lost. `mode="exact"` disables pruning — the
correctness backstop; tests assert pruned == exact == broadcast scorer ==
oracle.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..localdf import local_df
from ..reference_semantics import tokenize
from .codec import bm25_impact, decode_block

TIE_EPS = 1e-9

_OUT_SCHEMA = T.StructType([
    T.StructField("query_id", T.IntegerType(), False),
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


class _TermList:
    """Decoded-on-demand posting list of one term within one shard.
    Query-agnostic: the block decode cache is shared across queries."""

    __slots__ = ("firsts", "lasts", "maxs", "ns", "deltas", "tfs", "dls",
                 "_cache")

    def __init__(self, pdf: pd.DataFrame):
        pdf = pdf.sort_values("first_doc")
        self.firsts = pdf["first_doc"].to_numpy(np.int64)
        self.lasts = pdf["last_doc"].to_numpy(np.int64)
        self.maxs = pdf["max_score"].to_numpy(np.float64)
        self.ns = pdf["n"].to_numpy(np.int64)
        self.deltas = pdf["deltas"].tolist()
        self.tfs = pdf["tfs"].tolist()
        self.dls = pdf["dls"].tolist()
        self._cache: dict = {}

    def shard_max(self, qw: float) -> float:
        return float(self.maxs.max()) * qw if self.maxs.size else 0.0

    def block(self, i: int):
        got = self._cache.get(i)
        if got is None:
            got = decode_block(int(self.firsts[i]), int(self.ns[i]),
                               self.deltas[i], self.tfs[i], self.dls[i])
            self._cache[i] = got
        return got

    def probe(self, docs: np.ndarray, idf: float, qw: float, avgdl: float,
              k1: float, b: float) -> np.ndarray:
        """Exact contribution of this term for each of `docs` (sorted).
        Skip-pointer navigation: only blocks overlapping `docs` decode."""
        out = np.zeros(docs.size, dtype=np.float64)
        if self.firsts.size == 0 or docs.size == 0:
            return out
        bi = np.searchsorted(self.lasts, docs, side="left")
        valid = bi < self.firsts.size
        for blk in np.unique(bi[valid]):
            mask = valid & (bi == blk)
            d, tf, dl = self.block(int(blk))
            pos = np.searchsorted(d, docs[mask])
            pos = np.clip(pos, 0, d.size - 1)
            hit = d[pos] == docs[mask]
            if hit.any():
                sel = np.flatnonzero(mask)[hit]
                p = pos[hit]
                out[sel] = qw * bm25_impact(tf[p], dl[p], idf, avgdl, k1, b)
        return out

    def surviving_blocks(self, threshold: float, qw: float, rest: float
                         ) -> np.ndarray:
        """Block indices NOT skippable under the block-max rule."""
        if threshold == -np.inf:
            return np.arange(self.firsts.size)
        ok = self.maxs * qw + rest >= threshold - TIE_EPS
        return np.flatnonzero(ok)


def _score_one_query(lists: dict, qinfo: dict, avgdl: float, k1: float,
                     b: float, k: int, prune: bool):
    """qinfo: term -> (idf, qweight). Returns (doc_ids, scores) arrays."""
    terms = [t for t in qinfo if t in lists]
    if not terms:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    terms.sort(key=lambda t: -lists[t].shard_max(qinfo[t][1]))
    maxs = np.array([lists[t].shard_max(qinfo[t][1]) for t in terms])
    suffix = np.zeros(len(terms) + 1)
    suffix[:-1] = np.cumsum(maxs[::-1])[::-1]

    cand_docs = np.empty(0, np.int64)
    cand_scores = np.empty(0, np.float64)
    theta = -np.inf

    def kth(scores: np.ndarray) -> float:
        if scores.size < k:
            return -np.inf
        return float(np.partition(scores, scores.size - k)[scores.size - k])

    for i, t in enumerate(terms):
        tl = lists[t]
        idf, qw = qinfo[t]
        blocks = (tl.surviving_blocks(theta, qw, float(suffix[i + 1]))
                  if prune else np.arange(tl.firsts.size))
        if blocks.size == 0:
            continue
        docs_i = np.concatenate([tl.block(int(bi))[0] for bi in blocks])
        if cand_docs.size:
            idx = np.clip(np.searchsorted(cand_docs, docs_i), 0,
                          cand_docs.size - 1)
            new = docs_i[cand_docs[idx] != docs_i]
        else:
            new = docs_i
        if new.size == 0:
            continue
        new = np.unique(new)
        sc = np.zeros(new.size)
        for t2 in terms:
            idf2, qw2 = qinfo[t2]
            sc += lists[t2].probe(new, idf2, qw2, avgdl, k1, b)
        cand_docs = np.concatenate([cand_docs, new])
        cand_scores = np.concatenate([cand_scores, sc])
        order = np.argsort(cand_docs, kind="stable")
        cand_docs, cand_scores = cand_docs[order], cand_scores[order]
        theta = kth(cand_scores)
        if prune and cand_scores.size >= k and suffix[i + 1] < theta - TIE_EPS:
            break  # candidates are already exactly scored over all terms

    if cand_docs.size == 0:
        return cand_docs, cand_scores
    # HALF_UP to 9 decimals (np.round is half-even; the global merge uses
    # Spark round() = half-up — per-shard truncation must use the same
    # total order or a boundary tie can drop the doc the merge would keep)
    r9 = np.sign(cand_scores) * np.floor(np.abs(cand_scores) * 1e9 + 0.5)
    order = np.lexsort((cand_docs, -r9))[:k]
    return cand_docs[order], cand_scores[order]


def _make_shard_scorer(queries_info, avgdl: float, k1: float, b: float,
                       k: int, prune: bool):
    """queries_info: query_id -> {term: (idf, qweight)}, either a plain
    dict (small batches: rides the task closure) or a pyspark Broadcast
    (large batches: shipped once per executor instead of once per task —
    search_index_batch switches at ``BATCH_BROADCAST_MIN`` queries)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        qs = queries_info.value if hasattr(queries_info, "value") \
            else queries_info
        lists = {term: _TermList(grp)
                 for term, grp in pdf.groupby("term", sort=False)}
        qids, docs, scores = [], [], []
        for qid, qinfo in qs.items():
            d, s = _score_one_query(lists, qinfo, avgdl, k1, b, k, prune)
            if d.size:
                qids.append(np.full(d.size, qid, dtype=np.int32))
                docs.append(d)
                scores.append(s)
        if not docs:
            return pd.DataFrame({"query_id": pd.Series([], dtype=np.int32),
                                 "doc_id": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"query_id": np.concatenate(qids),
                             "doc_id": np.concatenate(docs),
                             "score": np.concatenate(scores)})

    return fn


# batch sizes at or above this broadcast the query-info dict instead of
# closing over it per task (override in tests to force either path)
BATCH_BROADCAST_MIN = 64


def _shard_scores(pruned: DataFrame, scorer, shard_clustered: bool
                  ) -> DataFrame:
    """Run the per-shard scorer over the matched postings.

    ``shard_clustered=False`` (raw parquet read): ``groupBy(shard_id)``
    inserts whatever exchange is needed to co-locate each shard.
    ``shard_clustered=True`` (postings already hash-partitioned by
    shard_id, e.g. IndexReader's cache): every partition holds whole
    shards, so a plain ``mapInPandas`` with an in-worker groupby is
    semantically identical while skipping the distribution-requirement
    analysis — measured ~30 ms off the single-query floor at 1M docs."""
    if not shard_clustered:
        return pruned.groupBy("shard_id").applyInPandas(
            scorer, schema=_OUT_SCHEMA)

    def per_partition(batches):
        pdfs = [pdf for pdf in batches if len(pdf)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        for _, grp in pdf.groupby("shard_id", sort=False):
            out = scorer(grp)
            if len(out):
                yield out

    return pruned.mapInPandas(per_partition, schema=_OUT_SCHEMA)


def _queries_info(queries: list[tuple], term_idf: dict,
                  remove_stopwords: bool, term_key=None) -> dict:
    """``term_key``: optional token → index-key mapping (hash-domain index:
    ``functions.hashing.spark_xxhash64_str``); None = identity (string
    domain). Applied AFTER tokenization, so query weights follow the same
    collision-merge rule as the build side."""
    out = {}
    for qid, text in queries:
        toks = tokenize(text, remove_stopwords=remove_stopwords)
        if term_key is not None:
            toks = [term_key(t) for t in toks]
        toks = Counter(toks)
        qinfo = {t: (term_idf[t], float(w)) for t, w in toks.items()
                 if t in term_idf}
        if qinfo:
            out[int(qid)] = qinfo
    return out


def resolve_term_idf(tstats, terms: list[str]) -> dict:
    """term → idf for the query terms. Accepts a dict (driver-cached) or the
    term_stats DataFrame (point-lookup scan, parquet-pruned by the IN list —
    the web-scale path where the vocabulary can't sit on the driver)."""
    if isinstance(tstats, dict):
        return {t: tstats[t] for t in terms if t in tstats}
    rows = (tstats.where(F.col("term").isin(terms))
            .select("term", "idf").collect())
    return {r["term"]: float(r["idf"]) for r in rows}


def search_index_batch(spark: SparkSession, postings: DataFrame, tstats,
                       avgdl: float, queries: list[tuple], k: int = 10,
                       k1: float = 1.5, b: float = 0.75,
                       remove_stopwords: bool = True, mode: str = "pruned",
                       shard_clustered: bool = False,
                       term_key=None) -> DataFrame:
    """[(query_id, text)] → (query_id, rank, doc_id, score): ONE plan for all
    queries; per-shard decode caches are shared across queries.
    ``term_key``: token → index-key mapping for hash-domain indexes
    (see _queries_info)."""
    all_terms = {
        t for _, text in queries
        for t in tokenize(text, remove_stopwords=remove_stopwords)
    }
    if term_key is not None:
        all_terms = {term_key(t) for t in all_terms}
    all_terms = sorted(all_terms)
    term_idf = resolve_term_idf(tstats, all_terms) if all_terms else {}
    qsinfo = _queries_info(queries, term_idf, remove_stopwords, term_key)
    if not qsinfo:
        return local_df(
            spark, [], "query_id int, rank int, doc_id long, score double")

    from .. import ensure_udf_serializable

    ensure_udf_serializable()
    used_terms = sorted({t for q in qsinfo.values() for t in q})
    pruned = postings.where(F.col("term").isin(used_terms))
    if len(qsinfo) >= BATCH_BROADCAST_MIN:
        # large batch sets: ship (queries × terms × idf) once per executor
        # via torrent broadcast, not once per shard task in the closure
        qsinfo = spark.sparkContext.broadcast(qsinfo)
    scorer = _make_shard_scorer(qsinfo, avgdl, k1, b, k, mode == "pruned")
    local = _shard_scores(pruned, scorer, shard_clustered)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def search_index(spark: SparkSession, postings: DataFrame, tstats,
                 avgdl: float, query: str, k: int = 10,
                 k1: float = 1.5, b: float = 0.75,
                 remove_stopwords: bool = True, mode: str = "pruned",
                 shard_clustered: bool = False,
                 term_key=None) -> DataFrame:
    """Single-query top-k (latency path): global TakeOrderedAndProject merge.
    ``term_key``: token → index-key mapping for hash-domain indexes."""
    terms = set(tokenize(query, remove_stopwords=remove_stopwords))
    if term_key is not None:
        terms = {term_key(t) for t in terms}
    terms = sorted(terms)
    term_idf = resolve_term_idf(tstats, terms) if terms else {}
    qsinfo = _queries_info([(0, query)], term_idf, remove_stopwords, term_key)
    if not qsinfo:
        return local_df(spark, [], "doc_id long, score double")

    from .. import ensure_udf_serializable

    ensure_udf_serializable()
    pruned = postings.where(F.col("term").isin(sorted(qsinfo[0])))
    scorer = _make_shard_scorer(qsinfo, avgdl, k1, b, k, mode == "pruned")
    local = _shard_scores(pruned, scorer, shard_clustered)
    return (
        local.orderBy(F.round(F.col("score"), 9).desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score")
    )
