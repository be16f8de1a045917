"""Top-k query path over the posting index: block-max pruning per shard.

Plan shape:

    postings parquet  --filter term ∈ query--> (predicate pushdown: parquet
        dictionary/min-max on the `term` column, postings sorted by term
        within each shard file)
    → groupBy(shard_id).applyInPandas(shard_scorer)   [bounded heap, ≤k rows
                                                       out per shard]
    → orderBy(round(score,9) desc, doc_id).limit(k)   [global merge:
                                                       TakeOrderedAndProject]

Each shard holds complete postings for its doc subset, so the per-shard
top-k is exact and the global merge is exact (SURVEY.md §7.3.3).

Shard scorer = term-at-a-time MaxScore with block-max skipping (the
block-max WAND family, adapted to vectorized execution):

1. terms sorted by shard-local max impact (desc); suffix sums S[i];
2. candidates are introduced term-by-term; a block of term i is skipped iff
   block_max(i)·qw + S[i+1] < θ − ε and it contains no current candidate —
   docs so skipped provably cannot reach the running kth score θ;
3. every candidate is scored EXACTLY at introduction by probing all query
   terms via skip pointers (np.searchsorted over block bounds → decode only
   overlapping blocks, cached);
4. bounded selection: θ = kth best exact score so far (tie-epsilon 1e-9,
   matching the (-round(score,9), doc_id) protocol in SURVEY.md §5.4).

Soundness argument for the skip rule: let i* be the smallest index (hottest
processed first) among the query terms containing doc d. If d's block at
term i* was skipped, then — since every other term of d has index > i* —
    score(d) = Σ_{t∈T(d)} impact_t(d)·qw_t
             ≤ block_max_{i*}·qw_{i*} + Σ_{j>i*} M_j·qw_j
             = block_max_{i*}·qw_{i*} + S[i*+1]  <  θ_{i*} − ε ≤ final θ,
so d cannot enter the final top-k (ties protected by the ε margin). If the
block at i* survived, d became a candidate there and was scored exactly by
probing every term. Either way no result is lost.

`mode="exact"` disables pruning (decode everything) — the correctness
backstop; tests assert pruned == exact == broadcast-join scorer == oracle.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..reference_semantics import tokenize
from .codec import bm25_impact, decode_block

TIE_EPS = 1e-9

_OUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("score", T.DoubleType(), False),
])


class _TermList:
    """Decoded-on-demand posting list of one term within one shard."""

    __slots__ = ("firsts", "lasts", "maxs", "ns", "deltas", "tfs", "dls",
                 "idf", "qw", "_cache")

    def __init__(self, pdf: pd.DataFrame, idf: float, qw: float):
        pdf = pdf.sort_values("first_doc")
        self.firsts = pdf["first_doc"].to_numpy(np.int64)
        self.lasts = pdf["last_doc"].to_numpy(np.int64)
        self.maxs = pdf["max_score"].to_numpy(np.float64)
        self.ns = pdf["n"].to_numpy(np.int64)
        self.deltas = pdf["deltas"].tolist()
        self.tfs = pdf["tfs"].tolist()
        self.dls = pdf["dls"].tolist()
        self.idf = idf
        self.qw = qw
        self._cache: dict = {}

    @property
    def shard_max(self) -> float:
        return float(self.maxs.max()) * self.qw if self.maxs.size else 0.0

    def block(self, i: int):
        got = self._cache.get(i)
        if got is None:
            got = decode_block(int(self.firsts[i]), int(self.ns[i]),
                               self.deltas[i], self.tfs[i], self.dls[i])
            self._cache[i] = got
        return got

    def probe(self, docs: np.ndarray, avgdl: float, k1: float, b: float
              ) -> np.ndarray:
        """Exact contribution of this term for each of `docs` (sorted).
        Skip-pointer navigation: only blocks overlapping `docs` decode."""
        out = np.zeros(docs.size, dtype=np.float64)
        if self.firsts.size == 0 or docs.size == 0:
            return out
        # block index candidate for each doc (first block with last >= doc)
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
                out[sel] = self.qw * bm25_impact(tf[p], dl[p], self.idf,
                                                 avgdl, k1, b)
        return out

    def all_docs(self) -> np.ndarray:
        parts = [self.block(i)[0] for i in range(self.firsts.size)]
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    def surviving_blocks(self, threshold: float, rest: float) -> np.ndarray:
        """Indices of blocks NOT skippable under the block-max rule.
        (Blocks holding already-scored candidates may be skipped freely —
        candidates were scored exactly at introduction time.)"""
        if threshold == -np.inf:
            return np.arange(self.firsts.size)
        ok = self.maxs * self.qw + rest >= threshold - TIE_EPS
        return np.flatnonzero(ok)


def _score_shard(pdf: pd.DataFrame, qinfo: dict, avgdl: float, k1: float,
                 b: float, k: int, prune: bool) -> pd.DataFrame:
    lists = []
    for term, grp in pdf.groupby("term", sort=False):
        idf, qw = qinfo[term]
        lists.append(_TermList(grp, idf, qw))
    if not lists:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": np.int64, "score": np.float64})

    lists.sort(key=lambda tl: -tl.shard_max)
    maxs = np.array([tl.shard_max for tl in lists])
    suffix = np.zeros(len(lists) + 1)
    suffix[:-1] = np.cumsum(maxs[::-1])[::-1]

    cand_docs = np.empty(0, np.int64)   # sorted candidate ids
    cand_scores = np.empty(0, np.float64)
    theta = -np.inf

    def kth(scores: np.ndarray) -> float:
        if scores.size < k:
            return -np.inf
        return float(np.partition(scores, scores.size - k)[scores.size - k])

    for i, tl in enumerate(lists):
        if prune:
            blocks = tl.surviving_blocks(theta, float(suffix[i + 1]))
        else:
            blocks = np.arange(tl.firsts.size)
        if blocks.size == 0:
            continue
        parts = [tl.block(int(bi))[0] for bi in blocks]
        docs_i = np.concatenate(parts)
        # new candidates = docs_i not already candidates
        if cand_docs.size:
            idx = np.searchsorted(cand_docs, docs_i)
            idx = np.clip(idx, 0, cand_docs.size - 1)
            is_old = cand_docs[idx] == docs_i
            new = docs_i[~is_old]
        else:
            new = docs_i
        if new.size == 0:
            continue
        new = np.unique(new)
        # exact scores for new candidates: probe every term (cached decodes)
        sc = np.zeros(new.size)
        for tl2 in lists:
            sc += tl2.probe(new, avgdl, k1, b)
        cand_docs_new = np.concatenate([cand_docs, new])
        cand_scores_new = np.concatenate([cand_scores, sc])
        order = np.argsort(cand_docs_new, kind="stable")
        cand_docs, cand_scores = cand_docs_new[order], cand_scores_new[order]
        theta = kth(cand_scores)
        if prune and cand_scores.size >= k and suffix[i + 1] < theta - TIE_EPS:
            # remaining terms cannot introduce viable NEW candidates, and all
            # current candidates are already exactly scored → done
            break

    if cand_docs.size == 0:
        return pd.DataFrame({"doc_id": [], "score": []}).astype(
            {"doc_id": np.int64, "score": np.float64})
    # bounded local top-k under the tie protocol
    key_score = np.round(cand_scores, 9)
    order = np.lexsort((cand_docs, -key_score))[:k]
    return pd.DataFrame({"doc_id": cand_docs[order],
                         "score": cand_scores[order]})


def search_index(spark: SparkSession, postings: DataFrame, tstats: DataFrame,
                 avgdl: float, query: str, k: int = 10,
                 k1: float = 1.5, b: float = 0.75,
                 remove_stopwords: bool = True, mode: str = "pruned"
                 ) -> DataFrame:
    """Top-k over the posting index. mode ∈ {"pruned", "exact"}."""
    from collections import Counter

    from .. import ensure_udf_serializable

    ensure_udf_serializable()

    toks = Counter(tokenize(query, remove_stopwords=remove_stopwords))
    if not toks:
        return spark.createDataFrame([], "doc_id long, score double")
    terms = sorted(toks)
    trows = tstats.where(F.col("term").isin(terms)).select("term", "idf").collect()
    qinfo = {r["term"]: (float(r["idf"]), float(toks[r["term"]])) for r in trows}
    if not qinfo:
        return spark.createDataFrame([], "doc_id long, score double")

    pruned = postings.where(F.col("term").isin(list(qinfo)))
    prune = mode == "pruned"

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_shard(pdf, qinfo, avgdl, k1, b, k, prune)

    local = pruned.groupBy("shard_id").applyInPandas(apply_fn, schema=_OUT_SCHEMA)
    return (
        local.orderBy(F.round(F.col("score"), 9).desc(), F.col("doc_id").asc())
        .limit(k)
    )
