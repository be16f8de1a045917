"""Vendored pure-Python BM25 oracle for parity tests.

Re-implements the *math* of the reference scorer (semantics contract:
/root/reference/search_engine/bm25.py:45-142 — fit computes doc lengths,
per-doc tf, df, avgdl, idf = ln((N-df+0.5)/(df+0.5)+1); score sums
idf·tf(k1+1)/(tf+k1(1-b+b·dl/avgdl)) over query tokens in query order) in an
independent, dict-of-arrays style. No code is shared with or copied from the
reference; tokenization comes from the engine's own parity core so oracle and
engine see identical tokens by construction.

Defaults k1=1.5, b=0.75, remove_stopwords=True mirror bm25.py:19-35.

Tie-break protocol (SURVEY.md §5.4): rank by (-round(score, 9), doc_id); all
math in float64; per-doc term contributions summed in query-token order.
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from hybrid_search_engine_spark.reference_semantics import tokenize


@dataclass
class BM25Oracle:
    k1: float = 1.5
    b: float = 0.75
    remove_stopwords: bool = True

    doc_ids: list = field(default_factory=list)
    doc_len: dict = field(default_factory=dict)      # doc_id -> int
    tf: dict = field(default_factory=dict)           # doc_id -> Counter(term)
    df: Counter = field(default_factory=Counter)     # term -> doc count
    idf: dict = field(default_factory=dict)          # term -> float64
    n_docs: int = 0
    avgdl: float = 0.0

    def fit(self, docs: dict) -> "BM25Oracle":
        """docs: mapping doc_id -> text."""
        self.doc_ids = list(docs.keys())
        self.n_docs = len(self.doc_ids)
        for did, text in docs.items():
            toks = tokenize(text, remove_stopwords=self.remove_stopwords)
            self.doc_len[did] = len(toks)
            c = Counter(toks)
            self.tf[did] = c
            self.df.update(c.keys())
        self.avgdl = (
            sum(self.doc_len.values()) / self.n_docs if self.n_docs else 0.0
        )
        self.idf = {
            t: math.log((self.n_docs - d + 0.5) / (d + 0.5) + 1.0)
            for t, d in self.df.items()
        }
        return self

    def score_one(self, query: str, doc_id) -> float:
        q = tokenize(query, remove_stopwords=self.remove_stopwords)
        dl = self.doc_len[doc_id]
        tfd = self.tf[doc_id]
        s = 0.0
        for term in q:  # query order — float summation order is part of parity
            if term not in self.idf:
                continue
            f = tfd.get(term, 0)
            denom = f + self.k1 * (1.0 - self.b + self.b * (dl / self.avgdl))
            if denom > 0:
                s += self.idf[term] * (f * (self.k1 + 1.0)) / denom
        return s

    def topk(self, query: str, k: int = 10) -> list[tuple]:
        """[(doc_id, score)] under the tie-break protocol."""
        scored = [(did, self.score_one(query, did)) for did in self.doc_ids]
        scored.sort(key=lambda p: (-round(p[1], 9), p[0]))
        return scored[:k]

    def topk_nonzero(self, query: str, k: int = 10) -> list[tuple]:
        """Like topk but only docs with score > 0 — the sparse-engine view
        (an inverted index never surfaces zero-score docs; the reference pads
        top-k with arbitrary zero-score docs via dense argsort, an accident of
        bm25.py:141 we exclude from the parity contract)."""
        return [(d, s) for d, s in self.topk(query, k=self.n_docs) if s > 0.0][:k]
