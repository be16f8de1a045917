"""Fuzzy lexical scoring (the reference's non-BM25 lexical path).

Reference semantics (core.py:178-197): per doc,
    lexical = 0.7 · partial_ratio(query, doc)/100 + 0.3 · |q ∩ d| / |q|
where partial_ratio is rapidfuzz's best-window similarity and the second
term is token-set overlap.

rapidfuzz is not available in this environment; `partial_ratio` here is a
stdlib reimplementation of the same definition (best SequenceMatcher ratio
of the short string against every |short|-length window of the long one,
which is fuzz.partial_ratio's classic formulation). Scores are in [0, 100].
It runs as an Arrow pandas UDF over candidate sets only — this path is for
re-scoring top-k candidates (pipelines.py stage shapes), never a full-corpus
scan at scale.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import tokens_native


def partial_ratio(a: str, b: str) -> float:
    """Best-window similarity ∈ [0,100] (pure Python, deterministic)."""
    if not a or not b:
        return 0.0
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    if short == long_:
        return 100.0
    m = SequenceMatcher(None, short, long_, autojunk=False)
    best = 0.0
    # classic partial_ratio: align around matching blocks
    for block in m.get_matching_blocks():
        start = max(0, block.b - block.a)
        window = long_[start:start + len(short)]
        r = SequenceMatcher(None, short, window, autojunk=False).ratio()
        if r > best:
            best = r
            if best == 1.0:
                break
    return round(best * 100, 6)


def lexical_fuzzy_scores(candidates: DataFrame, query: str,
                         text_col: str = "text",
                         w_fuzzy: float = 0.7, w_overlap: float = 0.3
                         ) -> DataFrame:
    """candidates(doc_id, text, …) → + lexical_score (core.py:191 weights)."""
    from .. import ensure_udf_serializable
    from ..reference_semantics import tokenize

    ensure_udf_serializable()
    q_tokens = sorted(set(tokenize(query)))
    qlen = max(len(q_tokens), 1)

    @F.pandas_udf(T.DoubleType())
    def fuzzy_udf(texts: pd.Series) -> pd.Series:
        return pd.Series([partial_ratio(query, t or "") / 100.0 for t in texts])

    overlap = (
        F.size(F.array_intersect(
            F.array_distinct(tokens_native(text_col)),
            F.array(*[F.lit(t) for t in q_tokens]))).cast("double") / qlen
    )
    return candidates.withColumn(
        "lexical_score",
        F.lit(w_fuzzy) * fuzzy_udf(F.col(text_col)) + F.lit(w_overlap) * overlap,
    )
