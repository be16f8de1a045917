"""Query spell correction via SymSpell-style deletion neighborhoods.

Search-engine capability beyond the reference (its fuzzy tier is
rapidfuzz partial-ratio over an already-fetched candidate set,
operators/fuzzy.py; it has no query-term corrector). The classic
scalable algorithm (Garbe's SymSpell): instead of cross-joining query
terms against the vocabulary (O(V) per term — a non-starter when V is
millions of terms at web scale), both sides generate their single-char
DELETION variants and meet in an equi-join:

    vocab side:  (variant, term, df)   — |V| × (len+1) rows, built once,
                                         reusable across queries
    query side:  (variant, qterm)      — tiny
    join on variant → candidate pairs → verify levenshtein ≤ max_edit
    → best per qterm: min distance, then max df, then term asc.

With single deletions the neighborhood join surfaces every candidate at
edit distance ≤ 1 (equal / one insertion / one deletion / one
substitution — substitution pairs meet at the common deletion); the
levenshtein verify then enforces the exact ≤ max_edit contract. Larger
radii compose the same construction (d deletions per side) — documented,
not implemented; d=1 is the common serving configuration.

100 TB shape: the vocab variant table is term-grain (vocab-sized ×
avg_len, NOT corpus-sized), write-once and partition-prunable on the
variant key; a query touches only its own variants' buckets. The verify
is per candidate pair. No driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["deletion_variants", "spell_correct", "py_spell_correct"]


def deletion_variants(term):
    """Array: the term itself + every single-character deletion.
    Bound-column requirement as everywhere (d484e4d law) — callers
    project the term column first; here the lambda only embeds the bound
    attribute, and substr is O(1) per element."""
    t = F.col(term) if isinstance(term, str) else term
    dels = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.concat(
            F.substring(t, F.lit(1), i - 1),
            F.substring(t, i + 1, F.length(t)),
        ),
    )
    return F.array_distinct(F.concat(F.array(t), dels))


def spell_correct(
    vocab: DataFrame, queries: DataFrame, max_edit: int = 1
) -> DataFrame:
    """(qterm, suggestion, dist int, df bigint) — best correction per
    query term, or no row when nothing lies within ``max_edit``.

    ``vocab``: (term string, df bigint) — e.g. from stats.term_stats.
    ``queries``: (qterm string). Ranking: min edit distance, then highest
    df, then lexicographic term (fully deterministic).
    """
    vv = (
        vocab.select("term", "df",
                     deletion_variants("term").alias("__vars"))
        .select("term", "df", F.explode("__vars").alias("variant"))
    )
    qv = (
        queries.select("qterm", deletion_variants("qterm").alias("__vars"))
        .select("qterm", F.explode("__vars").alias("variant"))
    )
    cand = (
        vv.join(broadcast(qv), "variant")
        .select("qterm", "term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein("qterm", "term"))
        .where(F.col("dist") <= max_edit)
    )
    w = Window.partitionBy("qterm").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("qterm", F.col("term").alias("suggestion"),
                F.col("dist").cast("int").alias("dist"), "df")
    )


def py_spell_correct(vocab: dict[str, int], qterms: list[str],
                     max_edit: int = 1) -> dict[str, tuple[str, int, int]]:
    """Exhaustive pure-Python oracle (full levenshtein over the vocab)."""

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = {}
    for q in qterms:
        best = None
        for t, df in vocab.items():
            d = lev(q, t)
            if d <= max_edit:
                key = (d, -df, t)
                if best is None or key < best[0]:
                    best = (key, (t, d, df))
        if best:
            out[q] = best[1]
    return out
