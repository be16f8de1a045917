"""Test-set decontamination: flag documents containing benchmark n-grams.

Standard LLM-pipeline step (GPT-3 §C, PaLM, Llama papers): before training,
drop or flag web documents that textually overlap held-out evaluation sets,
detected as shared token n-grams (8-13 grams in the papers; configurable
here). Distinct from phrase search in shape: the probe side is a TABLE of
n-grams (potentially millions — every n-gram of every benchmark), matched
as a bulk set-membership join, not a per-phrase positional query.

Plan: documents → token n-grams via a sliding-window `transform` over the
parity tokenizer's output (JVM HOFs, no UDF) → explode → join the probe
n-gram table. Output per contaminated doc: total matching shingle
positions and distinct probes hit.

100 TB shape: ONE shuffle at most. Probe sets up to broadcast size join
map-side (`broadcast()` — benchmarks are ~10^5-10^6 n-grams, well under
limits); bigger probe tables fall back to a shuffle join where the doc
side was going token-grain anyway. n_hits aggregation partial-combines
map-side. No driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.text import tokens_native_keep_order

__all__ = ["token_ngrams", "contamination_flags", "py_token_ngrams"]


def token_ngrams(toks, n: int):
    """Array of space-joined token n-grams (sliding window, step 1).
    Empty array when the doc has fewer than n tokens — guarded explicitly
    because Spark's ``sequence(1, 0)`` yields a DESCENDING [1, 0], not an
    empty array, and slice(…, 0, n) then throws."""
    count = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(count >= 1, grams).otherwise(
        F.array().cast("array<string>"))


def py_token_ngrams(tokens: list[str], n: int) -> list[str]:
    return [" ".join(tokens[i : i + n])
            for i in range(max(len(tokens) - n + 1, 0))]


def contamination_flags(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 8,
    text_col: str = "text",
    broadcast_probes: bool = True,
) -> DataFrame:
    """(doc_id, n_hits bigint, n_probes bigint) for docs sharing ≥1 token
    ``n``-gram with the probe set.

    ``probes`` is a DataFrame with a string column ``probe`` holding raw
    benchmark text; its n-grams are derived here with the SAME tokenizer,
    so a probe shorter than n tokens contributes nothing (the papers'
    convention: short strings are too common to attribute). ``n_hits``
    counts matching shingle POSITIONS in the doc (a doc repeating a
    benchmark answer 5 times scores 5); ``n_probes`` counts distinct
    probe n-grams hit.
    """
    probe_grams = (
        probes.select(
            F.explode(
                token_ngrams(tokens_native_keep_order("probe"), n)
            ).alias("gram")
        )
        .distinct()
    )
    if broadcast_probes:
        probe_grams = broadcast(probe_grams)
    doc_grams = docs.select(
        "doc_id",
        F.explode(
            token_ngrams(tokens_native_keep_order(text_col), n)
        ).alias("gram"),
    )
    return (
        doc_grams.join(probe_grams, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.count_distinct("gram").alias("n_probes"),
        )
    )
