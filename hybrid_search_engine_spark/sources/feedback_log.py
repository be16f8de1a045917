"""Query-history / feedback logging — the engine's write path for the
learned-weights and autocomplete loops.

Reference semantics (core.py:26-58 ``QueryMemory.log_query``/``log_feedback``,
core.py:279-282 per-search logging): every search INSERTs
(query_id, query_text, semantic_weight, lexical_weight) into query_history
via a DuckDB sequence, and every judgment INSERTs
(feedback_id, query_id, doc_id, relevance_score, clicked) into feedback.

A ``nextval`` sequence is a single-writer bottleneck that cannot scale;
here ids are deterministic content hashes — the first 15 hex nibbles of an
md5, i.e. a 60-bit non-negative bigint, portable enough for any engine to
replay (same family as the repo's other oracle-checked hashes) — and the
tables are append-only parquet directories: idempotent per batch, mergeable
across concurrent writers, compactable like any other segment store
(streaming/ingest.py). Consumers: operators/fusion.py
(learned_weights / query_stats / test_set_from_feedback) and the
autocomplete frequency operator.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QUERY_HISTORY_DIR = "query_history"
FEEDBACK_DIR = "feedback"


def md5_id60(col: Column) -> Column:
    """First 15 hex nibbles of md5 as a non-negative bigint (60 bits —
    fits BIGINT with headroom, no sign edge). Portable: DuckDB replays it
    with a strpos-nibble horner sum (sql_md5_id60)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def sql_md5_id60(expr: str) -> str:
    """ANSI-SQL (DuckDB-safe) equivalent of md5_id60 for oracle queries."""
    terms = [
        f"(strpos('0123456789abcdef', substr(md5({expr}), {j + 1}, 1)) - 1)"
        f"::BIGINT * {16 ** (14 - j)}"
        for j in range(15)
    ]
    return "(" + " + ".join(terms) + ")"


def log_queries(entries: DataFrame, log_dir: str) -> DataFrame:
    """Append searches to the query_history table.

    ``entries``: (query_text, semantic_weight, lexical_weight, seq
    [, ts timestamp]). ``seq`` is the caller's per-batch sequence/nonce —
    it makes repeated identical query texts distinct, replacing the
    reference's nextval (core.py:36-38) without a global counter.

    Returns the id-enriched rows as written:
    (query_id, query_text, semantic_weight, lexical_weight, ts)."""
    out = entries.select(
        md5_id60(F.concat_ws(":", F.col("query_text"), F.col("seq"))
                 ).alias("query_id"),
        "query_text", "semantic_weight", "lexical_weight",
        (F.col("ts") if "ts" in entries.columns else F.current_timestamp()
         ).alias("ts"),
    )
    out.write.mode("append").parquet(os.path.join(log_dir, QUERY_HISTORY_DIR))
    return out


def log_feedback(entries: DataFrame, log_dir: str) -> DataFrame:
    """Append judgments to the feedback table.

    ``entries``: (query_id, doc_id, relevance_score, clicked, seq
    [, ts timestamp]). Returns rows as written: (feedback_id, query_id,
    doc_id, relevance_score, clicked, ts)."""
    out = entries.select(
        md5_id60(F.concat_ws(":", F.col("query_id"), F.col("doc_id"),
                             F.col("seq"))).alias("feedback_id"),
        "query_id", "doc_id", "relevance_score", "clicked",
        (F.col("ts") if "ts" in entries.columns else F.current_timestamp()
         ).alias("ts"),
    )
    out.write.mode("append").parquet(os.path.join(log_dir, FEEDBACK_DIR))
    return out


def read_query_history(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(log_dir, QUERY_HISTORY_DIR))


def read_feedback(spark: SparkSession, log_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(log_dir, FEEDBACK_DIR))
