"""Posting-list construction: term-partitioned encode, doc-shard layout.

Dataflow (explicit shapes — Catalyst won't invent these, SURVEY.md §4).
Build path (build/manifest.py): tf arrives from the materialized tf table
WITH doc_len already attached (stats.term_frequencies_with_doclen), so the
ONLY tf-grain shuffle in the posting build is the shard repartition:

    tf(doc_id, term, tf, doc_len)           [tf parquet — no doc_id join]
      ⋈ broadcast(term_stats(term, idf))    [vocabulary-sized broadcast]
      → repartition(P, shard_id, term_bucket)  [THE tf-grain shuffle]
      → sortWithinPartitions(shard_id, term, doc_id)
      → mapInPandas(block encoder)          [Arrow-batch streaming, carries
                                             (shard, term) runs across batches]
      → postings(shard_id, term, block_id, first_doc, last_doc, n,
                 deltas, tfs, dls, max_tf, max_score)
      → write parquet partitioned by shard_id (idempotent per-shard overwrite)

(A caller with a bare tf(doc_id, term, tf) can still pass ``dstats`` — the
co-keyed join path — but the fused form avoids sorting the whole tf relation
twice for a sort-merge join at scale.)

Sharding doubles as the **explicit hot-term salting**: shard_id =
pmod(hash(doc_id), n_shards), so a Zipf-head term's posting list is split
into n_shards independently-encoded sub-lists of ~df/n_shards entries each —
no single sort-run or encode call ever sees a whole hot term. Block-max
metadata is shard-local and stays sound (SURVEY.md §7.3.4). Uniform doc
hashing also bounds per-cell size for the sort: the largest (shard, term)
cell is ~|docs in shard|, independent of term df.

The doc-shard layout is simultaneously the query-time unit: each shard holds
complete postings (all terms) for its doc subset, so per-shard top-k is exact
and the global merge is a k·P-row TakeOrderedAndProject (operators/wand.py).

At 100 TB: n_shards scales with corpus size (target ~256 MB of postings per
shard); the same plan runs unchanged — the repartition is the only full
shuffle of (doc,term,tf)-grain data, everything downstream is shard-local.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import BLOCK_SIZE_DEFAULT

POSTING_SCHEMA = T.StructType([
    T.StructField("shard_id", T.IntegerType(), False),
    T.StructField("term", T.StringType(), False),
    T.StructField("block_id", T.IntegerType(), False),
    T.StructField("first_doc", T.LongType(), False),
    T.StructField("last_doc", T.LongType(), False),
    T.StructField("n", T.IntegerType(), False),
    T.StructField("deltas", T.BinaryType(), False),
    T.StructField("tfs", T.BinaryType(), False),
    T.StructField("dls", T.BinaryType(), False),
    T.StructField("max_tf", T.IntegerType(), False),
    T.StructField("max_score", T.DoubleType(), False),
])


def with_shard(df: DataFrame, n_shards: int, doc_col: str = "doc_id") -> DataFrame:
    """shard_id = pmod(hash(doc_id), n_shards) — deterministic, uniform."""
    return df.withColumn(
        "shard_id", F.pmod(F.hash(F.col(doc_col)), F.lit(n_shards)).cast("int")
    )


def _encoder_stream(k1: float, b: float, avgdl: float, block_size: int):
    """mapInPandas iterator: rows sorted by (shard_id, term, doc_id) within
    the partition; vectorized block encoding (codec.encode_runs) per Arrow
    batch, carrying the unfinished (shard, term) run across batches."""

    from .codec import encode_runs

    def encode_head(pdf: pd.DataFrame):
        return encode_runs(
            pdf["shard_id"].to_numpy(np.int32),
            pdf["term"].to_numpy(object),
            pdf["doc_id"].to_numpy(np.int64),
            pdf["tf"].to_numpy(np.int64),
            pdf["doc_len"].to_numpy(np.int64),
            pdf["idf"].to_numpy(np.float64),
            avgdl=avgdl, k1=k1, b=b, block_size=block_size,
        )

    def fn(batches):
        carry = None  # pandas DataFrame of the unfinished (shard, term) run
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            # hold back the trailing (shard, term) run — it may continue in
            # the next Arrow batch (input is sorted, runs are contiguous)
            last_shard = pdf["shard_id"].iloc[-1]
            last_term = pdf["term"].iloc[-1]
            tail_mask = (pdf["shard_id"] == last_shard) & (pdf["term"] == last_term)
            tail_start = len(pdf) - int(tail_mask.values[::-1].argmin()
                                        if not tail_mask.all() else len(pdf))
            carry = pdf.iloc[tail_start:]
            head = pdf.iloc[:tail_start]
            if not head.empty:
                yield encode_head(head)
        if carry is not None and not carry.empty:
            yield encode_head(carry)

    return fn


def build_postings(tf: DataFrame, dstats: DataFrame | None, tstats: DataFrame,
                   avgdl: float, n_shards: int = 32,
                   k1: float = 1.5, b: float = 0.75,
                   block_size: int = BLOCK_SIZE_DEFAULT,
                   build_partitions: int | None = None,
                   shard_filter: list[int] | None = None) -> DataFrame:
    """→ posting-block DataFrame (not yet written). ``shard_filter`` limits
    the build to specific shards (resume path).

    ``dstats=None`` when ``tf`` already carries a ``doc_len`` column
    (stats.term_frequencies_with_doclen — the build path): skips the
    doc_id join entirely, leaving the shard repartition as the ONLY
    tf-grain shuffle in the posting build."""
    from .. import ensure_udf_serializable

    ensure_udf_serializable()
    enriched = tf if dstats is None else tf.join(dstats, "doc_id")
    enriched = enriched.join(F.broadcast(tstats.select("term", "idf")), "term")
    enriched = with_shard(enriched, n_shards)
    if shard_filter is not None:
        enriched = enriched.where(F.col("shard_id").isin([int(s) for s in shard_filter]))
    # Partition the ENCODE stage by (shard_id, term_bucket), not shard_id
    # alone: hashing only n_shards distinct keys into n_shards partitions is
    # balls-in-bins (empty partitions + 3-4× stragglers). The sub-bucket on
    # term keeps every (shard, term) run intact within one partition while
    # spreading each shard's vocabulary across `sub` partitions — encode
    # parallelism is then n_shards × sub regardless of key collisions, and
    # the Zipf-head term of a shard still lands in a bounded cell.
    p = build_partitions or 2 * n_shards
    sub = max(1, (p + n_shards - 1) // n_shards)
    enriched = enriched.withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(sub)).cast("int"))
    sorted_runs = (
        enriched.select("shard_id", "term_bucket", "term", "doc_id", "tf",
                        "doc_len", "idf")
        .repartition(n_shards * sub, "shard_id", "term_bucket")
        .sortWithinPartitions("shard_id", "term", "doc_id")
        .drop("term_bucket")
    )
    return sorted_runs.mapInPandas(
        _encoder_stream(k1, b, avgdl, block_size), schema=POSTING_SCHEMA
    )


def write_postings(postings: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Parquet partitioned by shard_id; dynamic overwrite → per-shard
    idempotent rewrites (the resume path re-emits only missing shards)."""
    (
        postings.write.partitionBy("shard_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode(mode)
        .parquet(path)
    )


def read_postings(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def shard_metrics(postings: DataFrame) -> DataFrame:
    """Per-shard build metrics (skew evidence for the manifest): posting
    counts, block counts, encoded bytes."""
    return postings.groupBy("shard_id").agg(
        F.countDistinct("term").alias("n_terms"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n").alias("n_postings"),
        (F.sum(F.length("deltas")) + F.sum(F.length("tfs"))
         + F.sum(F.length("dls"))).alias("payload_bytes"),
    )
