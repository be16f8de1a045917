"""Resumable index builds with per-shard lineage + metrics manifest.

The manifest is a JSON-lines file at ``<index_dir>/_manifest.jsonl``; one
record per completed shard:

    {"shard_id": 3, "status": "done", "n_terms":..., "n_blocks":...,
     "n_postings":..., "payload_bytes":..., "skew_ratio":...,
     "source_fingerprint": {"n_docs":..., "max_warc_ts":...},
     "built_at":..., "attempt":..., "elapsed_s":..., "docs_per_sec":...}

Resume protocol (SURVEY.md §7.2.4, north rule "resumable from per-partition
checkpoints carrying lineage"):

1. read the manifest; `done` = shards with status=done AND matching source
   fingerprint (a changed source invalidates every shard);
2. build only missing shards (`shard_filter` pushes a shard_id predicate
   into the build plan — the anti-join against done work);
3. write with dynamic partition overwrite (idempotent per shard dir: a
   re-run of a crashed shard replaces its files exactly);
4. append manifest records only after the write commits.

In production the manifest would be an Iceberg table and the fingerprint a
source snapshot id; JSON-lines keeps the same protocol testable here.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.postings import (
    build_postings,
    read_postings,
    shard_metrics,
    write_postings,
)
from ..operators.stats import build_statistics

MANIFEST_NAME = "_manifest.jsonl"


@dataclass
class IndexBuildResult:
    index_dir: str
    n_shards: int
    built_shards: list
    skipped_shards: list
    elapsed_s: float
    docs_per_sec: float
    avg_doc_len: float
    doc_count: int


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


def read_manifest(index_dir: str) -> list[dict]:
    p = _manifest_path(index_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [json.loads(line) for line in f if line.strip()]


def append_manifest(index_dir: str, records: list[dict]) -> None:
    os.makedirs(index_dir, exist_ok=True)
    with open(_manifest_path(index_dir), "a") as f:
        for r in records:
            f.write(json.dumps(r, sort_keys=True) + "\n")


def source_fingerprint(docs: DataFrame) -> dict:
    """Lineage: identifies the exact source the shards were built from."""
    agg = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(doc_id))").alias("h"),  # order-insensitive
    ).first()
    return {"n_docs": int(agg["n"]), "id_hash": int(agg["h"] or 0)}


def done_shards(index_dir: str, fingerprint: dict) -> set:
    return {
        r["shard_id"]
        for r in read_manifest(index_dir)
        if r.get("status") == "done" and r.get("source_fingerprint") == fingerprint
    }


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_shards: int = 32,
    k1: float = 1.5,
    b: float = 0.75,
    block_size: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    fail_after_shards: int | None = None,
) -> IndexBuildResult:
    """Build (or resume) the full index for ``docs(doc_id, text, ...)``.

    Writes postings parquet under ``index_dir/postings``, statistics under
    ``index_dir/stats``, manifest at ``index_dir/_manifest.jsonl``.

    ``fail_after_shards`` is a test hook: simulate a crash after N shards
    completed (builds only those shards, records them, then raises).
    """
    import sys

    verbose = os.environ.get("HSE_BUILD_VERBOSE") == "1"

    def _log(msg):
        if verbose:
            print(f"[build_index +{time.time() - t0:7.1f}s] {msg}",
                  file=sys.stderr, flush=True)

    t0 = time.time()
    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    fp = source_fingerprint(docs)  # one agg: count + id hash (fused)
    _log("fingerprint done")
    done = done_shards(index_dir, fp)
    todo = [s for s in range(n_shards) if s not in done]
    simulate_crash = False
    if fail_after_shards is not None and len(todo) > fail_after_shards:
        todo = todo[:fail_after_shards]
        simulate_crash = True

    tf, dstats, tstats, scalars = build_statistics(docs,
                                                   doc_count=fp["n_docs"])
    _log("statistics built")

    posting_path = os.path.join(index_dir, "postings")
    built = []
    if todo:
        postings = build_postings(
            tf, dstats, tstats, scalars.avg_doc_len, n_shards=n_shards,
            k1=k1, b=b, block_size=block_size, shard_filter=todo,
        )
        # dynamic partition overwrite: only the shards in `todo` are
        # replaced; previously-completed shard dirs are untouched, and a
        # crashed shard's partial files are replaced exactly on retry
        write_postings(postings, posting_path, mode="overwrite")
        _log("postings written")
        # per-shard metrics from what we just wrote
        stored = read_postings(spark, posting_path).where(
            F.col("shard_id").isin(todo))
        metrics = {r["shard_id"]: r.asDict() for r in shard_metrics(stored).collect()}
        _log("shard metrics collected")
        elapsed = time.time() - t0
        mean_postings = (
            sum(m["n_postings"] for m in metrics.values()) / max(len(metrics), 1)
        ) or 1
        now = time.time()
        records = []
        for s in todo:
            m = metrics.get(s, {"n_terms": 0, "n_blocks": 0, "n_postings": 0,
                                "payload_bytes": 0, "shard_id": s})
            records.append({
                "shard_id": s,
                "status": "done",
                "n_terms": int(m["n_terms"]),
                "n_blocks": int(m["n_blocks"]),
                "n_postings": int(m["n_postings"]),
                "payload_bytes": int(m["payload_bytes"]),
                "skew_ratio": round(m["n_postings"] / mean_postings, 4),
                "source_fingerprint": fp,
                "built_at": now,
                "attempt": 1 + sum(
                    1 for r in read_manifest(index_dir) if r["shard_id"] == s
                ),
                "elapsed_s": round(elapsed, 3),
            })
        append_manifest(index_dir, records)
        built = todo

    # stats tables (idempotent full rewrite — tiny relative to postings)
    if not simulate_crash:
        tstats.write.mode("overwrite").parquet(os.path.join(index_dir, "stats", "term_stats"))
        dstats.write.mode("overwrite").parquet(os.path.join(index_dir, "stats", "doc_stats"))
        _log("stats tables written")
        with open(os.path.join(index_dir, "stats", "corpus.json"), "w") as f:
            json.dump({"doc_count": scalars.doc_count,
                       "avg_doc_len": scalars.avg_doc_len,
                       "k1": k1, "b": b, "n_shards": n_shards,
                       "block_size": block_size,
                       "source_fingerprint": fp}, f)
    tf.unpersist()

    elapsed = time.time() - t0
    result = IndexBuildResult(
        index_dir=index_dir, n_shards=n_shards, built_shards=built,
        skipped_shards=sorted(done), elapsed_s=elapsed,
        docs_per_sec=(fp["n_docs"] * len(built) / n_shards) / elapsed if elapsed else 0.0,
        avg_doc_len=scalars.avg_doc_len, doc_count=scalars.doc_count,
    )
    if simulate_crash:
        raise RuntimeError(f"simulated crash after shards {todo}")
    return result


class IndexReader:
    """Query-side handle: postings + stats + corpus scalars.

    ``cache_term_stats=True`` pulls the term→idf dictionary to the driver
    once (one job) so per-query latency pays zero stats lookups — right
    whenever the vocabulary fits driver memory. At web scale leave it False:
    queries then do a parquet point-lookup pruned by the term IN-list.
    """

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache_term_stats: bool = True):
        self.spark = spark
        self.postings = read_postings(spark, os.path.join(index_dir, "postings"))
        self.term_stats = spark.read.parquet(
            os.path.join(index_dir, "stats", "term_stats"))
        with open(os.path.join(index_dir, "stats", "corpus.json")) as f:
            self.corpus = json.load(f)
        self._tstats_arg = self.term_stats
        if cache_term_stats:
            self._tstats_arg = {
                r["term"]: float(r["idf"])
                for r in self.term_stats.select("term", "idf").collect()
            }

    def search(self, query: str, k: int = 10, mode: str = "pruned"):
        from ..operators.wand import search_index

        return search_index(
            self.spark, self.postings, self._tstats_arg,
            self.corpus["avg_doc_len"], query, k=k,
            k1=self.corpus["k1"], b=self.corpus["b"], mode=mode,
        )

    def search_batch(self, queries: list, k: int = 10, mode: str = "pruned"):
        """[(query_id, text)] → (query_id, rank, doc_id, score), one plan."""
        from ..operators.wand import search_index_batch

        return search_index_batch(
            self.spark, self.postings, self._tstats_arg,
            self.corpus["avg_doc_len"], queries, k=k,
            k1=self.corpus["k1"], b=self.corpus["b"], mode=mode,
        )
