"""Exact-key result cache for repeated search queries.

Reference semantics: cache.py:24-110 (``InMemoryCache``): key =
md5(query + ':' + json(params, sort_keys)), LRU eviction at ``max_size``
entries, TTL expiry at ``ttl_seconds``; cache.py:112-170 is the same
contract against Redis.

Spark-first shape: the reference caches in driver/Redis memory because it
is a single process. Here the cache is a parquet directory of
(key, query, params_json, created_at, payload) rows — shared by every
driver that points at it, crash-safe, and compactable like any other
segment store. Payload is the JSON of the result rows: search results are
top-k-sized (≤ a few KB), so a driver-side read of one key is a pruned
parquet point-lookup, not a data-sized scan.

LRU nuance: the reference evicts by INSERT order (its ``_access_order``
only appends on set — cache.py:44-49,75-87), i.e. FIFO at max_size; we
replicate that exactly with created_at ordering at compaction. TTL is
enforced on read (expired keys miss) and at compaction (dropped).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..localdf import local_df

ENTRIES_DIR = "entries"


def make_key(query: str, **params) -> str:
    """cache.py:38-42 parity: md5('{query}:{json(params, sort_keys)}')."""
    params_str = json.dumps(params, sort_keys=True)
    return hashlib.md5(f"{query}:{params_str}".encode()).hexdigest()


class ResultCache:
    def __init__(self, spark: SparkSession, cache_dir: str,
                 max_size: int = 1000, ttl_seconds: int = 3600):
        self.spark = spark
        self.dir = os.path.join(cache_dir, ENTRIES_DIR)
        self.max_size = max_size
        self.ttl_seconds = ttl_seconds

    def _entries(self) -> DataFrame | None:
        if not os.path.isdir(self.dir):
            return None
        try:
            return self.spark.read.parquet(self.dir)
        except Exception:
            return None

    def set(self, query: str, results: list, **params) -> str:
        """Append one entry; returns the key. ``results`` is any
        JSON-serializable payload (the reference stores
        [(score, content, doc_id)] tuples)."""
        key = make_key(query, **params)
        row = [(key, query, json.dumps(params, sort_keys=True),
                float(time.time()), json.dumps(results))]
        df = local_df(
            self.spark, row,
            "key string, query string, params_json string, "
            "created_at double, payload string")
        df.write.mode("append").parquet(self.dir)
        return key

    def get(self, query: str, **params):
        """→ payload or None (miss / expired). Newest write for a key wins
        (an append-only store can hold several)."""
        e = self._entries()
        if e is None:
            return None
        key = make_key(query, **params)
        cutoff = time.time() - self.ttl_seconds
        rows = (e.where((F.col("key") == key) & (F.col("created_at") > cutoff))
                .orderBy(F.col("created_at").desc()).limit(1).collect())
        return json.loads(rows[0]["payload"]) if rows else None

    def invalidate(self, query: str | None = None, **params) -> None:
        """cache.py:89-99: one key, or everything (query=None)."""
        if query is None:
            import shutil

            shutil.rmtree(self.dir, ignore_errors=True)
            return
        key = make_key(query, **params)
        e = self._entries()
        if e is None:
            return
        kept = e.where(F.col("key") != key)
        self._rewrite(kept)

    def compact(self) -> None:
        """Drop expired entries, keep newest per key, enforce max_size by
        insert recency (the reference's FIFO-at-max_size eviction)."""
        e = self._entries()
        if e is None:
            return
        from pyspark.sql import Window

        cutoff = time.time() - self.ttl_seconds
        w = Window.partitionBy("key").orderBy(F.col("created_at").desc())
        latest = (e.where(F.col("created_at") > cutoff)
                  .withColumn("rn", F.row_number().over(w))
                  .where("rn = 1").drop("rn"))
        top = (latest.orderBy(F.col("created_at").desc())
               .limit(self.max_size))
        self._rewrite(top)

    def _rewrite(self, df: DataFrame) -> None:
        tmp = self.dir + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(self.dir, ignore_errors=True)
        os.rename(tmp, self.dir)

    def stats(self) -> dict:
        e = self._entries()
        n = 0 if e is None else e.select("key").distinct().count()
        return {"size": n, "max_size": self.max_size,
                "ttl_seconds": self.ttl_seconds}
