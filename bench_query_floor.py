#!/usr/bin/env python3
"""Decompose the single-query latency floor on a 1M-doc index.

MULTIJVM_cluster_query.json puts p50 at ~530 ms on K=4 executors over 1M
docs. That number is a sum of very different things and the fix differs per
term; this script separates them on a reusable cached index:

- ``plan_ms``      — driver-side: tokenize + idf lookup + DataFrame
                     construction + Catalyst analysis/planning (no job).
- ``floor_ms``     — a 1-posting-block query (rarest term): full job
                     round-trip where scan+filter dominates and python-side
                     scoring is ~0. This is the InMemoryTableScan + task
                     wave + Arrow round-trip floor every query pays.
- ``hot_ms``       — the 40-query protocol p50/p95 (same queries as
                     bench_multijvm): adds posting transfer + block decode
                     + MaxScore work on top of the floor.

Usage: python bench_query_floor.py [n_docs] [cores]
Reuses .fixtures/pages_{n}.parquet and .fixtures/qfloor_idx_{n}/ across
runs (delete the idx dir after changing the build format).
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _pct(xs: list, p: float) -> float:
    xs = sorted(xs)
    return round(xs[min(len(xs) - 1, int(p * len(xs)))] * 1000, 1)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from fixtures.gen_corpus import all_queries, write_pages_parquet
    from hybrid_search_engine_spark.build.manifest import (
        IndexReader,
        build_index,
    )
    from hybrid_search_engine_spark.session import get_spark
    from hybrid_search_engine_spark.sources.pages import pages_to_docs

    cache = os.path.join(REPO, ".fixtures")
    os.makedirs(cache, exist_ok=True)
    pages = os.path.join(cache, f"pages_{n_docs}.parquet")
    if not os.path.exists(pages):
        write_pages_parquet(pages, n_docs)

    spark = get_spark(app="qfloor", cores=cores)
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # JIT warm

    idx = os.path.join(cache, f"qfloor_idx_{n_docs}")
    if not os.path.exists(os.path.join(idx, "stats", "corpus.json")):
        docs = pages_to_docs(spark.read.parquet(pages), partitions=4 * cores)
        build_index(spark, docs, idx, n_shards=32)

    t0 = time.time()
    reader = IndexReader(spark, idx, cache_postings=True, cache_tf=True)
    open_s = time.time() - t0

    # rarest usable term: 1 block, ~0 python scoring -> job floor.
    # term_stats keys are bigint hashes on the engine tier
    # (term_domain="hash", build/manifest.py), so recover a QUERYABLE
    # string by hashing the fixture vocabulary driver-side and joining:
    # the rarest vocab word present in the index, by (df, term).
    import random as _random

    from pyspark.sql import functions as F

    from fixtures.gen_corpus import SEED, _make_vocab
    from hybrid_search_engine_spark.functions.hashing import (
        spark_xxhash64_str,
    )

    vocab = _make_vocab(_random.Random(SEED))  # the corpus's own vocabulary
    term_dtype = dict(reader.term_stats.dtypes)["term"]
    if term_dtype == "bigint":
        by_key = {spark_xxhash64_str(w): w for w in vocab}
    else:
        by_key = {w: w for w in vocab}
    hits = {r["term"]: r["df"] for r in reader.term_stats.where(
        F.col("term").isin(list(by_key))).select("term", "df").collect()}
    rare = by_key[min(hits, key=lambda t: (hits[t], by_key[t]))]
    # warmup: spin up python workers on every core before timing
    for _ in range(3):
        reader.search("the quick brown fox jumps", k=10).collect()

    plan = []
    for _ in range(15):
        t = time.time()
        df = reader.search(rare, k=10)
        df._jdf.queryExecution().executedPlan()  # force analysis+planning
        plan.append(time.time() - t)

    floor = []
    for _ in range(15):
        t = time.time()
        reader.search(rare, k=10).collect()
        floor.append(time.time() - t)

    queries = all_queries()
    hot = []
    for q in queries[:40]:
        t = time.time()
        reader.search(q, k=10).collect()
        hot.append(time.time() - t)

    # JVM-only single-stage serving tier (no python stage at all)
    for _ in range(3):
        reader.search("the quick brown fox jumps", k=10, mode="exact").collect()
    serve = []
    for q in queries[:40]:
        t = time.time()
        reader.search(q, k=10, mode="exact").collect()
        serve.append(time.time() - t)

    rep = {
        "n_docs": n_docs, "cores": cores, "rare_term": rare,
        "reader_open_s": round(open_s, 2),
        "plan_ms_p50": _pct(plan, 0.5),
        "floor_ms_p50": _pct(floor, 0.5), "floor_ms_p95": _pct(floor, 0.95),
        "hot_ms_p50": _pct(hot, 0.5), "hot_ms_p95": _pct(hot, 0.95),
        "hot_minus_floor_p50": round(_pct(hot, 0.5) - _pct(floor, 0.5), 1),
        "hot_mean_ms": round(1000 * statistics.mean(hot), 1),
        "serving_ms_p50": _pct(serve, 0.5),
        "serving_ms_p95": _pct(serve, 0.95),
    }
    print(json.dumps(rep))
    spark.stop()


if __name__ == "__main__":
    main()
