#!/usr/bin/env python3
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Headline set = the flagship BM25 path (stats build, posting-index build,
block-max top-k query) plus representative relational operators from the
driver contract. Each timing is a full action (collect/count) on a cold
plan; a warmup action first absorbs one-time JVM/codegen startup so numbers
reflect steady-state execution, which is what scales.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from hybrid_search_engine_spark.session import get_spark

    spark = get_spark(app="bench", cores=CPUS)  # sp = 4×cores default
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # warmup

    from hybrid_search_engine_spark import contract
    from hybrid_search_engine_spark.build.manifest import IndexReader, build_index

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 4)
        return out

    # --- flagship BM25 path over the documents table -----------------------
    docs = contract._docs(spark, SF_DIR).cache()
    n_docs = docs.count()

    idx_dir = os.path.join(tempfile.mkdtemp(prefix="bench_idx_"), "idx")
    timed("index_build", lambda: build_index(
        spark, docs, idx_dir, n_shards=min(CPUS, 32)))
    reader = IndexReader(spark, idx_dir, cache_postings=True, cache_tf=True)

    timed("bm25_query_pruned", lambda: reader.search(
        contract.FLAGSHIP_QUERY, k=10).collect())
    timed("bm25_query_exact_cached", lambda: reader.search(
        contract.FLAGSHIP_QUERY, k=10, mode="exact").collect())
    timed("bm25_query_exact_path", lambda: contract.q_bm25_topk(
        spark, SF_DIR).collect())

    # --- relational operator headline set ----------------------------------
    for name in [
        "doc_term_tf", "term_stats", "doc_metadata", "pricing_summary",
        "nation_revenue", "top_orders_per_customer", "topk_orders",
        "events_json", "dedup_exact", "event_windows",
    ]:
        fn = contract.QUERIES[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite").save())

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": f"headline_total_runtime_local[{CPUS}]",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs_indexed": n_docs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
