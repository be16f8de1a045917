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

Noise control: this VM shows multi-second excursions (hypervisor steal +
single-JVM GC) that can inflate an individual 1 s query 20×. Every query
except index_build is therefore timed best-of-N (N=3 by default,
$SPARK_GRAFT_BENCH_TRIALS to override) with a System.gc() before each
section, so a recorded number reflects the plan, not a page-cache or GC
accident. index_build is best-of-N too since round 3 — each trial is a
complete cold build of the same corpus into a FRESH directory (no resume /
tf-cache reuse between trials), so the minimum is still an honest
full-build number; this VM's bursty multi-second FS stalls (measured:
identical 200-doc builds ranging 8-50 s under contention vs 3-9 s quiet)
otherwise have even odds of landing inside the single timed build.
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
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))

    def timed(name, fn, repeat=None):
        best, out = None, None
        for _ in range(repeat or trials):
            spark._jvm.System.gc()
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        return out

    # --- flagship BM25 path over the documents table -----------------------
    docs = contract._docs(spark, SF_DIR).cache()
    n_docs = docs.count()

    # warmup build on a 200-doc slice: the FIRST build in a fresh JVM pays
    # 6-7 s of one-time codegen + Arrow python-worker + parquet-writer
    # startup (measured: 9.5 s first vs 3.2 s steady at sf0.1); those costs
    # amortize to zero over a real corpus, so the timed build should not
    # carry them (same reasoning as the spark.range warmup above)
    warm_dir = os.path.join(tempfile.mkdtemp(prefix="bench_warm_"), "idx")
    build_index(spark, docs.limit(200), warm_dir, n_shards=min(CPUS, 32))

    # fresh dir per trial: a repeat into the same dir would be a resume
    # no-op (fingerprint match), so each trial is a genuine cold build
    idx_dirs = [os.path.join(tempfile.mkdtemp(prefix="bench_idx_"), "idx")
                for _ in range(trials)]
    trial_iter = iter(idx_dirs)
    timed("index_build", lambda: build_index(
        spark, docs, next(trial_iter), n_shards=min(CPUS, 32)))
    reader = IndexReader(spark, idx_dirs[-1], cache_postings=True,
                         cache_tf=True)

    timed("bm25_query_pruned", lambda: reader.search(
        contract.FLAGSHIP_QUERY, k=10).collect())
    timed("bm25_query_exact_cached", lambda: reader.search(
        contract.FLAGSHIP_QUERY, k=10, mode="exact").collect())
    # repeat=1: this is the COLD recompute-from-text backstop; a second
    # trial would hit the in-process stats cache and report a warm number
    timed("bm25_query_exact_path", lambda: contract.q_bm25_topk(
        spark, SF_DIR).collect(), repeat=1)

    # --- relational operator headline set ----------------------------------
    for name in [
        "doc_term_tf", "term_stats", "doc_metadata", "pricing_summary",
        "nation_revenue", "top_orders_per_customer", "topk_orders",
        "events_json", "dedup_exact", "event_windows",
    ]:
        fn = contract.QUERIES[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite").save())

    # --- training-data-pipeline operators (dedup / similarity / quality) ---
    from hybrid_search_engine_spark import contract_ext

    for name in ["minhash_sig", "knn_batch", "knn_ivf", "quality",
                 "lang_detect", "repetition",
                 # round-5 additions: fulltext retrieval tiers + PII scrub
                 # (bool/near build a positional postings table per run —
                 # the timed number is build + index-tier query)
                 "phrase_match", "pii_redact", "bool_query", "near_query",
                 "lm_score", "decontaminate", "span_dedup"]:
        fn = contract_ext.QUERIES_EXT[name]
        timed(name, lambda fn=fn: fn(spark, SF_DIR).write.format("noop").mode(
            "overwrite").save())

    # engine-tier minhash (xxhash64 signatures — the default for
    # minhash_lsh_pairs; minhash_sig above is the md5 portable/oracle tier)
    from hybrid_search_engine_spark.operators.dedup import (
        minhash_signatures_fast,
    )

    timed("minhash_fast", lambda: minhash_signatures_fast(
        contract_ext._docs(spark, SF_DIR)).write.format("noop").mode(
        "overwrite").save())

    # transitive dedup groups over the scale path: xxhash64 MinHash LSH
    # candidate pairs -> alternating-star connected components
    from hybrid_search_engine_spark.operators.dedup import (
        dedup_groups,
        minhash_lsh_pairs,
    )

    timed("dedup_groups_lsh", lambda: dedup_groups(
        contract_ext._docs(spark, SF_DIR),
        minhash_lsh_pairs(contract_ext._docs(spark, SF_DIR),
                          jaccard_threshold=0.5),
    ).write.format("noop").mode("overwrite").save())

    # 1k-query batch through the broadcast queries-info path (the
    # closure→broadcast switch engages at BATCH_BROADCAST_MIN=64)
    from fixtures.gen_corpus import all_queries

    qs = all_queries()

    # north-rule metric: top-k query p95 latency (rank-identical BM25
    # top-k). 24 warm single-query round-trips rotating through the query
    # set on the pruned scorer (proven rank-identical to exact + oracle)
    lat = []
    for i in range(24):
        t0 = time.time()
        reader.search(qs[i % len(qs)], k=10).collect()
        lat.append(time.time() - t0)
    timings["bm25_query_p95"] = round(sorted(lat)[int(0.95 * (len(lat) - 1))], 4)
    batch_1k = [(i, qs[i % len(qs)]) for i in range(1000)]
    timed("bm25_batch_1k", lambda: reader.search_batch(
        batch_1k, k=10).write.format("noop").mode("overwrite").save())

    total = round(sum(timings.values()), 4)
    # frozen per-round headline sets — new rows added in later rounds
    # inflate the grand total, so cross-round comparisons use these
    # sub-totals. R02_KEYS = exactly the 17 rows BENCH_r02.json reported
    # (round 3 mistakenly included lang_detect, overstating the comparable
    # subtotal by ~1.6 s; fixed per the round-3 verdict).
    R02_KEYS = {
        "index_build", "bm25_query_pruned", "bm25_query_exact_cached",
        "bm25_query_exact_path", "doc_term_tf", "term_stats", "doc_metadata",
        "pricing_summary", "nation_revenue", "top_orders_per_customer",
        "topk_orders", "events_json", "dedup_exact", "event_windows",
        "minhash_sig", "knn_batch", "quality",
    }
    # exactly the 24 rows BENCH_r03.json reported
    R03_KEYS = R02_KEYS | {
        "lang_detect", "knn_ivf", "repetition", "minhash_fast",
        "dedup_groups_lsh", "bm25_query_p95", "bm25_batch_1k",
    }
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": f"headline_total_runtime_local[{CPUS}]",
        "value": total,
        "unit": "sec",
        "value_r02_comparable": round(
            sum(v for k, v in timings.items() if k in R02_KEYS), 4),
        "value_r03_comparable": round(
            sum(v for k, v in timings.items() if k in R03_KEYS), 4),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs_indexed": n_docs,
        # north-rule companion number: docs/sec of the best cold build
        "index_build_docs_per_sec": round(n_docs / timings["index_build"], 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
