#!/usr/bin/env python3
"""Round-6 optimization harness: per-query isolation + plan capture.

NOT the driver bench (bench.py is frozen). This file exists so each
declared query can be timed alone with the noop sink (guide §1.4) and its
`.explain("formatted")` captured to plans/r06/ for the judge.

Usage:
    python bench_extra.py plans [out_suffix]    # dump plans for all rows
    python bench_extra.py time <name> [trials]  # best-of-N noop timing
    python bench_extra.py timeall [trials]      # every bench row

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")

# bench.py's noop-timed rows (index_build/bm25 reader rows are driven by
# their own harness and are not plain DataFrame plans)
RELATIONAL = [
    "doc_term_tf", "term_stats", "doc_metadata", "pricing_summary",
    "nation_revenue", "top_orders_per_customer", "topk_orders",
    "events_json", "dedup_exact", "event_windows",
]
EXT = [
    "minhash_sig", "knn_batch", "knn_ivf", "quality", "lang_detect",
    "repetition", "phrase_match", "pii_redact", "bool_query", "near_query",
    "lm_score", "decontaminate", "span_dedup",
]


def _get_query(name):
    from hybrid_search_engine_spark import contract, contract_ext

    if name in contract.QUERIES:
        return contract.QUERIES[name]
    return contract_ext.QUERIES_EXT[name]


def _spark():
    from hybrid_search_engine_spark.session import get_spark

    spark = get_spark(app="bench_extra", cores=CPUS)
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # warmup
    return spark


def dump_plans(names, suffix="before"):
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = _spark()
    for name in names:
        df = _get_query(name)(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(PLANS_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


def time_queries(names, trials=3):
    spark = _spark()
    out = {}
    for name in names:
        fn = _get_query(name)
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(trials):
            spark._jvm.System.gc()
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 4)
        print(f"{name}: {out[name]}s (best of {trials})", flush=True)
    spark.sparkContext.setJobDescription(None)
    print(out)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "timeall"
    if cmd == "plans":
        suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
        dump_plans(RELATIONAL + EXT, suffix)
    elif cmd == "time":
        time_queries([sys.argv[2]], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "timeall":
        time_queries(RELATIONAL + EXT,
                     int(sys.argv[2]) if len(sys.argv) > 2 else 3)
    else:
        raise SystemExit(f"unknown command {cmd}")
