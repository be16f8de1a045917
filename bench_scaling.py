#!/usr/bin/env python3
"""Scaling-efficiency benchmark (north rule: ≥0.8 from N to 4N).

Sandbox proxy for two cluster sizes: the SAME index-build job on the SAME
input at local[8] vs local[32] (fresh JVM each, fixed shuffle partitions =
cores). Reports docs/sec at both, efficiency = (thr32 / thr8) / 4, plus
query latency p50/p95 over the query set, into BENCH/BASELINE.md.

Usage:  python bench_scaling.py [n_docs]      (default 100_000)
Child:  python bench_scaling.py --child <cores> <pages_parquet> <out_json>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def child(cores: int, pages_path: str, out_json: str) -> None:
    from hybrid_search_engine_spark.build.manifest import IndexReader, build_index
    from hybrid_search_engine_spark.session import get_spark
    from hybrid_search_engine_spark.sources.pages import pages_to_docs

    spark = get_spark(app=f"scale{cores}", cores=cores, shuffle_partitions=cores)
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    pages = spark.read.parquet(pages_path)
    docs = pages_to_docs(pages).repartition(cores).cache()
    n_docs = docs.count()

    idx_dir = os.path.join(tempfile.mkdtemp(prefix=f"scale{cores}_"), "idx")
    t0 = time.time()
    build_index(spark, docs, idx_dir, n_shards=max(cores, 16))
    build_s = time.time() - t0

    # query latency over the full query set (warm index)
    from fixtures.gen_corpus import all_queries

    reader = IndexReader(spark, idx_dir)
    reader.postings = reader.postings.cache()
    reader.postings.count()
    lat = []
    for q in all_queries():
        t0 = time.time()
        reader.search(q, k=10).collect()
        lat.append(time.time() - t0)
    lat.sort()

    def pct(p):
        return lat[min(len(lat) - 1, int(p * len(lat)))]

    with open(out_json, "w") as f:
        json.dump({
            "cores": cores,
            "n_docs": n_docs,
            "build_s": round(build_s, 3),
            "docs_per_sec": round(n_docs / build_s, 1),
            "n_queries": len(lat),
            "q_p50_ms": round(pct(0.50) * 1000, 1),
            "q_p95_ms": round(pct(0.95) * 1000, 1),
            "q_p99_ms": round(pct(0.99) * 1000, 1),
        }, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    from fixtures.gen_corpus import write_pages_parquet

    workdir = tempfile.mkdtemp(prefix="bench_scaling_")
    pages_path = os.path.join(workdir, f"pages_{n_docs}.parquet")
    print(f"generating {n_docs}-doc corpus …", file=sys.stderr)
    write_pages_parquet(pages_path, n_docs)

    results = {}
    for cores in (8, 32):
        out = os.path.join(workdir, f"r{cores}.json")
        print(f"running build+query at local[{cores}] …", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(cores), pages_path, out],
            check=True, cwd=REPO,
        )
        with open(out) as f:
            results[cores] = json.load(f)

    thr8, thr32 = results[8]["docs_per_sec"], results[32]["docs_per_sec"]
    eff = (thr32 / thr8) / 4.0
    report = {
        "n_docs": n_docs,
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(report))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling + latency evidence

Protocol (BASELINE.md "sandbox scaling protocol"): identical index-build job
(extract → stats → postings encode → write) on the identical deterministic
{n_docs:,}-doc synthetic corpus, at two parallelism levels in fresh JVMs.
Efficiency = (throughput@32 / throughput@8) / 4; requirement ≥ 0.8.

| config | docs/sec (build) | query p50 ms | query p95 ms | query p99 ms |
|---|---|---|---|---|
| local[8]  | {results[8]['docs_per_sec']:,} | {results[8]['q_p50_ms']} | {results[8]['q_p95_ms']} | {results[8]['q_p99_ms']} |
| local[32] | {results[32]['docs_per_sec']:,} | {results[32]['q_p50_ms']} | {results[32]['q_p95_ms']} | {results[32]['q_p99_ms']} |

**Scaling efficiency (build): {eff:.3f}** {"(PASS ≥ 0.8)" if eff >= 0.8 else "(BELOW 0.8 — see notes)"}

Query set: {results[8]['n_queries']} queries (5 reference demo queries from
/root/reference/main.py:50-54,109,137 + 95 generated at mixed term
frequencies incl. OOV). k=10, block-max pruned path, warm index.

Raw: {json.dumps(report)}
""")
    print(f"wrote BENCH/BASELINE.md (efficiency={eff:.3f})", file=sys.stderr)


if __name__ == "__main__":
    main()
