#!/usr/bin/env python3
"""line_dedup at 1M docs — the scale evidence VERDICT r5 item 4 asked for.

bench.py cannot grow rows (frozen), so this standalone harness measures
``dedup_lines`` on the deterministic 1M-doc fixture corpus with text
reshaped into LINES (the fixture bodies are single-line word soup; a
line-dedup bench needs line structure, so each doc's tokens are re-joined
into ~10-token lines — deterministic, and the Zipf token head gives a
realistic boilerplate-line head: the most common lines recur across many
documents, exercising the hot-join-key path the operator's docstring
documents as AQE-skew-split-reliant).

Decomposes the operator's two shuffles:

- ``line_freq_s``   — posexplode(lines) → groupBy(line).count (map-side
  partial agg → THE line-grain shuffle), materialized alone.
- ``line_dedup_s``  — the full operator (freq + join-back + ordered
  reassembly + restore join), noop sink.

Prints ONE JSON line and writes BENCH/LINE_DEDUP_1M.json.
Usage: python bench_line_dedup_scale.py [n_docs]   (default 1_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from fixtures.gen_corpus import write_pages_parquet
    from hybrid_search_engine_spark.operators.line_dedup import dedup_lines
    from hybrid_search_engine_spark.session import get_spark
    from hybrid_search_engine_spark.sources.pages import pages_to_docs

    cache_dir = os.path.join(REPO, ".fixtures")
    os.makedirs(cache_dir, exist_ok=True)
    pages_path = os.path.join(cache_dir, f"pages_{n_docs_target}.parquet")
    if not os.path.exists(pages_path):
        print(f"generating {n_docs_target}-doc corpus …", file=sys.stderr)
        write_pages_parquet(pages_path, n_docs_target)

    spark = get_spark(app="bench_line_dedup_scale", cores=cpus)
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    pages = spark.read.parquet(pages_path)
    docs = pages_to_docs(pages).select("doc_id", "text")
    # reshape each doc's token stream into ~10-token lines (deterministic;
    # see module docstring) and materialize so the timed runs don't pay
    # the reshape
    lined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest((F.size(F.split("text", " ")) - 1) / 10,
                               F.lit(0)).cast("int")),
                lambda i: F.concat_ws(
                    " ", F.slice(F.split("text", " "), i * 10 + 1, 10)),
            )).alias("text"))
    lined_path = os.path.join(cache_dir, f"lined_{n_docs_target}.parquet")
    if not os.path.exists(lined_path):
        lined.write.mode("overwrite").parquet(lined_path)
    docs = spark.read.parquet(lined_path)
    n_docs = docs.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"n_docs": n_docs, "cpus": cpus}

    spark.sparkContext.setJobDescription("line freq only")
    t0 = time.time()
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\\Q\n\\E")).alias("i", "line"))
    noop(lines.groupBy("line").agg(F.count(F.lit(1)).alias("c")))
    out["line_freq_s"] = round(time.time() - t0, 2)

    n_lines = lines.count()
    n_distinct = lines.select("line").distinct().count()
    out["n_lines"] = n_lines
    out["n_distinct_lines"] = n_distinct

    spark.sparkContext.setJobDescription("line_dedup full")
    t0 = time.time()
    noop(dedup_lines(docs, max_occurrences=1))
    out["line_dedup_s"] = round(time.time() - t0, 2)
    out["line_dedup_docs_per_sec"] = round(n_docs / out["line_dedup_s"], 1)

    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "LINE_DEDUP_1M.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
