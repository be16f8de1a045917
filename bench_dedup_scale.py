#!/usr/bin/env python3
"""Dedup-at-scale bench: MinHash-LSH pair generation vs the
alternating-star connected-components loop on the 1M-doc corpus.

The per-round bench (bench.py) measures `dedup_groups_lsh` at sf0.1
(5k docs), where the 11-12 s cost is per-round fixed overhead — it says
nothing about how the CC loop behaves when the edge set is real. This
script runs the same pipeline on the deterministic 1M-doc fixture corpus
(fixtures/gen_corpus.py — exact duplicates planted at i ≡ 0 (mod 97),
near duplicates by 5% token swaps, i.e. a realistic web near-dup rate)
and decomposes:

- ``dedup_pairs_1m``  — signature → band → bucket equi-join → verified
  candidate pairs, materialized (localCheckpoint) so the CC timing below
  contains NO pair-generation work.
- ``dedup_cc_1m``     — alternating large-star/small-star to fixpoint with
  ``local_threshold=0`` (the fully-distributed path a 10^12-doc corpus
  would take), per-round edge counts + wall via ``round_stats``.
- ``dedup_cc_hybrid`` — the default path (driver union-find below 500k
  live edges), what `dedup_groups` actually does.

Prints ONE JSON line and writes BENCH/DEDUP_1M.json.
Usage: python bench_dedup_scale.py [n_docs]   (default 1_000_000)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs_target = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from fixtures.gen_corpus import write_pages_parquet
    from hybrid_search_engine_spark.operators.dedup import (
        connected_components,
        dedup_groups,
        minhash_lsh_pairs,
    )
    from hybrid_search_engine_spark.session import get_spark
    from hybrid_search_engine_spark.sources.pages import pages_to_docs

    cache_dir = os.path.join(REPO, ".fixtures")
    os.makedirs(cache_dir, exist_ok=True)
    pages_path = os.path.join(cache_dir, f"pages_{n_docs_target}.parquet")
    if not os.path.exists(pages_path):
        print(f"generating {n_docs_target}-doc corpus …", file=sys.stderr)
        write_pages_parquet(pages_path, n_docs_target)

    spark = get_spark(app="bench_dedup_scale", cores=cpus)
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    docs = pages_to_docs(spark.read.parquet(pages_path),
                         partitions=4 * cpus).select("doc_id", "text").cache()
    n_docs = docs.count()

    rep: dict = {"n_docs": n_docs, "cpus": cpus}

    # --- pair generation (signature -> band join -> verify), materialized
    #
    # Parameters are the web-scale ones, NOT the sf0.1 contract defaults:
    # shingle_k=9, num_perm=32, bands=8 (r=4). With the contract's 3-char
    # shingles, two UNRELATED docs drawn from a shared vocabulary already
    # overlap at J≈0.3 (the 3-gram universe of a fixed vocab is tiny), so
    # the r=4 S-curve admits ~1% of ALL pairs as candidates — measured
    # 140k candidates on 5k docs, and at 1M docs the ~n² candidate stream
    # overflowed a 250 GB disk twice. 9-char shingles push background
    # Jaccard toward 0 (collision ~J^4 per band), so candidates track the
    # TRUE dups: this is the same parameter discipline a 10^12-doc corpus
    # needs (cf. word-level 13-gram MinHash in published web-dedup
    # pipelines). Recall at the planted 5%-token-swap near-dups stays
    # high via bands=8.
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5, shingle_k=9,
                              num_perm=32, bands=8).localCheckpoint()
    n_pairs = pairs.count()
    rep["dedup_pairs_1m_s"] = round(time.time() - t0, 2)
    rep["n_pairs"] = n_pairs
    rep["pairs_docs_per_sec"] = round(n_docs / rep["dedup_pairs_1m_s"], 1)

    # --- fully-distributed CC (the 10^12-doc path), round-instrumented
    rs: list = []
    t0 = time.time()
    cc = connected_components(pairs, local_threshold=0, round_stats=rs)
    n_groups = cc.select("component").distinct().count()
    rep["dedup_cc_1m_s"] = round(time.time() - t0, 2)
    rep["cc_rounds"] = rs
    rep["n_rounds_to_fixpoint"] = len(rs)
    rep["n_components"] = n_groups
    # Kiveris bound: O(log^2 n) rounds on n nodes
    n_nodes = 2 * n_pairs  # upper bound; the bound is vs corpus anyway
    rep["log2_sq_bound"] = round(math.log2(max(n_nodes, 2)) ** 2, 1)

    # --- the default hybrid path end-to-end (what dedup_groups runs)
    t0 = time.time()
    dedup_groups(docs, pairs).write.format("noop").mode("overwrite").save()
    rep["dedup_cc_hybrid_s"] = round(time.time() - t0, 2)
    rep["dedup_total_docs_per_sec"] = round(
        n_docs / (rep["dedup_pairs_1m_s"] + rep["dedup_cc_hybrid_s"]), 1)

    print(json.dumps(rep))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "DEDUP_1M.json"), "w") as f:
        json.dump(rep, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
