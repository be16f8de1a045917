#!/usr/bin/env python3
"""Round-6 (session B) stage decomposition for the remaining hot rows.

Times each stage of dedup_groups_lsh and lm_score in isolation with the
noop sink (guide §1.4) so the next optimization targets the real cost
center. NOT the driver bench; bench.py stays frozen.

Usage: python bench_r06b_decomp.py [dedup|lm|all] [trials]
Env: SPARK_GRAFT_SF_DIR (default /root/sfbig/sf1.0), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/sfbig/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from hybrid_search_engine_spark.session import get_spark

    spark = get_spark(app="r06b_decomp", cores=CPUS)
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    return spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, trials=3):
    best = None
    for _ in range(trials):
        t0 = time.time()
        spark.sparkContext.setJobDescription(label)
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best {best:.3f}s over {trials}")
    return round(best, 3)


def decomp_dedup(spark, trials):
    from pyspark.sql import functions as F

    from hybrid_search_engine_spark import contract_ext
    from hybrid_search_engine_spark.operators import dedup as D

    docs = contract_ext._docs(spark, SF_DIR)
    out = {}

    out["sig_fast"] = timed(
        spark, "sig_fast",
        lambda: noop(D.minhash_signatures_fast(docs)), trials)
    out["band_hashes_nocap"] = timed(
        spark, "band_hashes_nocap",
        lambda: noop(D.minhash_band_hashes(docs, band_bucket_cap=0)), trials)
    out["band_hashes_cap200"] = timed(
        spark, "band_hashes_cap200",
        lambda: noop(D.minhash_band_hashes(docs, band_bucket_cap=200)),
        trials)

    def cand_only():
        banded = D.minhash_band_hashes(docs, band_bucket_cap=200)
        a = banded.alias("a")
        b = banded.alias("b")
        cand = (a.join(b, ["band_id", "band_hash"])
                .where(F.col("a.doc_id") < F.col("b.doc_id"))
                .select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"))
                .distinct())
        noop(cand)

    out["cand_pairs"] = timed(spark, "cand_pairs", cand_only, trials)

    n_cand = [None]

    def count_cand():
        banded = D.minhash_band_hashes(docs, band_bucket_cap=200)
        a = banded.alias("a")
        b = banded.alias("b")
        n_cand[0] = (a.join(b, ["band_id", "band_hash"])
                     .where(F.col("a.doc_id") < F.col("b.doc_id"))
                     .select(F.col("a.doc_id").alias("doc_a"),
                             F.col("b.doc_id").alias("doc_b"))
                     .distinct().count())

    count_cand()
    out["n_cand"] = n_cand[0]
    print("n_cand:", n_cand[0])

    out["lsh_pairs_full"] = timed(
        spark, "lsh_pairs_full",
        lambda: noop(D.minhash_lsh_pairs(docs, jaccard_threshold=0.5)),
        trials)

    pairs_n = [None]

    def pairs_count():
        pairs_n[0] = D.minhash_lsh_pairs(docs, jaccard_threshold=0.5).count()

    pairs_count()
    out["n_pairs"] = pairs_n[0]
    print("n_pairs:", pairs_n[0])

    out["dedup_groups_full"] = timed(
        spark, "dedup_groups_full",
        lambda: noop(D.dedup_groups(
            docs, D.minhash_lsh_pairs(docs, jaccard_threshold=0.5))),
        trials)
    return out


def decomp_lm(spark, trials):
    from pyspark.sql import functions as F

    from hybrid_search_engine_spark import contract_ext
    from hybrid_search_engine_spark.functions.text import (
        tokens_native_keep_order,
    )

    docs = contract_ext._docs(spark, SF_DIR)
    out = {}
    out["lm_full"] = timed(
        spark, "lm_full",
        lambda: noop(contract_ext.QUERIES_EXT["lm_score"](spark, SF_DIR)),
        trials)

    toks = tokens_native_keep_order("text")
    tf = (docs.select("doc_id", F.explode(toks).alias("term"))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("cnt")))
    out["lm_tf_only"] = timed(spark, "lm_tf_only", lambda: noop(tf), trials)
    cf = tf.groupBy("term").agg(F.sum("cnt").alias("cf"))
    out["lm_cf_only"] = timed(spark, "lm_cf_only", lambda: noop(cf), trials)

    # cf computed directly at term grain (skip the (doc,term) pre-agg)
    cf2 = (docs.select(F.explode(toks).alias("term"))
           .groupBy("term").agg(F.count(F.lit(1)).alias("cf")))
    out["lm_cf_direct"] = timed(spark, "lm_cf_direct",
                                lambda: noop(cf2), trials)
    return out


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = _spark()
    res = {"sf_dir": SF_DIR, "cpus": CPUS}
    if what in ("dedup", "all"):
        res["dedup"] = decomp_dedup(spark, trials)
    if what in ("lm", "all"):
        res["lm"] = decomp_lm(spark, trials)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
