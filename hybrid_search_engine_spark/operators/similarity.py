"""Similarity search over embedding columns (array<float>).

- knn_brute: exact cosine top-k of a query vector against the table —
  single scan, column arithmetic only (zip_with/aggregate → whole-stage
  codegen), TakeOrderedAndProject top-k. The correctness baseline.
- knn_batch_pandas: exact top-k for MANY query vectors via one Arrow
  pandas-UDF pass (numpy matmul per batch) — the throughput path; at 100 TB
  this is a broadcast of the query matrix into a mapInPandas over the
  embedding table, no shuffle at all until the final per-query merge.
- ann_lsh: random-hyperplane LSH bucket index + probe — the scale path:
  candidates come from the query's bucket (and optionally multi-probe
  neighbors), exact cosine re-rank on candidates only.

Reference semantics: the engine's semantic side holds the full matrix in
driver RAM and brute-forces (indexer.py:229-243, utils.py:28-54) with an
optional FAISS sidecar (core.py:244-252) — both replaced by distributed
scans/buckets here.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_lit(vec_col, qvec: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(F.zip_with(vec_col, arr, lambda x, y: x.cast("double") * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v.cast("double") * v))


def knn_brute(emb: DataFrame, qvec: list[float], k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """→ (vec_id, cosine) exact top-k, deterministic tie-break on id."""
    qn = float(np.sqrt(np.dot(qvec, qvec))) or 1.0
    cos = _dot_lit(F.col(vec_col), qvec) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        emb.select(F.col(id_col).alias("vec_id"), cos.alias("cosine"))
        .orderBy(F.round(F.col("cosine"), 9).desc(), F.col("vec_id").asc())
        .limit(k)
    )


def knn_batch_pandas(spark: SparkSession, emb: DataFrame,
                     queries: dict[int, list[float]], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id"
                     ) -> DataFrame:
    """→ (query_id, rank, vec_id, cosine): all queries in one Arrow pass.

    Per partition: candidates = top-k of Q · Eᵀ — numpy matmul over the
    Arrow batch; ≤k rows per (partition, query) survive to the global
    window merge. Per-batch truncation uses the SAME total order as the
    global merge (round-half-up(cosine, 9) desc, vec_id asc), so pruning is
    lossless: batch-local top-k under a total order commutes with the
    global top-k."""
    from .. import ensure_udf_serializable

    ensure_udf_serializable()
    qids = sorted(queries)
    qm = np.array([queries[q] for q in qids], dtype=np.float64)
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)

    out_schema = T.StructType([
        T.StructField("query_id", T.IntegerType(), False),
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cosine", T.DoubleType(), False),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            E = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
            sims = qm @ E.T  # (Q, N)
            ids = pdf[id_col].to_numpy(np.int64)
            takes = min(k, ids.size)
            # HALF_UP to 9 decimals, matching Spark's round() (np.round is
            # half-even and can disagree at the k-th boundary)
            r9 = np.sign(sims) * np.floor(np.abs(sims) * 1e9 + 0.5)
            out_q, out_i, out_c = [], [], []
            for r, qid in enumerate(qids):
                sel = np.lexsort((ids, -r9[r]))[:takes]
                out_q.append(np.full(takes, qid, np.int32))
                out_i.append(ids[sel])
                out_c.append(sims[r, sel])
            yield pd.DataFrame({"query_id": np.concatenate(out_q),
                                "vec_id": np.concatenate(out_i),
                                "cosine": np.concatenate(out_c)})

    local = emb.select(id_col, vec_col).mapInPandas(fn, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 9).desc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN
# ---------------------------------------------------------------------------

def hyperplane_bucket(vec_col, n_planes: int = 8, seed: int = 7):
    """Deterministic random-hyperplane sign bucket as a native expression.
    Plane j's i-th component = ±1 from xxhash64(seed, j, i)."""
    d = F.size(vec_col)

    def sign_bit(j):
        return (
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.transform(F.sequence(F.lit(0), d - 1),
                                lambda i: F.when(
                                    F.pmod(F.xxhash64(F.lit(seed), F.lit(j), i),
                                           F.lit(2)) == 0,
                                    F.lit(1.0)).otherwise(F.lit(-1.0))),
                    lambda x, s: x.cast("double") * s,
                ),
                F.lit(0.0).cast("double"), lambda acc, v: acc + v,
            ) > 0
        ).cast("int")

    b = F.lit(0)
    for j in range(n_planes):
        b = b * 2 + sign_bit(j)
    return b


def build_ann_index(emb: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id", n_planes: int = 8,
                    seed: int = 7) -> DataFrame:
    """Bucketed table (bucket int, vec_id, embedding) — write partitioned /
    bucketed by `bucket` for probe-time partition pruning at scale."""
    return emb.select(
        hyperplane_bucket(F.col(vec_col), n_planes, seed).alias("bucket"),
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
    )


def save_ann_index(ann_index: DataFrame, path: str, n_planes: int = 8,
                   seed: int = 7) -> None:
    """S6: persist the bucketed ANN table partitioned by `bucket`, plus a
    sidecar meta file carrying the plane parameters — the analogue of the
    reference's FAISS index sidecar (core.py:244-252, indexer.py:229-243),
    as a partition-pruned table instead of a single-process binary blob.
    A probe then reads ONLY the probed bucket directories."""
    import json
    import os

    ann_index.write.partitionBy("bucket").mode("overwrite").parquet(path)
    with open(os.path.join(path, "_ann_meta.json"), "w") as f:
        json.dump({"n_planes": int(n_planes), "seed": int(seed)}, f)


def load_ann_index(spark: SparkSession, path: str):
    """→ (ann_index DataFrame, n_planes, seed). Round-trip of
    save_ann_index; the returned frame is partition-prunable on `bucket`."""
    import json
    import os

    with open(os.path.join(path, "_ann_meta.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(path), meta["n_planes"], meta["seed"]


def ann_search(spark: SparkSession, ann_index: DataFrame, qvec: list[float],
               k: int = 10, n_planes: int = 8, seed: int = 7,
               multiprobe_hamming: int = 1) -> DataFrame:
    """Probe the bucket of qvec (± buckets within hamming 1 — multiprobe
    recovers boundary losses), exact cosine re-rank on candidates only."""
    one = spark.createDataFrame([(qvec,)], "v array<double>")
    qb = one.select(hyperplane_bucket(F.col("v"), n_planes, seed).alias("b")
                    ).first()["b"]
    probes = {qb}
    if multiprobe_hamming >= 1:
        probes |= {qb ^ (1 << j) for j in range(n_planes)}
    cand = ann_index.where(F.col("bucket").isin(sorted(probes)))
    return knn_brute(cand, qvec, k=k, vec_col="embedding", id_col="vec_id")
