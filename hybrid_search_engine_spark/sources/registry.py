"""Table loaders for the driver testdata and the engine's pages corpus.

The north-rule input is an *Iceberg* table of web pages. Every consumer in
this repo goes through :func:`load_pages` / :func:`load_table`, so the
storage format is a one-line swap here: ``format="iceberg"`` reads a
catalog table (snapshot-pinnable — the build manifest's
``source_fingerprint`` becomes the snapshot id, see SCALE.md §5), while
the sandbox default stays parquet. The Iceberg runtime jars are not
installed in this environment, so the iceberg path raises a clear error
here rather than an opaque ClassNotFound mid-plan; the test pins that
behavior.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings".split()
)


def _has_iceberg(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def load_pages(spark: SparkSession, source: str,
               format: str = "parquet",
               snapshot_id: int | None = None) -> DataFrame:
    """The engine's input table — pages(url, warc_ts, html, text, lang).

    ``format="parquet"``: ``source`` is a path (sandbox / testdata).
    ``format="iceberg"``: ``source`` is a catalog table name
    (``catalog.db.pages``); ``snapshot_id`` pins a snapshot for resumable
    builds (time-travel read — lineage recorded in the build manifest).
    """
    if format == "iceberg":
        if not _has_iceberg(spark):
            raise RuntimeError(
                "iceberg-spark-runtime is not on the classpath in this "
                "environment; submit with --packages org.apache.iceberg:"
                "iceberg-spark-runtime-4.0_2.13:<version> (or use "
                "format='parquet' for path-based reads)")
        r = spark.read.format("iceberg")
        if snapshot_id is not None:
            r = r.option("snapshot-id", str(snapshot_id))
        return r.load(source)
    if format != "parquet":
        raise ValueError(f"unsupported pages format: {format!r}")
    return spark.read.parquet(source)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
