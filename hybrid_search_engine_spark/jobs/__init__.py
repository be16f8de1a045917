"""spark-submit entry points (north rule: "run via spark-submit --py-files").

Packaging (no setup.py needed — the package is pure Python):

    cd <repo>
    zip -qr /tmp/hse_spark.zip hybrid_search_engine_spark
    spark-submit --py-files /tmp/hse_spark.zip \\
        hybrid_search_engine_spark/jobs/build_index_job.py \\
        --input s3://bucket/pages/ --index-dir s3://bucket/index/ \\
        --n-shards 4096
    spark-submit --py-files /tmp/hse_spark.zip \\
        hybrid_search_engine_spark/jobs/query_job.py \\
        --index-dir s3://bucket/index/ --queries-file queries.txt --k 10

Every job uses ``SparkSession.builder.getOrCreate()`` so the session the
launcher configured (master, executors, Iceberg catalog, shuffle service)
is respected; only SQL-level confs the engine needs (Arrow, AQE) are set,
and only if unset. ``--local-cores N`` exists for sandbox runs without a
cluster manager and routes through :func:`session.get_spark` instead.

Reference parity note: these replace the reference's CLI/REST launchers
(``cli.py``, ``api.py``) — the engine itself is the set of DataFrame plans;
a "deployment" is a spark-submit of one of these scripts.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# SQL confs the engine's plans rely on; applied only when the launcher did
# not set them explicitly (spark-submit --conf wins).
_ENGINE_SQL_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
}


def job_session(app: str, local_cores: int | None = None) -> SparkSession:
    """Session for a submitted job.

    Under spark-submit the builder returns the launcher's session (master,
    deploy mode, catalogs all come from the submit command); standalone
    (``--local-cores``) it builds the tuned local session used by tests."""
    if local_cores:
        from ..session import get_spark

        return get_spark(app=app, cores=local_cores)
    spark = SparkSession.builder.appName(app).getOrCreate()
    for k, v in _ENGINE_SQL_CONFS.items():
        try:
            # RuntimeConfig.get raises for unset keys without a default
            spark.conf.get(k)
        except Exception:
            spark.conf.set(k, v)
    return spark


def read_pages(spark: SparkSession, source: str, fmt: str = "parquet",
               snapshot_id: int | None = None):
    """Load the input pages table (url, warc_ts, html, text, lang).

    ``fmt``: ``parquet`` (path), ``table`` (catalog name — Iceberg tables
    resolve here when the submit command configures the catalog),
    ``iceberg`` (classpath-checked, supports ``snapshot_id`` time-travel
    for resumable-build lineage), or any DataSource short name (``orc``,
    ``json``)."""
    if fmt == "table":
        return spark.table(source)
    if fmt == "iceberg":
        from ..sources.registry import load_pages

        return load_pages(spark, source, format="iceberg",
                          snapshot_id=snapshot_id)
    return spark.read.format(fmt).load(source)
