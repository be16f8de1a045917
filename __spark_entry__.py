"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship BM25 top-k over /root/testdata/sf0.001 documents.
queries()      — operator inventory (SURVEY.md §2) over the driver tables.
oracle_sql()   — matching DuckDB SQL per query (same column names/types).

Implementations live in hybrid_search_engine_spark.contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact BM25 top-10 for the flagship query over sf0.001."""
    from hybrid_search_engine_spark.contract import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hybrid_search_engine_spark.contract import QUERIES
    from hybrid_search_engine_spark.contract_ext import QUERIES_EXT

    return {**QUERIES, **QUERIES_EXT}


def oracle_sql() -> dict[str, str]:
    from hybrid_search_engine_spark.contract import ORACLES
    from hybrid_search_engine_spark.contract_ext import ORACLES_EXT

    return {**ORACLES, **ORACLES_EXT}
