"""Local mimic of the driver's queries()/oracle_sql() correctness gate.

Runs every contract query through Spark at sf0.001 (fast tier; the driver
uses sf0.01 — run with SPARK_GRAFT_SF_DIR_TEST=/root/testdata/sf0.01 for the
full pre-flight) and the matching oracle SQL through DuckDB on the same
parquet, then compares row count, column names, and order-insensitive values.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings".split()
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # contract values are pre-rounded; canonicalize away 1-ulp noise
        return round(val, 9)
    if isinstance(val, bool):
        return bool(val)
    if hasattr(val, "isoformat"):
        return val.isoformat()
    return val


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_contract_query(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)

    sdf = qfn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)

    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return

    ddf = duck.execute(sql).fetchall()
    dcols = [d[0] for d in duck.description]

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(ddf), f"{name}: row count {len(srows)} vs {len(ddf)}"

    sset, _ = _rows_to_multiset(scols, srows)
    dset, _ = _rows_to_multiset(dcols, ddf)
    if sset != dset:
        diff_s = [r for r in sset if r not in dset][:5]
        diff_d = [r for r in dset if r not in sset][:5]
        raise AssertionError(
            f"{name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score_r"]
