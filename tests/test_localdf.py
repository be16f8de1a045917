"""local_df: driver-literal tables must be JVM LocalRelations (no
Python-RDD leaf) and value-identical to createDataFrame."""

import math

import pytest

from hybrid_search_engine_spark.localdf import local_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_local_df_has_no_python_rdd_leaf(spark):
    df = local_df(spark, [(1, "a"), (2, "b")], "id long, s string")
    assert "ExistingRDD" not in _plan(df)
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, "b")]


def test_local_df_matches_create_dataframe_values(spark):
    rows = [
        (1, "plain", 1.5),
        (2, "uni  　code 'quote' back\\slash", -0.1),
        (3, None, None),
        (4, "", 1e300),
        (5, "exp", 1.2345678901234567),
    ]
    schema = "id long, s string, x double"
    a = sorted(map(tuple, local_df(spark, rows, schema).collect()))
    b = sorted(map(tuple, spark.createDataFrame(rows, schema).collect()))
    assert a == b


def test_local_df_float_array_narrowing_matches(spark):
    rows = [(1, [0.1, 2.0, -3.75]), (2, []), (3, None)]
    schema = "id long, v array<float>"
    a = local_df(spark, rows, schema).collect()
    b = spark.createDataFrame(rows, schema).collect()
    assert sorted(str(r) for r in a) == sorted(str(r) for r in b)


def test_local_df_empty(spark):
    df = local_df(spark, [], "doc_id long, score double")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "score"]
    assert df.schema.fields[0].dataType.simpleString() == "bigint"
    assert "ExistingRDD" not in _plan(df)


def test_local_df_bool_and_null(spark):
    rows = [(True, None), (False, 7)]
    got = sorted(map(tuple, local_df(spark, rows, "b boolean, n int").collect()))
    assert got == [(False, 7), (True, None)]


def test_local_df_nan_falls_back_correctly(spark):
    got = local_df(spark, [(float("nan"),)], "x double").collect()[0][0]
    assert math.isnan(got)


def test_local_df_fallback_large(spark):
    n = 10_001
    df = local_df(spark, [(i,) for i in range(n)], "i long")
    assert df.count() == n
