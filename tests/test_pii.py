"""PII redaction: Spark native regex pipeline ≡ pure-Python `re` mirror."""

import random

from pyspark.sql import functions as F

from hybrid_search_engine_spark.contract_ext import (
    PLANTED_PII_DOCS,
    q_pii_redact,
)
from hybrid_search_engine_spark.localdf import local_df
from hybrid_search_engine_spark.operators.pii import (
    PII_PATTERNS,
    py_redact_pii,
    redact_pii,
)


def _check_equals_python(spark, rows):
    df = local_df(spark, rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    for doc_id, text in rows:
        counts, red = py_redact_pii(text)
        g = got[doc_id]
        assert g["redacted"] == red, (doc_id, g["redacted"], red)
        for name, _, _ in PII_PATTERNS:
            assert g[f"n_{name}"] == counts[name], (doc_id, name, g, counts)


def test_planted_docs_match_python_and_hand_values(spark):
    _check_equals_python(spark, PLANTED_PII_DOCS)
    got = {r["doc_id"]: r.asDict() for r in
           redact_pii(local_df(spark, PLANTED_PII_DOCS,
                               "doc_id long, text string")).collect()}
    assert got[920000001]["n_email"] == 2
    assert got[920000001]["redacted"] == "Contact <EMAIL> or <EMAIL> now"
    # two IPs, one phone; the IPs must not feed the phone detector
    assert (got[920000002]["n_ipv4"], got[920000002]["n_phone"]) == (2, 1)
    assert "<PHONE> today" in got[920000002]["redacted"]
    # SSN consumed before the phone pass — counted once, as SSN
    assert (got[920000003]["n_ssn"], got[920000003]["n_phone"]) == (1, 1)
    # dotted triplet 1.2.3 is not an IPv4; bare 42 is not a phone
    d4 = got[920000004]
    assert (d4["n_email"], d4["n_ssn"], d4["n_ipv4"], d4["n_phone"]) == (
        0, 0, 0, 0)
    assert d4["redacted"] == PLANTED_PII_DOCS[3][1]


def test_property_random_pii_soup(spark):
    rng = random.Random(7)
    frags = [
        "hello world", "a@b.io", "x@y", "1.2.3.4", "10.20.30.400",
        "123-45-6789", "12-345-6789", "+44 20 7946 0958", "555 0100",
        "ver 1.2.3", "...", "@@", "9" * 12, "- - -", "mail: foo.bar@baz.co,",
    ]
    rows = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(0, 8))))
        for i in range(80)
    ]
    rows.append((80, None))
    rows.append((81, ""))
    _check_equals_python(spark, rows)


def test_contract_query_corpus_rows_are_noop(spark, sf_dir):
    out = q_pii_redact(spark, sf_dir)
    assert out.columns == [
        "doc_id", "n_email", "n_ssn", "n_ipv4", "n_phone", "redacted"]
    corpus = out.where(F.col("doc_id") < 900000000)
    assert corpus.where(
        (F.col("n_email") != 0) | (F.col("n_ssn") != 0)
        | (F.col("n_ipv4") != 0) | (F.col("n_phone") != 0)).count() == 0
    assert out.where(F.col("doc_id") >= 920000000).count() == len(
        PLANTED_PII_DOCS)
