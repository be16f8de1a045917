"""Unicode-whitespace parity: the reference is pure Python, so its
``.strip()`` / ``.split()`` / ``re \\s`` semantics cover the full unicode
whitespace set (29 code points — NBSP, NEL, LS/PS, ideographic space, thin
and hair spaces, ogham space mark), while Java/RE2 ``\\s`` is ASCII-only.
Every JVM-native expression mirroring those Python forms uses the explicit
``PY_WS`` class from functions/text.py; these tests pin that equivalence on
text where the two sets actually differ."""

import re

from hybrid_search_engine_spark.reference_semantics import preprocess_text

UNICODE_WS_SAMPLES = [
    " \u00a0lead NBSP\u00a0and inner\u3000",
    "line one\u2028line two\u2029para",
    "\u3000ideographic\u3000run\u3000\u3000end\u3000",
    "thin\u2009hair\u200aNEL\u0085narrow\u202fogham\u1680done",
    "mixed \t\u2000\u2001\u2002\u2003 gaps",
    "ends with punct.\u00a0 Next sentence!\u2028Third?",
    "",
    "no_special_ws at all",
]


def test_preprocess_native_unicode_ws(spark):
    """preprocess_native == re.sub(r'\\s+', ' ', text.strip()) under Python
    semantics on unicode whitespace (the point of the explicit PY_WS class)."""
    from hybrid_search_engine_spark.functions.text import preprocess_native

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(UNICODE_WS_SAMPLES)], "id int, text string")
    got = (df.select("id", preprocess_native("text").alias("norm"))
           .orderBy("id").collect())
    for row, s in zip(got, UNICODE_WS_SAMPLES):
        assert row.norm == preprocess_text(s), f"mismatch on {s!r}"


def test_ws_word_count_unicode(spark):
    """ws_word_count == len(text.split()) under unicode whitespace."""
    from hybrid_search_engine_spark.functions.analysis import token_count_columns

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(UNICODE_WS_SAMPLES)], "id int, text string")
    got = df.select("id", *token_count_columns("text")).orderBy("id").collect()
    for row, s in zip(got, UNICODE_WS_SAMPLES):
        assert row.ws_word_count == len(s.split()), f"mismatch on {s!r}"


def test_norm_content_unicode_strip(spark):
    """dedup norm_content == text.lower().strip() with the unicode set."""
    from hybrid_search_engine_spark.operators.dedup import norm_content

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(UNICODE_WS_SAMPLES)], "id int, text string")
    got = df.select("id", norm_content("text").alias("n")).orderBy("id").collect()
    for row, s in zip(got, UNICODE_WS_SAMPLES):
        assert row.n == s.lower().strip(), f"mismatch on {s!r}"


def test_chunkers_unicode_ws(spark):
    """Native sentence/paragraph splits == the reference's Python re forms
    (chunker.py:40,89) on unicode whitespace."""
    from hybrid_search_engine_spark.operators.textproc import (
        split_paragraphs,
        split_sentences,
    )

    samples = UNICODE_WS_SAMPLES + [
        "One. Two!\u00a0Three?\u3000 Four.",
        "para a\n\u00a0\npara b\n \u3000\t\npara c",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)],
                               "id int, text string")
    got = df.select(
        "id",
        split_sentences("text").alias("sents"),
        split_paragraphs("text").alias("paras"),
    ).orderBy("id").collect()
    for row, s in zip(got, samples):
        want_s = [x.strip() for x in re.split(r"(?<=[.!?])\s+", s) if x.strip()]
        want_p = [x.strip() for x in re.split(r"\n\s*\n", s) if x.strip()]
        assert row.sents == want_s, f"sentence mismatch on {s!r}"
        assert row.paras == want_p, f"paragraph mismatch on {s!r}"


def test_planted_ws_docs_dedup_group(spark):
    """The planted contract docs 900000003/900000004 normalize identically
    (unicode strip), so q_dedup_exact must group them — under an ASCII trim
    set they hash apart."""
    from hybrid_search_engine_spark.contract import PLANTED_WS_DOCS, q_dedup_exact

    rows = {r.doc_id: r for r in
            q_dedup_exact(spark, "/root/testdata/sf0.001").collect()
            if r.doc_id >= 900000000}
    assert rows[900000003].is_duplicate is False
    assert rows[900000004].is_duplicate is True
    assert rows[900000004].canonical_doc_id == 900000003
    assert rows[900000001].is_duplicate is False
    assert rows[900000002].is_duplicate is False
    t3 = dict(PLANTED_WS_DOCS)[900000003]
    t4 = dict(PLANTED_WS_DOCS)[900000004]
    assert t3 != t4 and t3.lower().strip() == t4.lower().strip()
