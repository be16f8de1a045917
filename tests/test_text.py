"""Tokenizer / preprocess / extraction parity tests (SURVEY.md §5.2.2)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hybrid_search_engine_spark.reference_semantics import (
    STOPWORDS,
    doc_metadata,
    extract_text,
    preprocess_text,
    strip_html,
    tokenize,
)


# ---- pure-python unit semantics (the contract itself) ----------------------

def test_tokenize_basic():
    assert tokenize("Hello, World_42!") == ["hello", "world_42"]
    assert tokenize("") == []
    assert tokenize(None) == []


def test_tokenize_stopwords():
    assert tokenize("the quick brown fox", remove_stopwords=True) == [
        "quick", "brown", "fox"]
    # exact reference set (extractor.py:6-12) — 48 words (SURVEY's "51" was a miscount)
    assert STOPWORDS == {
        'a', 'an', 'the', 'and', 'or', 'but', 'in', 'on', 'at', 'to', 'for',
        'of', 'with', 'by', 'from', 'is', 'are', 'was', 'were', 'be', 'been',
        'being', 'have', 'has', 'had', 'do', 'does', 'did', 'will', 'would',
        'could', 'should', 'may', 'might', 'must', 'shall', 'can', 'this',
        'that', 'these', 'those', 'i', 'you', 'he', 'she', 'it', 'we', 'they'}


def test_preprocess():
    assert preprocess_text("  a\t\nb   c ") == "a b c"
    assert preprocess_text(" x y ") == "x y"  # unicode \s (Python re)
    assert preprocess_text(None) == ""
    assert preprocess_text("the quick fox", remove_stopwords=True) == "quick fox"


def test_strip_html():
    h = "<html><head><title>T</title><script>var x=1;</script></head><body><p>a b</p><p>c&amp;d</p></body></html>"
    assert tokenize(preprocess_text(strip_html(h))) == ["t", "a", "b", "c", "d"]
    assert "x" not in tokenize(strip_html(h))  # script body dropped
    assert strip_html(None) == ""
    assert strip_html(b"<p>bytes</p>") == " bytes "


def test_extract_text_fallback():
    assert extract_text(None, "  raw   text ") == "raw text"
    assert extract_text(b"<p>h</p>", "ignored") == "h"


# ---- property tests: Python `re` oracle vs our functions -------------------

@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_tokenize_matches_re_findall(s):
    import re
    assert tokenize(s) == re.findall(r"[A-Za-z0-9_]+", s.lower())


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_preprocess_matches_re(s):
    import re
    assert preprocess_text(s) == (re.sub(r"\s+", " ", s.strip()) if s else "")


# ---- Spark-side parity ------------------------------------------------------

ASCII_SAMPLES = [
    "The quick brown fox, jumps.\nOver\tthe lazy_dog 42!",
    "a b  c   d",
    "", "UPPER lower MiXeD 00_99", "semi;colon, comma. dot! bang",
    "x" * 500,
]


def test_native_matches_parity_on_ascii(spark):
    """Native JVM tokenizer == parity UDF == pure python, on ASCII corpus."""
    from hybrid_search_engine_spark.functions.text import (
        tokenize_nostop_udf,
        tokens_native_keep_order,
    )

    df = spark.createDataFrame([(i, s) for i, s in enumerate(ASCII_SAMPLES)],
                               "id int, text string")
    got = (
        df.select(
            "id",
            tokens_native_keep_order("text", remove_stopwords=True).alias("nat"),
            tokenize_nostop_udf(F.col("text")).alias("udf"),
        )
        .orderBy("id")
        .collect()
    )
    for row, s in zip(got, ASCII_SAMPLES):
        expect = tokenize(s, remove_stopwords=True)
        assert row.nat == expect, f"native mismatch on {s!r}"
        assert row.udf == expect, f"udf mismatch on {s!r}"


def test_extraction_byte_identity(spark, pages_1k, extracted_1k):
    """input_hint invariant: text == preprocess_text(strip_html(html)),
    byte-identical per url, engine (pandas UDF) vs pure-python oracle."""
    raw = {r["url"]: (r["html"], r["text"]) for r in pages_1k.collect()}
    got = {r["url"]: r["text"] for r in extracted_1k.collect()}
    assert set(raw) == set(got)
    for url, (html, text) in raw.items():
        assert got[url] == extract_text(html, text), url
    # NULL-html rows exist in the fixture and must pass through preprocess
    assert any(h is None for h, _ in raw.values())


def test_doc_metadata_native(spark):
    from hybrid_search_engine_spark.functions.text import doc_metadata_cols

    df = spark.createDataFrame([(s,) for s in ASCII_SAMPLES], "text string")
    rows = df.select("text", *doc_metadata_cols("text")).collect()
    for r in rows:
        exp = doc_metadata(r["text"])
        assert r["char_count"] == exp["char_count"]
        assert r["word_count"] == exp["word_count"]
        assert r["unique_words"] == exp["unique_words"]
        assert abs(r["avg_word_length"] - exp["avg_word_length"]) < 1e-9
