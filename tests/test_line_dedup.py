"""Corpus-wide line dedup: order preservation, thresholds, edge docs."""

import pytest

from hybrid_search_engine_spark.operators.line_dedup import dedup_lines


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
            for r in dedup_lines(df, **kw).collect()}


def test_removes_cross_doc_boilerplate_preserving_order(spark):
    rows = [
        (1, "unique one\nBOILER\nunique two"),
        (2, "BOILER\nother text"),
        (3, "solo line"),
    ]
    got = _run(spark, rows)
    assert got[1] == ("unique one\nunique two", 3, 1)
    assert got[2] == ("other text", 2, 1)
    assert got[3] == ("solo line", 1, 0)


def test_within_doc_repeats_count_toward_frequency(spark):
    # the same line twice in ONE doc is corpus frequency 2 -> removed
    got = _run(spark, [(1, "dup\nmid\ndup")])
    assert got[1] == ("mid", 3, 2)


def test_max_occurrences_threshold(spark):
    rows = [(1, "twice\na"), (2, "twice\nb"),
            (3, "thrice\nc"), (4, "thrice\nd"), (5, "thrice\ne")]
    got = _run(spark, rows, max_occurrences=2)
    assert got[1][0] == "twice\na" and got[1][2] == 0
    assert got[3][0] == "c" and got[3][2] == 1


def test_fully_boilerplate_doc_comes_back_empty(spark):
    got = _run(spark, [(1, "B"), (2, "B"), (3, "keep")])
    assert got[1] == ("", 1, 1) and got[2] == ("", 1, 1)
    assert got[3] == ("keep", 1, 0)


def test_custom_separator_is_literal_not_regex(spark):
    rows = [(1, "a.b.a"), (2, "a.c")]   # '.' must not act as regex any-char
    got = _run(spark, rows, line_sep=".")
    assert got[1] == ("b", 3, 2)        # 'a' occurs 3x corpus-wide
    assert got[2] == ("c", 2, 1)


def test_bad_threshold_rejected(spark):
    with pytest.raises(ValueError):
        dedup_lines(spark.createDataFrame([(1, "x")],
                                          "doc_id long, text string"),
                    max_occurrences=0)
