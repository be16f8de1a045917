"""Sources (directory scan S1/S2, export/import S7), fuzzy F8, scripts F15,
dedup policy P7, feedback surfaces A6-A8."""

import json

import pytest
from pyspark.sql import functions as F


def test_discover_documents(spark, tmp_path):
    from hybrid_search_engine_spark.sources.files import discover_documents

    d = tmp_path / "data"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_text("Hello   world\nfrom a file.")
    (d / "sub" / "b.md").write_text("# Title\nbody text")
    (d / "c.json").write_text(json.dumps({"k1": "json value", "n": 5, "k2": "two"}))
    (d / "d.bin").write_bytes(b"\x00\x01")         # wrong extension → skipped
    (d / "empty.txt").write_text("   \n  ")         # whitespace-only → skipped

    rows = {r["path"].split("/")[-1]: r
            for r in discover_documents(spark, str(d)).collect()}
    assert set(rows) == {"a.txt", "b.md", "c.json"}
    assert rows["a.txt"]["content"] == "Hello world from a file."  # preprocessed
    assert rows["c.json"]["content"] == "json value two"  # dict string values only
    assert rows["a.txt"]["word_count"] == 5


def test_export_import_roundtrip(spark, tmp_path):
    from hybrid_search_engine_spark.sources.files import (
        export_index_json,
        import_index_json,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string")
    out = str(tmp_path / "export")
    export_index_json(docs, out)
    back = import_index_json(spark, out, "doc_id long, text string")
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (1, "alpha"), (2, "beta")]


def test_partial_ratio_and_lexical_scores(spark):
    from hybrid_search_engine_spark.operators.fuzzy import (
        lexical_fuzzy_scores,
        partial_ratio,
    )

    assert partial_ratio("abc", "abc") == 100.0
    assert partial_ratio("abc", "zzabczz") == 100.0  # window match
    assert partial_ratio("", "x") == 0.0
    assert partial_ratio("", "") == 100.0
    # rapidfuzz definition: best InDel ratio over windows. LCS("machine",
    # "mach ne" window) = 6 → 100·2·6/(7+7) = 85.714286 exactly.
    assert partial_ratio("machine", "mach1ne learning") == 85.714286
    # edge-overlap alignment: "lo" hanging off the start beats any
    # full-length window (ratio("hello","lo") = 2·2/7 = 57.14 vs ≤ 40)
    assert partial_ratio("hello", "lo world") == round(400 / 7, 6)

    df = spark.createDataFrame(
        [(1, "machine learning models"), (2, "totally unrelated xyz")],
        "doc_id int, text string")
    got = {r["doc_id"]: r["lexical_score"]
           for r in lexical_fuzzy_scores(df, "machine learning").collect()}
    assert got[1] > got[2]
    assert got[1] > 0.9  # exact token overlap + full fuzzy window


def test_partial_ratio_matches_dp_oracle():
    """Bit-parallel LCS scan == quadratic-DP brute force on random pairs."""
    import random

    from hybrid_search_engine_spark.operators.fuzzy import partial_ratio

    def lcs_dp(a, b):
        dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                            else max(dp[i - 1][j], dp[i][j - 1]))
        return dp[len(a)][len(b)]

    def pr_brute(a, b):
        if not a and not b:
            return 100.0
        if not a or not b:
            return 0.0
        short, long_ = (a, b) if len(a) <= len(b) else (b, a)
        m, n = len(short), len(long_)
        best = 0.0
        for i in range(-(m - 1), n):
            w = long_[max(0, i):min(n, i + m)]
            best = max(best, 200.0 * lcs_dp(short, w) / (m + len(w)))
        return round(best, 6)

    rng = random.Random(42)
    alpha = "abcx "
    for _ in range(500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 8)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 20)))
        assert partial_ratio(a, b) == pr_brute(a, b), (a, b)


def test_detect_script(spark):
    from hybrid_search_engine_spark.functions.analysis import detect_script

    df = spark.createDataFrame([
        (1, "hello world"),
        (2, "привет мир как дела"),
        (3, "你好世界欢迎"),
        (4, "مرحبا بالعالم"),
        (5, ""),
    ], "id int, text string")
    got = {r["id"]: r["s"] for r in
           df.select("id", detect_script("text").alias("s")).collect()}
    assert got == {1: "latin", 2: "cyrillic", 3: "cjk", 4: "arabic",
                   5: "unknown"}


def test_dedup_actions(spark):
    from hybrid_search_engine_spark.operators.dedup import apply_dedup_action

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(5)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 3), (1, 4)],
                                  "doc_a long, doc_b long")
    kept = sorted(r.doc_id for r in
                  apply_dedup_action(docs, pairs, "skip").collect())
    assert kept == [0, 1, 2]
    flagged = {r.doc_id: (r.is_duplicate, r.canonical_doc_id)
               for r in apply_dedup_action(docs, pairs, "flag").collect()}
    assert flagged[3] == (True, 0)
    assert flagged[4] == (True, 1)
    assert flagged[2] == (False, 2)


def test_learned_weights_and_feedback_surfaces(spark):
    from hybrid_search_engine_spark.operators.fusion import (
        learned_weights,
        query_stats,
        test_set_from_feedback,
    )

    qh = spark.createDataFrame(
        [(i, f"q{i % 3}", 0.6, 0.4) for i in range(12)],
        "query_id int, query_text string, semantic_weight double, lexical_weight double")
    fb = spark.createDataFrame(
        [(i, i, 100 + i, 5 if i % 2 == 0 else 1, i % 2 == 1) for i in range(12)],
        "feedback_id int, query_id int, doc_id int, relevance_score int, clicked boolean")

    lw = learned_weights(qh, fb, min_samples=10).collect()
    assert len(lw) == 1 and abs(lw[0]["w_sem"] - 0.6) < 1e-9  # 12 ≥ 10 gate

    strict = learned_weights(qh, fb, min_samples=20).collect()
    assert strict == []  # below gate → no learned weights (core.py:73)

    ts = test_set_from_feedback(qh, fb).collect()
    assert {r["query_text"] for r in ts} == {"q0", "q1", "q2"}
    assert all(len(r["relevant_doc_ids"]) >= 1 for r in ts)

    qs = query_stats(qh, fb).first()
    assert qs["total_queries"] == 12 and qs["unique_queries"] == 3
    assert qs["total_clicks"] == 6


def test_load_pages_iceberg_guarded(spark, tmp_path):
    """Iceberg surface: parquet path works; the iceberg path either loads
    (runtime jars present) or raises the documented RuntimeError telling
    the operator which --packages to submit with — never an opaque
    ClassNotFound mid-plan."""
    import pytest

    from hybrid_search_engine_spark.sources.registry import (
        _has_iceberg,
        load_pages,
    )

    p = str(tmp_path / "pages.parquet")
    spark.createDataFrame([("u1", "t")], "url string, text string") \
        .write.parquet(p)
    assert load_pages(spark, p).count() == 1
    with pytest.raises(ValueError):
        load_pages(spark, p, format="csv")
    if not _has_iceberg(spark):  # this sandbox has no iceberg runtime
        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            load_pages(spark, "cat.db.pages", format="iceberg")
