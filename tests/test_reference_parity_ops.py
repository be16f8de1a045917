"""Operator-level parity, evidenced DIRECTLY against the reference code.

tests/refload.py imports the reference's own modules (chunker.py,
deduplication.py, evaluation.py — pure stdlib/numpy, loaded without the
heavy package __init__) and these tests run them as the ground truth for
the corresponding Spark operators.  Unlike the DuckDB oracle rows, which
re-express the semantics in SQL, this compares against the reference
implementation itself, so a shared misreading of the reference can't slip
through.

Covered here:
- content normalization before exact-hash / shingling
  (deduplication.py:104-125  ↔  operators/dedup.py norm_content,
  char_shingles, exact_duplicates)
- SentenceChunker windowed mode, ParagraphChunker sequential merge,
  SlidingWindowChunker char windows
  (chunker.py:28-199  ↔  operators/textproc.py chunk_documents modes)
- ranking metrics incl. the precision-by-retrieved rule
  (evaluation.py:79-130  ↔  operators/fusion.py evaluate_rankings)
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tests.refload import load

# -- shared text corpus: whitespace edges, case, unicode, sentence and --
# -- paragraph structure, short and long docs ---------------------------
TEXTS = [
    "",
    "   ",
    "\t Hello World \n",
    "ab",
    "The cat sat. The dog ran! Did the bird fly? Yes it did. End here.",
    "MIXED Case With\tTabs\tand  double  spaces",
    "Ünïcodé tëxt with àccents. Ĝojo kaj paco! Ĉu vi komprenas?",
    "one sentence only without terminal punctuation",
    "A. B. C. D. E. F. G. H.",
    ("First paragraph here with some words.\n\n"
     "Second paragraph follows.\n \n"
     "Third one after a blank line with a space in it.\n\n\n"
     "Fourth after two blanks."),
    "word " * 400,                      # long, no sentence boundaries
    ("Sentence number %d is right here. " * 40) % tuple(range(40)),
]


# ---------------------------------------------------------------------------
# deduplication.py normalization
# ---------------------------------------------------------------------------

def test_content_hash_matches_reference(spark):
    """sha2(norm_content(text)) == reference compute_content_hash
    (deduplication.py:111-125) for every text, byte for byte."""
    dd = load("deduplication")
    from hybrid_search_engine_spark.operators.dedup import norm_content

    # compute_content_hash touches no instance state -> unbound call
    expected = [dd.DeduplicationEngine.compute_content_hash(None, t)
                for t in TEXTS]
    df = spark.createDataFrame(list(enumerate(TEXTS)), "i long, text string")
    got = {r["i"]: r["h"] for r in df.select(
        "i", F.sha2(norm_content(F.col("text")), 256).alias("h")).collect()}
    for i, exp in enumerate(expected):
        assert got[i] == exp, f"hash mismatch on TEXTS[{i}]"
        # sanity: the reference rule really is lower().strip()
        assert exp == hashlib.sha256(
            TEXTS[i].lower().strip().encode()).hexdigest()


def test_char_shingles_match_reference(spark):
    """char_shingles == reference _get_shingles (deduplication.py:104-109)
    for non-empty normalized text; for empty text the reference returns []
    and we keep [''] (documented: every doc retains a signature row)."""
    dd = load("deduplication")
    from hybrid_search_engine_spark.operators.dedup import char_shingles

    df = spark.createDataFrame(list(enumerate(TEXTS)), "i long, text string")
    got = {r["i"]: r["s"] for r in df.select(
        "i", char_shingles(F.col("text"), 3).alias("s")).collect()}
    for i, t in enumerate(TEXTS):
        ref = dd.DeduplicationEngine._get_shingles(None, t, 3)
        if t.strip():
            assert got[i] == ref, f"shingle mismatch on TEXTS[{i}]"
        else:
            assert ref == [] and got[i] == [""]


def test_exact_duplicates_group_on_normalized_content(spark):
    """Docs equal after lower().strip() land in one canonical group."""
    from hybrid_search_engine_spark.operators.dedup import exact_duplicates

    rows = [(1, "Hello World"), (2, "  hello world \n"), (3, "HELLO WORLD"),
            (4, "different"), (5, None), (6, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["canonical_doc_id"], r["is_duplicate"])
           for r in exact_duplicates(df).collect()}
    assert out[1] == (1, False)
    assert out[2] == (1, True) and out[3] == (1, True)
    assert out[4] == (4, False)
    # None and whitespace-only both normalize to "" -> same group
    assert out[5] == (5, False) and out[6] == (5, True)


# ---------------------------------------------------------------------------
# chunker.py
# ---------------------------------------------------------------------------

def _spark_chunks(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    from hybrid_search_engine_spark.operators.textproc import chunk_documents

    rows = chunk_documents(df, **kw).orderBy("chunk_id").collect()
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    return [r["chunk_text"] for r in rows]


@pytest.mark.parametrize("max_s,ov", [(1, 0), (2, 0), (3, 1), (5, 1)])
def test_sentence_chunker_parity(spark, max_s, ov):
    ch = load("chunker")
    for ti, t in enumerate(TEXTS):
        ref = [c.content for c in ch.SentenceChunker(max_s, ov).chunk(t)]
        got = _spark_chunks(spark, t, mode="sentence",
                            max_sentences=max_s, overlap_sentences=ov)
        assert got == ref, f"sentence({max_s},{ov}) mismatch on TEXTS[{ti}]"


PARA_TEXTS = TEXTS + [
    # over-long paragraph (>1000 chars) -> flushed pack + sentence sub-split
    ("Intro paragraph.\n\n" +
     ("This sentence pads the long paragraph out. " * 30) +
     "\n\nTail after the monster."),
    # trailing pack under min_length=50 -> appended to previous chunk
    "A decent first paragraph that is clearly over fifty characters long.\n\ntiny",
    # only one tiny paragraph -> kept despite min_length
    "tiny",
    # packs that overflow max_length and flush
    "\n\n".join("Paragraph %02d body text repeated a bit. " % i * 5
                for i in range(12)),
]


def test_paragraph_chunker_parity():
    """merge_paragraph_chunks mirrors ParagraphChunker (chunker.py:87-163)
    step for step — pure-python comparison, no Spark needed."""
    ch = load("chunker")
    from hybrid_search_engine_spark.operators.textproc import (
        merge_paragraph_chunks)

    for ti, t in enumerate(PARA_TEXTS):
        ref = [c.content for c in ch.ParagraphChunker().chunk(t)]
        assert merge_paragraph_chunks(t) == ref, f"PARA_TEXTS[{ti}]"
        # non-default bounds
        ref2 = [c.content for c in ch.ParagraphChunker(20, 200).chunk(t)]
        assert merge_paragraph_chunks(t, 20, 200) == ref2, f"PARA_TEXTS[{ti}]"


def test_paragraph_merged_spark_mode(spark):
    """The Arrow-UDF Spark surface returns exactly the pure function."""
    from hybrid_search_engine_spark.operators.textproc import (
        merge_paragraph_chunks)

    for t in PARA_TEXTS[-4:]:
        got = _spark_chunks(spark, t, mode="paragraph_merged")
        assert got == merge_paragraph_chunks(t)


@pytest.mark.parametrize("win,ov", [(512, 128), (10, 3), (5, 0)])
def test_sliding_window_parity(spark, win, ov):
    ch = load("chunker")
    sw_texts = TEXTS + ["x" * 9 + " " * 30 + "y",   # whitespace-only window
                        "abcdefghij",               # exactly one window
                        "abcdefghijk"]              # one char past
    for ti, t in enumerate(sw_texts):
        ref = [c.content for c in ch.SlidingWindowChunker(win, ov).chunk(t)]
        got = _spark_chunks(spark, t, mode="chars",
                            window_chars=win, overlap_chars=ov)
        assert got == ref, f"chars({win},{ov}) mismatch on text[{ti}]"


# ---------------------------------------------------------------------------
# evaluation.py metrics
# ---------------------------------------------------------------------------

def test_evaluation_metrics_parity(spark):
    """evaluate_rankings == the reference metric functions
    (evaluation.py:79-130) per query, including a query that retrieves
    fewer than k rows (precision divides by retrieved count, not k)."""
    ev = load("evaluation")
    # metric methods don't touch constructor state; skip __init__
    E = object.__new__(ev.SearchEvaluator)
    k = 5
    cases = {
        # query_id -> (retrieved ranking, relevant set)
        0: ([10, 11, 12, 13, 14], [11, 13, 99]),
        1: ([20, 21], [21]),            # sparse retrieval: only 2 rows
        2: ([30, 31, 32, 33, 34], []),  # nothing relevant
        3: ([40, 41, 42, 43, 44], [40, 41, 42, 43, 44, 45, 46]),  # |rel|>k
        4: ([50, 51, 52], [99]),        # no hits at all
    }
    results = spark.createDataFrame(
        [(q, i + 1, d) for q, (ret, _) in cases.items()
         for i, d in enumerate(ret)],
        "query_id long, rank long, doc_id long")
    truth = spark.createDataFrame(
        [(q, d) for q, (_, rel) in cases.items() for d in rel],
        "query_id long, doc_id long")

    from hybrid_search_engine_spark.operators.fusion import evaluate_rankings

    got = {r["query_id"]: r for r in evaluate_rankings(
        results, truth, k=k).collect()}
    for q, (ret, rel) in cases.items():
        p = E._precision_at_k(ret, rel, k)
        r_ = E._recall_at_k(ret, rel, k)
        f1 = E._f1_at_k(p, r_)
        mrr = E._mrr(ret, rel)
        ndcg = E._ndcg(ret, rel, k)
        row = got[q]
        for name, exp, val in [("precision", p, row["precision_at_k"]),
                               ("recall", r_, row["recall_at_k"]),
                               ("f1", f1, row["f1"]),
                               ("mrr", mrr, row["mrr"]),
                               ("ndcg", ndcg, row["ndcg_at_k"])]:
            assert math.isclose(val, exp, rel_tol=1e-9, abs_tol=1e-9), (
                f"q{q} {name}: spark={val} ref={exp}")
