"""Spell correction: deletion-neighborhood join ≡ exhaustive oracle."""

import random

from hybrid_search_engine_spark.contract_ext import (
    _SPELL_QTERMS,
    q_spell_correct,
)
from hybrid_search_engine_spark.localdf import local_df
from hybrid_search_engine_spark.operators.spell import (
    py_spell_correct,
    spell_correct,
)


def _run(spark, vocab: dict, qterms: list[str], max_edit=1):
    v = local_df(spark, list(vocab.items()), "term string, df long")
    q = local_df(spark, [(t,) for t in qterms], "qterm string")
    return {
        r["qterm"]: (r["suggestion"], r["dist"], r["df"])
        for r in spell_correct(v, q, max_edit=max_edit).collect()
    }


def test_hand_values(spark):
    vocab = {"table": 50, "tables": 30, "cable": 40, "fable": 40,
             "tale": 10, "stable": 5, "query": 90}
    got = _run(spark, vocab, ["tabel", "query", "quer", "xzq", "tabl"])
    want = py_spell_correct(vocab, ["tabel", "query", "quer", "xzq", "tabl"])
    assert got == want
    assert got["query"] == ("query", 0, 90)     # exact hit wins at dist 0
    assert got["quer"] == ("query", 1, 90)      # one insertion
    assert got["tabl"] == ("table", 1, 50)      # one deletion
    assert "tabel" not in got   # transposition = plain-levenshtein 2
    assert "xzq" not in got     # nothing within distance 1


def test_tie_breaks_df_then_term(spark):
    vocab = {"aaab": 10, "aaac": 99, "aaad": 99}
    got = _run(spark, vocab, ["aaa"])
    # all at dist 1; df 99 beats 10; 'aaac' < 'aaad'
    assert got["aaa"] == ("aaac", 1, 99)


def test_property_exhaustive_oracle(spark):
    rng = random.Random(23)
    alphabet = "abcd"
    vocab = {}
    for _ in range(60):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 6)))
        vocab[w] = rng.randint(1, 100)
    qterms = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
        for _ in range(25)
    })
    got = _run(spark, vocab, qterms)
    assert got == py_spell_correct(vocab, qterms)


def test_contract_row(spark, sf_dir):
    out = {
        r["qterm"]: (r["suggestion"], r["dist"])
        for r in q_spell_correct(spark, sf_dir).collect()
    }
    assert out["tabl"] == ("table", 1)
    assert out["sparkk"] == ("spark", 1)
    assert out["querry"] == ("query", 1)
    assert "zzzzzz" not in out and "tabel" not in out
    assert set(out) <= set(_SPELL_QTERMS)
