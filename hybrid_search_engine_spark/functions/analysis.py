"""Text-analysis operators for training-data pipelines.

All native column expressions (codegen'd, no Python workers):

- language-ID heuristic (stopword-hit ratio per language's function-word
  list + script detection by unicode-range counts; reference semantics
  model: language.py:66-168)
- quality scoring (length / punctuation / stopword / uniqueness ratios —
  the standard web-text quality gates)
- token counting (whitespace words, regex tokens, BPE-ish subword estimate)
- document fingerprinting (order-insensitive content fingerprint + rolling
  prefix hash)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..reference_semantics import STOPWORDS
from .text import tokens_native

# Function-word lists for the latin-script language-ID heuristic. English
# list = the reference stopword set; others are standard closed-class words.
# Dict ORDER is the argmax tie-break (earliest wins) — the SQL oracle is
# generated from this same dict, so keep insertion order stable.
LANG_FUNCTION_WORDS = {
    "en": sorted(STOPWORDS),
    "de": ("der die das und oder aber ein eine einer nicht ist sind war mit "
           "von zu für auf im den dem des sie er es wir ihr ich du".split()),
    "fr": ("le la les un une des et ou mais ne pas est sont était avec de "
           "du au aux pour sur dans il elle nous vous ils je tu ce cette".split()),
    "es": ("el la los las un una unos y o pero no es son era con de del al "
           "para en por que se su ellos nosotros yo tú usted esta este".split()),
    "it": ("il lo la gli le che di non è sono era una uno per con ma come "
           "più questo questa nel della delle degli anche questi sia "
           "loro noi io tu perché quando molto".split()),
    "pt": ("o os um uma uns umas não é são foi com para por mas como mais "
           "este esta isso em do da dos das você eles nós eu também já "
           "muito quando porque".split()),
    "nl": ("de het een en van niet is zijn was met voor op aan bij dat "
           "deze ook maar naar om uit er hij zij wij jullie ik je dit "
           "worden wordt hebben heeft".split()),
}

# Non-latin scripts map directly to a language code (the reference wraps
# langdetect, language.py:66-138; for single-script languages the script IS
# the decision). Japanese is the mixed-script case: any kana presence
# alongside han → ja, pure han → zh.
SCRIPT_LANG = {
    "cyrillic": "ru",
    "han": "zh",
    "kana": "ja",
    "hangul": "ko",
    "arabic": "ar",
    "devanagari": "hi",
    "greek": "el",
    "hebrew": "he",
    "thai": "th",
}

# Single-char classes (literal unicode range endpoints — valid in both java
# regex and DuckDB's RE2, so the oracle can count with the same patterns).
LANG_SCRIPT_RANGES = {
    "latin": "[A-Za-zÀ-ɏ]",
    "cyrillic": "[Ѐ-ӿ]",
    "han": "[一-鿿]",
    "kana": "[぀-ヿ]",
    "hangul": "[가-힣ᄀ-ᇿ]",
    "arabic": "[؀-ۿ]",
    "devanagari": "[ऀ-ॿ]",
    "greek": "[Ͱ-Ͽ]",
    "hebrew": "[֐-׿]",
    "thai": "[฀-๿]",
}


def _hit_ratio(toks: Column, words: list[str]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.when(
        F.size(toks) > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(wl, t))).cast("double")
        / F.size(toks),
    ).otherwise(F.lit(0.0))


def lang_scores(text_col) -> list[Column]:
    toks = tokens_native(text_col, remove_stopwords=False)
    return [
        _hit_ratio(toks, ws).alias(f"score_{lang}")
        for lang, ws in LANG_FUNCTION_WORDS.items()
    ]


def detect_language(text_col) -> Column:
    """Two-tier language ID, all native expressions (reference semantics
    model: language.py:66-138 wraps langdetect; this covers the 16 most
    common web languages deterministically):

    1. script tier — per-char counts for 9 non-latin scripts; if the best
       non-latin script outnumbers latin letters, map script → language
       (``SCRIPT_LANG``; han with any kana present → ja).
    2. latin tier — argmax over per-language function-word hit ratios
       (``LANG_FUNCTION_WORDS``, dict order breaks ties, earliest wins);
       'und' (undetermined) when nothing scores above the 0.02 floor.
    """
    c = F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col,
                   F.lit(""))
    toks = tokens_native(c, remove_stopwords=False)

    # The per-language ratios and per-script counts are the expensive
    # subexpressions. Evaluate each EXACTLY ONCE by packing them into two
    # arrays and binding the pair through a single-element transform():
    # inside the lambda every reference is a variable lookup, not a
    # re-expansion of the underlying expression tree. (The previous
    # accumulating when-chain embedded each prior best_score twice per
    # language — a 2^n_langs expression blowup that took ~11 s for 500 rows
    # in analysis + interpreted evaluation.)
    script_names = list(LANG_SCRIPT_RANGES)  # index 0 = latin
    assert script_names[1:] == list(SCRIPT_LANG)  # shared order = tie-break
    scores = F.array(*[_hit_ratio(toks, ws)
                       for ws in LANG_FUNCTION_WORDS.values()])
    counts = F.array(*[F.regexp_count(c, F.lit(pat)).cast("int")
                       for pat in LANG_SCRIPT_RANGES.values()])
    lang_lit = F.array(*[F.lit(l) for l in LANG_FUNCTION_WORDS])
    script_lit = F.array(*[F.lit(code) for code in SCRIPT_LANG.values()])
    kana_pos = script_names.index("kana") + 1  # 1-based into counts

    def pick(x):
        s, cnt = x["s"], x["n"]
        latin_n = F.element_at(cnt, 1)
        nonlatin = F.slice(cnt, 2, len(script_names) - 1)
        nl_max = F.array_max(nonlatin)
        # latin tier: earliest argmax over the 0.02 floor (array_position
        # returns the FIRST occurrence — same tie-break as the old loop)
        mx = F.array_max(s)
        latin_pick = F.when(mx <= F.lit(0.02), F.lit("und")).otherwise(
            F.element_at(lang_lit, F.array_position(s, mx).cast("int")))
        # script tier: earliest maximal non-latin script; han-dominant with
        # any kana present → ja (mixed-script Japanese)
        script0 = F.element_at(
            script_lit, F.array_position(nonlatin, nl_max).cast("int"))
        script_pick = F.when(
            (script0 == "zh") & (F.element_at(cnt, kana_pos) > 0),
            F.lit("ja")).otherwise(script0)
        return F.when(nl_max > latin_n, script_pick).otherwise(latin_pick)

    packed = F.array(F.struct(scores.alias("s"), counts.alias("n")))
    return F.element_at(F.transform(packed, pick), 1)


def quality_columns(text_col) -> list[Column]:
    """Web-text quality gates as columns: char/token counts, mean word
    length, stopword ratio, non-alnum ratio, uniqueness, digit ratio,
    plus a composite is_quality flag."""
    c = F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col,
                   F.lit(""))
    toks = tokens_native(c, remove_stopwords=False)
    n_tok = F.size(toks)
    n_char = F.length(c)
    alnum = F.length(F.regexp_replace(c, r"[^A-Za-z0-9]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    stop_ratio = _hit_ratio(toks, sorted(STOPWORDS))
    uniq_ratio = F.when(n_tok > 0,
                        F.size(F.array_distinct(toks)).cast("double") / n_tok
                        ).otherwise(F.lit(0.0))
    mean_wlen = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0.0).cast("double"),
                    lambda a, t: a + F.length(t)) / n_tok,
    ).otherwise(F.lit(0.0))
    non_alnum_ratio = F.when(n_char > 0,
                             1.0 - alnum.cast("double") / n_char
                             ).otherwise(F.lit(1.0))
    digit_ratio = F.when(n_char > 0, digits.cast("double") / n_char
                         ).otherwise(F.lit(0.0))
    is_quality = (
        (n_tok >= 10) & (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
        & (stop_ratio >= 0.03) & (uniq_ratio >= 0.2)
        & (non_alnum_ratio <= 0.6) & (digit_ratio <= 0.3)
    )
    return [
        n_char.alias("n_chars"), n_tok.alias("n_tokens"),
        F.round(mean_wlen, 6).alias("mean_word_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("unique_ratio"),
        F.round(non_alnum_ratio, 6).alias("non_alnum_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        is_quality.alias("is_quality"),
    ]


def token_count_columns(text_col) -> list[Column]:
    """Three token-count estimators: whitespace words, regex tokens, and a
    BPE-ish subword estimate (≈ chars/4 bounded below by word count — the
    standard quick estimator for LLM token budgeting)."""
    c = F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col,
                   F.lit(""))
    # positive class (\S+ runs) — same multiset as split-on-\s+ minus
    # empties, without the slow negated-predicate regex path or filter HOF
    ws_words = F.size(F.regexp_extract_all(c, F.lit(r"\S+"), 0))
    rx_tokens = F.size(tokens_native(c))
    subword_est = F.greatest(
        ws_words.cast("long"),
        F.ceil(F.length(c) / F.lit(4.0)).cast("long"),
    )
    return [ws_words.alias("ws_word_count"),
            rx_tokens.alias("regex_token_count"),
            subword_est.alias("subword_estimate")]


def content_fingerprint(text_col) -> Column:
    """Order-insensitive token-set fingerprint: md5 of the sorted distinct
    token list — equal for any permutation/duplication of the same
    vocabulary (bag-normalized near-dup key)."""
    toks = F.array_sort(F.array_distinct(tokens_native(text_col)))
    return F.md5(F.concat_ws(" ", toks))


SCRIPT_RANGES = {
    "latin": r"[A-Za-zÀ-ɏ]",
    "cyrillic": r"[Ѐ-ӿ]",
    "cjk": r"[一-鿿぀-ヿ]",
    "arabic": r"[؀-ۿ]",
    "devanagari": r"[ऀ-ॿ]",
}


def detect_script(text_col) -> Column:
    """Unicode-range script detection (reference semantics model:
    language.py:140-168) — regexp_count per range, argmax, native exprs."""
    c = F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col,
                   F.lit(""))
    counts = [(name, F.regexp_count(c, F.lit(pat)))
              for name, pat in SCRIPT_RANGES.items()]
    best, best_n = F.lit("unknown"), F.lit(0)
    for name, n in counts:
        cond = n > best_n
        best = F.when(cond, F.lit(name)).otherwise(best)
        best_n = F.when(cond, n).otherwise(best_n)
    return best


def rolling_prefix_hash(text_col, prefix_chars: int = 256) -> Column:
    """Prefix fingerprint (cheap clustering key for boilerplate headers)."""
    c = F.coalesce(F.col(text_col) if isinstance(text_col, str) else text_col,
                   F.lit(""))
    return F.md5(F.substring(c, 1, prefix_chars))
