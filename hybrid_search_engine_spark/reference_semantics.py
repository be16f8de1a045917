"""Pure-Python parity core: the exact text semantics the engine must match.

This module is the single source of truth for the reference's text
behavior.  It is imported BOTH by the vendored test oracle
(``oracle/bm25_oracle.py``) and by the Spark pandas UDFs
(``functions/text.py``), so "byte-identical extracted text per url"
(BASELINE.json input_hint) is enforced structurally: the same function runs
on both sides of every parity assertion.

Semantics contract (reference, cited for parity only — no code copied):
- stopword set + tokenizer regex: /root/reference/search_engine/extractor.py:6-31
- whitespace normalization:       /root/reference/search_engine/extractor.py:34-52
- per-doc metadata:               /root/reference/search_engine/extractor.py:55-71

The HTML stripper is OURS (the reference has no HTML handling at all —
extractor.py:84-100 reads txt/json only). It is defined here once, frozen,
and versioned; the parity target for the `text` column is
``preprocess_text(strip_html(html))``.
"""

from __future__ import annotations

import re

# The reference's 48-word stopword list (extractor.py:6-12). This is a
# semantic constant of the system under rebuild, not code.
STOPWORDS = frozenset(
    """a an the and or but in on at to for of with by from is are was were be
    been being have has had do does did will would could should may might must
    shall can this that these those i you he she it we they""".split()
)

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+")
_WS_RE = re.compile(r"\s+")

# --- HTML stripping (ours; deterministic; version frozen) -------------------
_HTML_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_TAG_RE = re.compile(r"<[^>]+>")
_ENTITY_MAP = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITY_MAP))

HTML_STRIPPER_VERSION = 1


def strip_html(html: str | bytes | None) -> str:
    """Deterministic HTML → text. Drops comments, <script>/<style> bodies and
    all tags (replaced by a space so adjacent words don't merge), then decodes
    the common named entities. No external parser; behavior is frozen at
    HTML_STRIPPER_VERSION so index builds are reproducible."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    if not html:
        return ""
    s = _HTML_COMMENT_RE.sub(" ", html)
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENTITY_RE.sub(lambda m: _ENTITY_MAP[m.group(0)], s)
    return s


def tokenize(text: str | None, remove_stopwords: bool = False) -> list[str]:
    """Alphanumeric tokens of ``text.lower()``; optional stopword removal.

    Parity: extractor.py:15-31 (regex ``[A-Za-z0-9_]+`` on the lowercased
    string; stopwords filtered preserving order)."""
    if not text:
        return []
    toks = _TOKEN_RE.findall(text.lower())
    if remove_stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    return toks


def preprocess_text(text: str | None, remove_stopwords: bool = False) -> str:
    """Whitespace-normalized text (parity: extractor.py:34-52).

    ``re.sub(r'\\s+', ' ', text.strip())`` under Python ``re`` semantics —
    note Python ``\\s`` matches unicode whitespace (NBSP etc.) while Java/RE2
    ``\\s`` does not; that is exactly why this runs inside pandas UDFs, not as
    a JVM regexp, on the parity-bearing path."""
    if not text:
        return ""
    out = _WS_RE.sub(" ", text.strip())
    if remove_stopwords:
        return " ".join(tokenize(out, remove_stopwords=True))
    return out


def extract_text(html: str | bytes | None, fallback_text: str | None = None) -> str:
    """The engine's canonical ``text`` column: strip_html → preprocess.

    When ``html`` is NULL (text-only records) the already-extracted
    ``fallback_text`` passes through preprocess unchanged-idempotently."""
    if html is None or (isinstance(html, (bytes, bytearray)) and len(html) == 0):
        return preprocess_text(fallback_text)
    return preprocess_text(strip_html(html))


def doc_metadata(text: str | None) -> dict:
    """char/word counts (parity: extractor.py:55-71)."""
    toks = tokenize(text)
    return {
        "char_count": len(text) if text else 0,
        "word_count": len(toks),
        "unique_words": len(set(toks)),
        "avg_word_length": (sum(len(t) for t in toks) / len(toks)) if toks else 0.0,
    }
