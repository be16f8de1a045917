"""Deterministic synthetic web-pages corpus (FIXTURES.md §A1-A2).

Generates the engine's input table — pages(url, warc_ts, html, text, lang) —
at arbitrary scale, seed-pinned, no external data. Structure:

- Zipfian vocabulary (~5k terms, s≈1.07) so the top ~10 terms hit most
  documents (exercises hot-term salting);
- the reference's 51 stopwords injected at natural frequency;
- punctuation / newlines / tabs / unicode NBSP as token separators (NBSP is
  the Python-vs-Java ``\\s`` hard case);
- exact duplicates at i ≡ 0 (mod 97), near duplicates (5% token swaps) at
  i ≡ 0 (mod 131);
- 20 known-answer docs embedding the reference demo corpus
  (/root/reference/main.py:25-38 — fixture data, not code) so the demo
  queries have stable hits;
- ~1% NULL html (text-only records; `text` pre-populated).

Everything is derived from a counter + xorshift-style PRNG seeded at 42 —
regenerating at any scale is bit-identical.
"""

from __future__ import annotations

import random
import string
from datetime import datetime, timedelta, timezone

# 12 demo sentences from the reference's main.py:25-38 (golden-query targets)
DEMO_DOCS = [
    "The quick brown fox jumps over the lazy dog.",
    "A journey of a thousand miles begins with a single step.",
    "To be or not to be, that is the question.",
    "All that glitters is not gold.",
    "The early bird catches the worm.",
    "Actions speak louder than words.",
    "An apple a day keeps the doctor away.",
    "Where there's a will, there's a way.",
    "Machine learning models require large datasets for training.",
    "Python is a popular programming language for data science.",
    "Neural networks can learn complex patterns from data.",
    "The transformer architecture revolutionized natural language processing.",
]

# Reference demo queries (main.py:50-54,109,137) + engine-generated ones
DEMO_QUERIES = [
    "wise sayings about starting",
    "machine learning and AI",
    "programming languages",
    "search engine configuration",
    "artificial intelligence",
]

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.07

_SEPARATORS = [" ", " ", " ", " ", ", ", ". ", "\n", "\t", " ", "; ", "! "]


def _make_vocab(rng: random.Random) -> list[str]:
    from hybrid_search_engine_spark.reference_semantics import STOPWORDS

    vocab = sorted(STOPWORDS)  # stopwords occupy the head at natural frequency
    seen = set(vocab)
    while len(vocab) < VOCAB_SIZE:
        n = rng.randint(3, 10)
        w = "".join(rng.choice(string.ascii_lowercase) for _ in range(n))
        if rng.random() < 0.03:
            w += str(rng.randint(0, 99))
        if rng.random() < 0.02:
            w = w[: max(1, n // 2)] + "_" + w[n // 2:]
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _zipf_weights(n: int, s: float) -> list[float]:
    return [1.0 / ((i + 1) ** s) for i in range(n)]


def _doc_body(rng: random.Random, vocab, cum_weights, n_tokens: int) -> str:
    words = rng.choices(vocab, cum_weights=cum_weights, k=n_tokens)
    parts = []
    for w in words:
        parts.append(w)
        parts.append(rng.choice(_SEPARATORS))
    return "".join(parts).strip()


def _near_dup(rng: random.Random, body: str, vocab) -> str:
    toks = body.split(" ")
    n_swap = max(1, len(toks) // 20)  # ~5% substitutions
    for _ in range(n_swap):
        i = rng.randrange(len(toks))
        toks[i] = rng.choice(vocab)
    return " ".join(toks)


def _html_wrap(rng: random.Random, title: str, body: str) -> str:
    paras = []
    toks = body.split(" ")
    n_paras = rng.randint(1, 8)
    per = max(1, len(toks) // n_paras)
    for p in range(n_paras):
        chunk = " ".join(toks[p * per:(p + 1) * per])
        if chunk:
            paras.append(f"<p>{chunk}</p>")
    extra = ""
    if rng.random() < 0.3:
        extra += "<script>var x = 'NOINDEX_SCRIPT_PAYLOAD';</script>"
    if rng.random() < 0.2:
        extra += "<style>.c{color:red}</style>"
    return (
        f"<html><head><title>{title}</title>{extra}</head><body>"
        + "".join(paras)
        + "</body></html>"
    )


def generate_pages(n_docs: int, seed: int = SEED) -> "iter":
    """Yield dict rows for the pages table, deterministically."""
    rng = random.Random(seed)
    vocab = _make_vocab(rng)
    weights = _zipf_weights(len(vocab), ZIPF_S)
    cum = []
    acc = 0.0
    for w in weights:
        acc += w
        cum.append(acc)
    t0 = datetime(2025, 1, 1, tzinfo=timezone.utc)

    prev_body = ""
    prev_html, prev_text = None, ""
    for i in range(n_docs):
        row_rng = random.Random((seed << 20) ^ i)  # per-row determinism
        url = f"https://site{i % 1000}.example/path/{i}"
        ts = t0 + timedelta(seconds=37 * i)
        lang = "en" if i % 20 < 18 else ("de" if i % 20 == 18 else "fr")

        if i % 97 == 0 and i >= 20:
            # exact duplicate: identical page content, different url only
            # (extracted text must be byte-identical for the sha-256 path)
            yield {"url": url, "warc_ts": ts, "html": prev_html,
                   "text": prev_text, "lang": lang}
            continue

        if i < 20:
            # first 20 rows: known-answer docs (12 demo + 8 topical fillers)
            if i < 12:
                body = DEMO_DOCS[i]
            else:
                fillers = [
                    "search engine configuration and tuning guide",
                    "artificial intelligence research overview",
                    "distributed systems design for search engines",
                    "configuration management for large clusters",
                    "intelligence gathering with artificial agents",
                    "programming language comparison python java rust",
                    "machine learning for artificial intelligence engineers",
                    "starting a journey with wise sayings",
                ]
                body = fillers[i - 12]
        elif i % 131 == 0:
            body = _near_dup(row_rng, prev_body, vocab)
        else:
            body = _doc_body(row_rng, vocab, cum, row_rng.randint(30, 400))
        prev_body = body

        if row_rng.random() < 0.01:
            html, text = None, body  # text-only record
        else:
            html = _html_wrap(row_rng, f"Page {i}", body).encode("utf-8")
            text = None  # engine's extraction stage populates this
        prev_html, prev_text = html, text if text is not None else ""
        yield {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def write_pages_parquet(path: str, n_docs: int, seed: int = SEED) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = list(generate_pages(n_docs, seed))
    table = pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us", tz="UTC")),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })
    # explicit row groups: a single-row-group file is UNSPLITTABLE for any
    # engine (Spark assigns the whole file to one scan task — measured: the
    # 1M-doc extraction ran on 1 of 16 cores for ~5 min). 32k rows ≈ 45MB.
    pq.write_table(table, path, row_group_size=32768)
    return path


def generated_queries(n: int = 95, seed: int = SEED) -> list[str]:
    """95 generated queries: 1-4 terms at mixed frequency + 5 with OOV terms."""
    rng = random.Random(seed + 1)
    vocab = _make_vocab(random.Random(seed))
    out = []
    for i in range(n):
        k = rng.randint(1, 4)
        if i < 5:
            terms = [f"zzoutofvocab{i}"] + rng.sample(vocab[100:500], k)
        elif i % 3 == 0:
            terms = rng.sample(vocab[:60], k)        # hot terms
        elif i % 3 == 1:
            terms = rng.sample(vocab[60:1000], k)    # mid
        else:
            terms = rng.sample(vocab[1000:], k)      # rare
        out.append(" ".join(terms))
    return out


def all_queries() -> list[str]:
    return DEMO_QUERIES + generated_queries()


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/repo/.fixtures/pages_{n}.parquet"
    import os

    os.makedirs(os.path.dirname(out), exist_ok=True)
    print(write_pages_parquet(out, n))
