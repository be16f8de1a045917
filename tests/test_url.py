"""URL canonicalization: three-way parity (Spark Column ≡ pure-Python
mirror ≡ DuckDB oracle expression) plus the contract row end-to-end."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hybrid_search_engine_spark.functions.url import (
    canonicalize_url,
    duckdb_canonicalize_url_sql,
    py_canonicalize_url,
)

CASES = [
    # every rule at least once; expected values are the module contract
    ("HTTPS://WWW.Example.com:443/a/b/?b=2&utm_source=x&a=1#frag",
     "https://example.com/a/b?a=1&b=2"),
    ("http://example.com:80/a//?z=1&y=&x=3",
     "http://example.com/a?x=3&y=&z=1"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("ftp://Host.com:21/file", "ftp://host.com:21/file"),   # port kept
    ("not a url 42", "not a url 42"),                        # passthrough
    ("  https://m.example.com/p?gclid=1&ref=x  ",
     "https://m.example.com/p"),                             # tracking-only
    ("https://example.com/p?ref=x&refx=1&utm=2&utm_=3",
     "https://example.com/p?refx=1&utm=2"),  # prefix-exact tracking match
    ("http://example.com:8080/", "http://example.com:8080/"),
    ("https://user:pw@Example.com/x", "https://user:pw@example.com/x"),
    ("", ""),
    ("https://example.com/a%2Fb?A=1&a=2",
     "https://example.com/a%2Fb?A=1&a=2"),  # %-encoding untouched
    ("http://example.com/?&&", "http://example.com/"),
    ("scheme+x.y://Weird/", "scheme+x.y://weird/"),
]


def test_python_mirror_cases():
    for url, want in CASES:
        assert py_canonicalize_url(url) == want, url
    assert py_canonicalize_url(None) is None


def test_spark_matches_python(spark):
    urls = [u for u, _ in CASES] + [None]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = {r["u"]: r["c"]
           for r in df.select("u", canonicalize_url("u").alias("c")).collect()}
    for u in urls:
        assert got[u] == py_canonicalize_url(u), u


def test_duckdb_oracle_matches_python():
    urls = [u for u, _ in CASES]
    vals = ",".join("('" + u.replace("'", "''") + "')" for u in urls)
    rows = duckdb.sql(
        f"SELECT u, {duckdb_canonicalize_url_sql('u')} AS c "
        f"FROM (VALUES {vals}) t(u)").fetchall()
    for u, c in rows:
        assert c == py_canonicalize_url(u), u


# random "URL-shaped" strings: scheme/host/path/query fuzz across the rules
_seg = st.text(alphabet="abcXY019._~%-", min_size=0, max_size=6)
_param = st.one_of(
    st.just("utm_source=1"), st.just("gclid=z"), st.just("ref"),
    st.just(""), st.builds(lambda a, b: f"{a}={b}", _seg, _seg))


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "ftp", "x+y.z"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = draw(st.sampled_from(["Example.com", "a.B.c", "h0st"]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "/".join(draw(st.lists(_seg, max_size=3)))
    slash = draw(st.sampled_from(["", "/", "//"]))
    params = draw(st.lists(_param, max_size=4))
    query = ("?" + "&".join(params)) if draw(st.booleans()) else ""
    frag = draw(st.sampled_from(["", "#f", "#a b"]))
    pad = draw(st.sampled_from(["", " ", "\t"]))
    return f"{pad}{scheme}://{www}{host}{port}/{path}{slash}{query}{frag}{pad}"


@settings(max_examples=150, deadline=None)
@given(_urls())
def test_duckdb_oracle_matches_python_fuzz(url):
    got = duckdb.sql(
        "SELECT " + duckdb_canonicalize_url_sql("u")
        + " FROM (VALUES ('" + url.replace("'", "''") + "')) t(u)"
    ).fetchone()[0]
    assert got == py_canonicalize_url(url), url


def _fuzz_urls(n: int, seed: int = 7) -> list:
    import random

    rng = random.Random(seed)
    out = []
    for _ in range(n):
        scheme = rng.choice(["http", "HTTP", "https", "ftp", "x+y.z"])
        www = rng.choice(["", "www.", "WWW."])
        host = rng.choice(["Example.com", "a.B.c", "h0st"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        segs = ["".join(rng.choices("abcXY019._~%-", k=rng.randint(0, 6)))
                for _ in range(rng.randint(0, 3))]
        slash = rng.choice(["", "/", "//"])
        params = [rng.choice(["utm_source=1", "gclid=z", "ref", "",
                              f"{segs[0] if segs else 'k'}=v"])
                  for _ in range(rng.randint(0, 4))]
        query = ("?" + "&".join(params)) if rng.random() < 0.7 else ""
        frag = rng.choice(["", "#f", "#a b"])
        pad = rng.choice(["", " ", "\t"])
        out.append(f"{pad}{scheme}://{www}{host}{port}/"
                   f"{'/'.join(segs)}{slash}{query}{frag}{pad}")
    return out


def test_spark_matches_python_fuzz(spark):
    urls = _fuzz_urls(60)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r["c"] for r in
           df.select(canonicalize_url("u").alias("c")).collect()]
    assert got == [py_canonicalize_url(u) for u in urls]


def test_contract_row(spark, sf_dir):
    from hybrid_search_engine_spark.contract_ext import (
        _sql_url_canonical,
        q_url_canonical,
    )

    rows = q_url_canonical(spark, sf_dir).collect()
    assert rows and all(r["canon_url"] == py_canonicalize_url(r["url"])
                        for r in rows)
    # dedup effect: variant-0 and variant-2/5 urls collapse per source
    con = duckdb.connect()
    import os
    for t in ("documents",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{os.path.join(sf_dir, t + '.parquet')}'")
    want = sorted((r[0], r[1], r[2])
                  for r in con.execute(_sql_url_canonical()).fetchall())
    got = sorted((r["doc_id"], r["url"], r["canon_url"]) for r in rows)
    assert got == want


def test_keep_latest_by_canonical_url(spark):
    from hybrid_search_engine_spark.operators.url_dedup import (
        keep_latest_by_canonical_url,
    )

    rows = [
        # three crawls of one canonical page under url variations
        (1, 10, "https://www.example.com/a/?utm_source=x"),
        (2, 30, "https://example.com/a"),
        (3, 20, "HTTPS://EXAMPLE.com:443/a/"),
        # timestamp tie -> higher doc_id wins
        (4, 5, "http://other.com/p"),
        (5, 5, "http://other.com/p/"),
        # singleton
        (6, 1, "ftp://x.com/f"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, warc_ts long, url string")
    got = {r["canon_url"]: (r["doc_id"], r["warc_ts"], r["n_crawls"])
           for r in keep_latest_by_canonical_url(df).collect()}
    assert got == {
        "https://example.com/a": (2, 30, 3),
        "http://other.com/p": (5, 5, 2),
        "ftp://x.com/f": (6, 1, 1),
    }
