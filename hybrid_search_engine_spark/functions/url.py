"""URL canonicalization for web-crawl pipelines.

Common-Crawl-style corpora key documents by URL (the engine's input table
is pages(url, warc_ts, html, text, lang) — SURVEY.md §1), and URL-level
dedup is the first pass of every web training-data pipeline: the same
page is crawled under `http://www.x.com/a/?utm_source=feed#top` and
`https://x.com/a`, and near-dup text dedup should not have to pay for
what string normalization resolves for free. The reference engine has no
web-crawl ingestion, so this operator is part of the training-data
surface (like dedup/quality/language-ID), not reference parity.

Canonical form (deterministic, documented — NOT RFC 3986 resolution):

1. trim surrounding whitespace; non-URLs (no `scheme://`) pass through
   trimmed but otherwise untouched (never invent structure);
2. scheme and host lowercased; a leading `www.` on the host dropped;
3. default ports dropped (`:80` for http, `:443` for https; any other
   port kept);
4. trailing slashes on the path dropped (`/a/b/` → `/a/b`), empty path
   → `/`;
5. tracking parameters dropped (`utm_*`, `fbclid`, `gclid`, `ref`),
   remaining query params sorted bytewise, empty segments removed, a
   now-empty query dropped entirely;
6. the fragment dropped.

Percent-encoding normalization and userinfo handling are deliberately
out of scope (kept verbatim): both engines and the tests pin that.

Everything is native Column expressions (regexp + array HOFs) — one
projection, no UDF, no shuffle; the DuckDB oracle in contract_ext spells
the identical steps with RE2/list lambdas, and `py_canonicalize_url`
mirrors them in pure Python for property tests.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# capture groups: 1=scheme, 2=host[:port] (may include userinfo),
# 3=path, 4=query (no '?')
URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

# a query segment is a tracking param when its NAME matches (with or
# without a value)
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=|$)"

# explicit ASCII-whitespace trim, identical on all three engines: SQL
# trim() strips only 0x20 (DuckDB and Spark both), Python .strip() strips
# all of unicode — neither is what the other does, so spell the set out
ASCII_WS_TRIM_RE = r"^[ \t\r\n\x0b\x0c]+|[ \t\r\n\x0b\x0c]+$"


def canonicalize_url(col: Column | str) -> Column:
    """→ canonical URL string per the module contract. Null-safe: null in,
    null out; non-URL strings come back trimmed."""
    u = F.regexp_replace(F.col(col) if isinstance(col, str) else col,
                         ASCII_WS_TRIM_RE, "")
    scheme = F.lower(F.regexp_extract(u, URL_RE, 1))
    host0 = F.lower(F.regexp_extract(u, URL_RE, 2))
    host1 = F.regexp_replace(host0, r"^www\.", "")
    host = (F.when(scheme == "http", F.regexp_replace(host1, ":80$", ""))
            .when(scheme == "https", F.regexp_replace(host1, ":443$", ""))
            .otherwise(host1))
    path0 = F.regexp_replace(F.regexp_extract(u, URL_RE, 3), "/+$", "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    qparts = F.array_sort(F.filter(
        F.split(F.regexp_extract(u, URL_RE, 4), "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_RE)))
    query = F.array_join(qparts, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)))
    return F.when(scheme == "", u).otherwise(canon)


_URL_RE = re.compile(URL_RE)
_TRACKING_RE = re.compile(TRACKING_RE)


def py_canonicalize_url(url: str | None) -> str | None:
    """Pure-Python mirror of :func:`canonicalize_url` (test oracle)."""
    if url is None:
        return None
    u = url.strip(" \t\r\n\x0b\x0c")
    m = _URL_RE.match(u)
    if not m:
        return u
    scheme = m.group(1).lower()
    host = re.sub(r"^www\.", "", m.group(2).lower())
    if scheme == "http":
        host = re.sub(r":80$", "", host)
    elif scheme == "https":
        host = re.sub(r":443$", "", host)
    path = re.sub(r"/+$", "", m.group(3)) or "/"
    segs = (m.group(4) or "").split("&")
    keep = sorted(s for s in segs if s and not _TRACKING_RE.match(s))
    query = f"?{'&'.join(keep)}" if keep else ""
    return f"{scheme}://{host}{path}{query}"


def duckdb_canonicalize_url_sql(raw_col: str) -> str:
    """DuckDB expression mirroring :func:`canonicalize_url` over
    `raw_col` (trimming included — SQL trim() strips only spaces, so the
    helper applies the shared ASCII_WS_TRIM_RE itself). Used by the
    contract oracle and the three-way parity test. DuckDB quirks handled
    here: an unmatched OPTIONAL regex group returns NULL (not ''), and
    array_to_string of an empty list returns NULL — both coalesced."""
    col = f"regexp_replace({raw_col}, '{ASCII_WS_TRIM_RE}', '', 'g')"
    urlre = URL_RE.replace("'", "''")
    q = (f"coalesce(array_to_string(list_sort(list_filter(string_split("
         f"coalesce(regexp_extract({col}, '{urlre}', 4), ''), '&'), "
         f"x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_RE}'))), "
         f"'&'), '')")
    host = f"regexp_replace(lower(regexp_extract({col}, '{urlre}', 2)), '^www\\.', '')"
    path = f"regexp_replace(regexp_extract({col}, '{urlre}', 3), '/+$', '')"
    return f"""
CASE WHEN regexp_extract({col}, '{urlre}', 1) = '' THEN {col}
ELSE lower(regexp_extract({col}, '{urlre}', 1)) || '://' ||
  CASE lower(regexp_extract({col}, '{urlre}', 1))
    WHEN 'http'  THEN regexp_replace({host}, ':80$', '')
    WHEN 'https' THEN regexp_replace({host}, ':443$', '')
    ELSE {host}
  END ||
  CASE WHEN {path} = '' THEN '/' ELSE {path} END ||
  CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END
END"""
