"""Pages-table helpers: extraction + stable doc-id assignment.

Input table shape (BASELINE.json input_hint):
    pages(url string PK, warc_ts timestamp, html binary, text string,
          lang string)

doc_id = xxhash64(url): deterministic, stable across resumes and appends, no
serial MAX+1 bottleneck (the reference allocates MAX(doc_id)+1 at
indexer.py:336-337 — a single-writer pattern that cannot scale; hashing
replaces it). Collision probability at 10^12 docs is ~2.7e-2 per birthday
bound on 64 bits — production would widen to 128-bit (two-column xxhash64
with different seeds or sha2-derived); tests assert uniqueness at fixture
scale and the schema reserves that evolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import with_extracted_text


def pages_to_docs(pages: DataFrame, extract: bool = True,
                  partitions: int | None = None) -> DataFrame:
    """pages → docs(doc_id, url, text, lang). Runs the parity extraction
    stage (html→text pandas UDF) unless `text` is already populated.

    ``partitions`` repartitions BEFORE the extraction UDF — essential when
    the source's scan granularity is coarse (e.g. few/one parquet row
    groups): the UDF projection otherwise runs inside the scan stage at
    scan parallelism, serializing the most expensive per-byte step of the
    whole pipeline onto however many splits the file happens to have."""
    df = pages.repartition(partitions) if partitions else pages
    df = with_extracted_text(df) if extract else df
    return df.select(
        F.xxhash64("url").alias("doc_id"), "url", "text", "lang"
    )
