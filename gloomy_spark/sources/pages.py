"""Common-Crawl-style pages source (the north-rule input shape).

The corpus is an Iceberg table with columns
(url string, warc_ts timestamp, html binary, text string, lang string);
`read_pages` dispatches on the source spec so the SAME pipeline code runs
against a catalog table in production and parquet fixtures in this
sandbox (which has no Iceberg jars — the store layout maps 1:1 onto
Iceberg tables, see index_store.py):

- ``"catalog.db.pages"`` (a dotted identifier, no path separator) →
  ``spark.read.table`` — with an Iceberg catalog configured this is a
  snapshot-isolated scan with partition pruning and hidden-partition
  evolution handled by the table format;
- ``"/path/to/pages.parquet"`` / any path or glob → ``spark.read.parquet``.

Column pruning and predicate pushdown behave identically either way: the
build reads only (doc_id/url, text[, lang]) so the html binary column is
never fetched (ReadSchema excludes it — asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Pages corpus from a table identifier or a parquet path/glob."""
    if "/" not in source and not source.endswith(".parquet"):
        return spark.read.table(source)
    return spark.read.parquet(source)


def pages_to_docs(pages: DataFrame) -> DataFrame:
    """Project the pages shape to the builder's (doc_id, text, url, lang)
    — doc_id is the 64-bit url hash (urls are the corpus's primary key),
    so re-ingesting the same snapshot at any parallelism yields identical
    ids. The html column is intentionally NOT selected: Catalyst prunes it
    from the scan (a build must never pay for the raw bytes)."""
    return pages.select(
        F.xxhash64("url").alias("doc_id"),
        "text",
        "url",
        "lang",
    )
