"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — build the inverted index over the sf0.001
  documents table and run an index-backed BM25 top-10.
- ``queries()``: every implemented operator (SURVEY.md §2 + training-data
  ops), callables (spark, sf_dir) → DataFrame.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (generated alongside
  the Spark implementations from shared constants in
  gloomy_spark/entry_queries.py). Since round 4 EVERY entry is
  value-checked: approximate ops (LSH/IVF ANN, banded near-pair search)
  are violation-gated — the entry runs the approximate operator, checks
  its contract (exact-subset + recall floor) against the exact twin, and
  returns the violation set, which the oracle pins to empty.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# robust to being loaded by file path from any cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession

from gloomy_spark.entry_queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full index build (extract→postings→dict→segments) over
    sf0.001 documents + block-max WAND BM25 top-10."""
    from gloomy_spark.entry_queries import _index_for

    si = _index_for(spark, "/root/testdata/sf0.001")
    return si.bm25_topk("scan filter window the", k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
