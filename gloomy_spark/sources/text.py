"""Corpus sources: plain-text files (optionally gzip/bzip2, non-UTF8).

Reference parity: files.NewReader transparent gz/bz2 handling
(index/builder/files/util.go:28-56) — Spark's text reader decompresses
.gz/.bz2 by extension natively; charset decode (simple.go:84-90) is a
vectorized bytes-decode over binaryFile rows for non-UTF8 corpora.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_plaintext_docs(
    spark: SparkSession, path: str, charset: str = "utf-8",
    stable_ids: bool = True,
) -> DataFrame:
    """One document per line: (doc_id, text). Handles *.gz / *.bz2
    transparently. For non-UTF8, reads bytes and decodes vectorized.

    doc_ids are CONTENT-stable by default: re-reading the same corpus at
    any parallelism / split layout yields the identical (doc_id, text)
    set, so resume lineage and cross-run comparisons hold.
    doc_id = xxhash64(path, text, occurrence), where occurrence numbers
    duplicate (path, text) lines 1..k — the assignment order within a
    duplicate group is arbitrary, but the emitted ID SET is permutation-
    invariant, hence layout-independent. Costs one shuffle on
    (path, line-hash); only exact-duplicate lines within one file share a
    key. Duplicate groups are numbered sequentially (no layout-free salt
    exists for byte-identical rows), so a pathological file that is
    mostly ONE repeated line concentrates that group on one task —
    for such corpora dedup first or pass `stable_ids=False`, which skips
    the shuffle and falls back to monotonically_increasing_id
    (partition-layout-dependent — fine for one-shot pipelines)."""
    if charset.lower() in ("utf-8", "utf8"):
        lines = spark.read.text(path).select(
            F.input_file_name().alias("path"), F.col("value").alias("text")
        )
        if not stable_ids:
            return lines.select(
                F.monotonically_increasing_id().alias("doc_id"), "text"
            )
        from pyspark.sql import Window

        w = Window.partitionBy("path", F.xxhash64("text")).orderBy(
            F.monotonically_increasing_id()
        )
        return lines.select(
            F.xxhash64("path", "text", F.row_number().over(w)).alias("doc_id"),
            "text",
        )
    # non-UTF8: binaryFile → decode whole file → split lines
    from ..session import ship_package

    ship_package(spark)
    bf = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                body = bytes(r["content"])
                if r["path"].endswith(".gz"):
                    import gzip

                    body = gzip.decompress(body)
                elif r["path"].endswith(".bz2"):
                    import bz2

                    body = bz2.decompress(body)
                for i, line in enumerate(body.decode(charset).splitlines()):
                    rows.append((r["path"], i, line))
            yield pd.DataFrame(rows, columns=["path", "line_no", "text"])

    decoded = bf.mapInPandas(decode, "path string, line_no long, text string")
    # 64-bit hash of the full (path, line) pair — no 32-bit fold / abs()
    # sign squash, so distinct documents don't silently merge at large
    # file counts (birthday bound moves from 2^16 to 2^32 files·lines)
    return decoded.select(
        F.xxhash64("path", "line_no").alias("doc_id"),
        "text",
    )


def read_wholefile_docs(spark: SparkSession, path: str) -> DataFrame:
    """One document per file: (doc_id, url=path, text)."""
    df = spark.read.text(path, wholetext=True).withColumn(
        "url", F.input_file_name()
    )
    return df.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        F.col("value").alias("text"),
    )
