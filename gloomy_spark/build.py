"""Distributed inverted-index build pipeline (SPIMI re-expressed Spark-first).

Dataflow (each stage is a resumable checkpoint, per SURVEY.md §3.1):

    pages/docs ──extract──▶ docs/        (doc_id, url, doclen, lang)
        │
        └─tokenize──▶ postings_raw/      (term, doc_id, tf, dl, positions)
                          │                 one shuffle: groupBy(term, doc_id)
                          ├──▶ terms/    (term, term_id, df, cf, idf)
                          │                 partial-agg groupBy(term) — the
                          │                 map-side combine IS the salted
                          │                 two-phase agg for head terms
                          └──▶ segments/bucket=K/   per term-range bucket:
                                broadcast dict join → repartitionByRange
                                (term_id, doc_id) → sortWithinPartitions →
                                vectorized block writer (delta+varint,
                                per-block max_score for block-max WAND)

Scale notes (designed for 10^12 docs / 1000 executors, tested on local[32]):
- groupBy(term, doc_id) keys are high-cardinality → no skew;
- per-term global work (df/cf) relies on partial aggregation, which bounds
  any partition's state by |vocab seen in partition|, not by posting count —
  the head term "the" never concentrates on one task;
- segment writing range-partitions on (term_id, doc_id): a head term's
  postings spread over MANY range partitions, each emitting doc-sorted
  blocks for its own doc slice — globally docID-sorted runs without any
  single-task merge (the k-way merge of ngramlistLarge.go becomes Spark's
  shuffle-sort);
- term-range build buckets give crash-safe resume: each bucket commits its
  parquet dir then appends a ledger line; restart prunes completed buckets
  before any scan work.
"""

from __future__ import annotations

import math
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .codecs import (
    encode_posting_block,
    flat_delta_positions,
    varint_encode_with_offsets,
)
from .config import DEFAULT_CONFIG, EngineConfig
from .corpus import extract_text
from .functions.text import tokens_col
from .index_store import BucketRecord, IndexStore, Manifest

SEGMENT_SCHEMA = (
    "term_id long, doc_bucket long, first_doc long, last_doc long, n_docs int, "
    "max_score double, sum_tf long, docs binary, tfs binary, dls binary, "
    "pos_counts binary, positions binary, part_id int"
)



def extracted_docs(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, ...) → (doc_id, url, text, lang) using the
    pinned extraction function (byte-identical per-row invariant)."""
    from .session import ship_package

    ship_package(pages.sparkSession)

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "url": pdf["url"],
                    "text": [extract_text(bytes(h)) for h in pdf["html"]],
                    "lang": pdf["lang"],
                }
            )

    return pages.mapInPandas(ex, "doc_id long, url string, text string, lang string")


def bm25_idf(N: int | F.Column, df: F.Column) -> F.Column:
    """idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — pinned BM25 idf form."""
    n = F.lit(float(N)) if isinstance(N, int) else N
    return F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))


def assign_dense_ids(
    df: DataFrame, order_col: str, id_col: str, num_partitions: int
) -> DataFrame:
    """Dense 0..N-1 ids in lexicographic order WITHOUT a single-partition
    global window (SURVEY.md hard-part #5): range-partition on the order
    column, per-partition row_number, then add per-partition offsets
    computed from a tiny count pass (zipWithIndex pattern)."""
    parted = (
        df.repartitionByRange(num_partitions, order_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    out = (
        parted.withColumn(
            id_col,
            (F.row_number().over(w) - 1 + offset_map[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )
    return out


def _segment_writer(cfg: EngineConfig, avgdl: float):
    """mapInPandas writer: sorted (term_id, doc_id, tf, dl, idf, positions)
    rows → posting blocks. Vectorized per block; the only Python-level loop
    is over blocks (n/128), never over postings."""
    k1, b = cfg.bm25.k1, cfg.bm25.b
    block = cfg.block_size
    bucket_width = cfg.doc_bucket_width

    store_positions = cfg.store_positions

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in batches:
            if len(pdf) == 0:
                continue
            term_id = pdf["term_id"].to_numpy(np.int64)
            doc_id = pdf["doc_id"].to_numpy(np.int64)
            tf = pdf["tf"].to_numpy(np.int64)
            dl = pdf["dl"].to_numpy(np.int64)
            idf = pdf["idf"].to_numpy(np.float64)
            doc_bucket = doc_id // bucket_width
            score = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))

            # positions: ONE bulk delta+varint encode per Arrow batch with
            # per-value byte offsets, then blocks slice bytes — no
            # per-posting Python encode calls
            has_pos = store_positions and "positions" in pdf.columns
            if has_pos:
                lens, deltas = flat_delta_positions(pdf["positions"].to_numpy())
                cnt_buf, cnt_off = varint_encode_with_offsets(lens.astype(np.uint64))
                pos_buf, pos_off = varint_encode_with_offsets(deltas)
                val_starts = np.concatenate(([0], np.cumsum(lens)))

            # group boundaries on (term_id, doc_bucket); input is sorted
            change = np.nonzero(
                (np.diff(term_id) != 0) | (np.diff(doc_bucket) != 0)
            )[0]
            starts = np.concatenate(([0], change + 1))
            ends = np.concatenate((change + 1, [len(pdf)]))

            rows = []
            for s, e in zip(starts, ends):
                for bs in range(s, e, block):
                    be = min(bs + block, e)
                    d, t, l = doc_id[bs:be], tf[bs:be], dl[bs:be]
                    docs_buf, tfs_buf, dls_buf = encode_posting_block(d, t, l)
                    if has_pos:
                        pc_buf = cnt_buf[cnt_off[bs] : cnt_off[be]]
                        pos_blk = pos_buf[
                            pos_off[val_starts[bs]] : pos_off[val_starts[be]]
                        ]
                    else:
                        pc_buf, pos_blk = b"", b""
                    rows.append(
                        (
                            int(term_id[bs]),
                            int(doc_bucket[bs]),
                            int(d[0]),
                            int(d[-1]),
                            int(be - bs),
                            float(score[bs:be].max()),
                            int(t.sum()),
                            docs_buf,
                            tfs_buf,
                            dls_buf,
                            pc_buf,
                            pos_blk,
                            pid,
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "term_id", "doc_bucket", "first_doc", "last_doc",
                        "n_docs", "max_score", "sum_tf", "docs", "tfs", "dls",
                        "pos_counts", "positions", "part_id",
                    ],
                )

    return write


class IndexBuilder:
    """Builds a block-compressed inverted index at `index_dir`.

    Reference parity: build lifecycle of gloomy `create-index`
    (index/builder/builder.go:215-240), re-architected per SURVEY.md §3.1.
    """

    def __init__(self, spark: SparkSession, cfg: EngineConfig = DEFAULT_CONFIG):
        from .session import ship_package

        self.spark = spark
        self.cfg = cfg
        ship_package(spark)

    def build(
        self,
        docs: DataFrame,
        index_dir: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        url_col: str | None = None,
        lang_col: str | None = None,
        n_buckets: int = 4,
        resume: bool = True,
        input_snapshot: str = "",
        fail_after_bucket: int | None = None,  # test hook for resume tests
    ) -> Manifest:
        cfg = self.cfg
        store = IndexStore(index_dir)
        store.ensure_dirs()
        store.save_config(cfg)
        t0 = time.time()
        stages: dict[str, float] = {}
        shuffle_parts = cfg.shuffle_partitions

        base = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
            *( [F.col(url_col).alias("url")] if url_col else [F.lit(None).cast("string").alias("url")] ),
            *( [F.col(lang_col).alias("lang")] if lang_col else [F.lit(None).cast("string").alias("lang")] ),
        )

        # --------------------------------------------------------- tokens/
        # Tokenize EXACTLY ONCE and materialize: explode(generator_expr)
        # re-evaluates the generator expression per emitted element, so
        # feeding posexplode an inline regex-tokenizer is O(tokens²)/doc.
        # A stored token array costs one transient parquet but makes every
        # downstream stage a cheap column scan. (Transient; removable after
        # build.)
        tokens_path = os.path.join(index_dir, "tokens")
        if not (resume and os.path.exists(os.path.join(tokens_path, "_SUCCESS"))):
            (
                base.withColumn("tokens", tokens_col(F.col("text"), cfg))
                .select(
                    "doc_id", "url", "lang", "tokens",
                    F.size("tokens").alias("doclen"),
                )
                .write.mode("overwrite")
                .parquet(tokens_path)
            )
        tokens_df = self.spark.read.parquet(tokens_path)
        stages["tokenize"] = round(time.time() - t0, 2)

        # ---------------------------------------------------------- docs/
        if not (resume and store.stage_done("docs")):
            (
                tokens_df.select("doc_id", "url", "lang", "doclen")
                .write.mode("overwrite")
                .parquet(store.docs_path)
            )
        stages["docs"] = round(time.time() - t0 - sum(stages.values()), 2)
        docs_stats = self.spark.read.parquet(store.docs_path)
        agg = docs_stats.agg(
            F.count("*").alias("n"), F.avg("doclen").alias("avgdl")
        ).collect()[0]
        n_docs, avgdl = int(agg["n"]), float(agg["avgdl"])

        # -------------------------------------------------- postings_raw/
        postings_path = os.path.join(index_dir, "postings_raw")
        if not (resume and os.path.exists(os.path.join(postings_path, "_SUCCESS"))):
            toks = tokens_df.select(
                "doc_id",
                F.col("doclen").alias("dl"),
                F.posexplode("tokens").alias("pos", "term"),
            )
            aggs = [
                F.count("*").cast("int").alias("tf"),
                F.first("dl").alias("dl"),
            ]
            if cfg.store_positions:
                aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
            (
                toks.groupBy("term", "doc_id")
                .agg(*aggs)
                .write.mode("overwrite")
                .parquet(postings_path)
            )
        stages["postings"] = round(time.time() - t0 - sum(stages.values()), 2)
        postings = self.spark.read.parquet(postings_path)

        # ---------------------------------------------------------- terms/
        if not (resume and store.stage_done("terms")):
            dict_df = postings.groupBy("term").agg(
                F.count("*").cast("long").alias("df"),
                F.sum("tf").cast("long").alias("cf"),
            )
            dict_df = assign_dense_ids(dict_df, "term", "term_id", shuffle_parts)
            (
                dict_df.withColumn("idf", bm25_idf(n_docs, F.col("df")))
                .select("term", "term_id", "df", "cf", "idf")
                .write.mode("overwrite")
                .parquet(store.terms_path)
            )
        terms = self.spark.read.parquet(store.terms_path)
        n_terms = terms.count()
        stages["terms"] = round(time.time() - t0 - sum(stages.values()), 2)

        # ------------------------------------------------ segments/bucket=K
        width = max(1, math.ceil(n_terms / n_buckets))
        done = store.completed_buckets() if resume else {}
        writer = _segment_writer(cfg, avgdl)
        total_postings = 0
        for k in range(n_buckets):
            lo, hi = k * width, min((k + 1) * width, n_terms)
            if lo >= n_terms:
                break
            if k in done and os.path.exists(store.bucket_dir(k)):
                total_postings += done[k].n_postings
                continue
            bt0 = time.time()
            bucket_terms = terms.where(
                (F.col("term_id") >= lo) & (F.col("term_id") < hi)
            ).select("term", "term_id", "idf")
            pos_cols = ["positions"] if "positions" in postings.columns else []
            joined = postings.join(F.broadcast(bucket_terms), "term").select(
                "term_id", "doc_id", "tf", "dl", "idf", *pos_cols
            )
            segs = (
                joined.repartitionByRange(shuffle_parts, "term_id", "doc_id")
                .sortWithinPartitions("term_id", "doc_id")
                .mapInPandas(writer, SEGMENT_SCHEMA)
            )
            segs.write.mode("overwrite").parquet(store.bucket_dir(k))
            # bucket metrics from the committed files (cheap: footer stats +
            # small agg), then the crash-safe ledger line
            written = self.spark.read.parquet(store.bucket_dir(k))
            m = written.agg(
                F.countDistinct("term_id").alias("nt"),
                F.count("*").alias("nb"),
                F.sum("n_docs").alias("np"),
                F.sum(
                    F.length("docs") + F.length("tfs") + F.length("dls")
                    + F.length("pos_counts") + F.length("positions")
                ).alias("bytes"),
            ).collect()[0]
            elapsed = time.time() - bt0
            store.append_bucket(
                BucketRecord(
                    bucket=k,
                    term_id_lo=lo,
                    term_id_hi=hi,
                    n_terms=int(m["nt"]),
                    n_blocks=int(m["nb"]),
                    n_postings=int(m["np"] or 0),
                    bytes_payload=int(m["bytes"] or 0),
                    elapsed_sec=elapsed,
                    terms_per_sec=(int(m["nt"]) / elapsed if elapsed > 0 else 0.0),
                    postings_per_sec=(int(m["np"] or 0) / elapsed if elapsed > 0 else 0.0),
                    input_snapshot=input_snapshot,
                )
            )
            total_postings += int(m["np"] or 0)
            if fail_after_bucket is not None and k >= fail_after_bucket:
                raise RuntimeError(f"injected failure after bucket {k}")

        stages["segments"] = round(time.time() - t0 - sum(stages.values()), 2)
        build_seconds = time.time() - t0
        manifest = Manifest(
            n_docs=n_docs,
            avgdl=avgdl,
            n_terms=int(n_terms),
            config=__import__("json").loads(cfg.to_json()),
            build_seconds=build_seconds,
            docs_per_sec=n_docs / build_seconds if build_seconds > 0 else 0.0,
            postings_total=total_postings,
            input_snapshot=input_snapshot,
            stages=stages,
        )
        manifest.save(index_dir)
        return manifest
