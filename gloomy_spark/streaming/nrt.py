"""Near-real-time serving: BM25 over the compacted segment index PLUS
uncompacted streaming runs — the segments+memtable story of real search
engines, without waiting for compaction.

Exactness contract (tested): `nrt_bm25_topk` returns the SAME top-k (ids
and scores) as rebuilding the whole index over the merged corpus. That
requires adjusting the GLOBAL statistics, not just unioning postings:

- a doc re-ingested in a run overrides its base version (same rule as
  `IncrementalIndexer.compact`: last run wins), so its base postings are
  excluded and its doclen replaced;
- n_docs / avgdl / per-term df are recomputed for the merged corpus —
  df(t) = df_base(t) − |overridden base docs containing t| + df_runs(t).

Costs are proportional to the QUERY TERMS' postings plus the run sizes
(runs are the recent tail — small relative to the base by design), never
to the base corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _latest_runs(spark: SparkSession, runs_dir: str) -> DataFrame:
    """Run postings with last-run-wins per doc (same rule as compact())."""
    runs = (
        spark.read.option("basePath", runs_dir)
        .parquet(os.path.join(runs_dir, "run=*"))
    )
    latest = runs.groupBy("doc_id").agg(F.max("run").alias("run"))
    return runs.join(latest, ["doc_id", "run"], "inner").drop("run")


def nrt_bm25_topk(
    si, runs_dir: str, query: str, k: int = 10
) -> DataFrame:
    """Top-k BM25 over base index ⊎ uncompacted runs (exact vs rebuild).

    `si` is a SearchIndex over the compacted base. Plan: one decode of the
    query terms' BASE postings, one scan of the (small) runs, broadcast-
    joined doc-override set, exact merged stats, JVM-side scoring,
    TakeOrdered top-k."""
    from ..textnorm import tokenize

    spark = si.spark
    cfg = si.cfg
    k1, b = cfg.bm25.k1, cfg.bm25.b
    toks = list(dict.fromkeys(tokenize(query, cfg)))
    if not toks:
        return spark.createDataFrame([], "doc_id long, score double")

    run_posts = _latest_runs(spark, runs_dir).select("term", "doc_id", "tf", "dl")
    run_docs = run_posts.groupBy("doc_id").agg(F.first("dl").alias("dl"))

    # ---- merged global stats ------------------------------------------
    base_docs = si.docs.select("doc_id", F.col("doclen").alias("dl"))
    overridden = base_docs.join(run_docs, "doc_id", "leftsemi")
    n_base = si.manifest.n_docs
    sum_base = si.manifest.avgdl * n_base
    ov = overridden.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
    ).collect()[0]
    rn = run_docs.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
    ).collect()[0]
    n_docs = n_base - int(ov["n"]) + int(rn["n"])
    avgdl = (sum_base - float(ov["s"]) + float(rn["s"])) / max(n_docs, 1)

    # ---- merged postings for the query terms --------------------------
    parts = []
    for t in toks:
        base_p = si.postings(t).select(
            F.lit(t).alias("term"), "doc_id", "tf", "dl"
        ).join(run_docs.select("doc_id"), "doc_id", "left_anti")
        parts.append(base_p)
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)  # anti-join put the key column first
    merged = merged.unionByName(
        run_posts.where(F.col("term").isin(toks)).select("term", "doc_id", "tf", "dl")
    )

    dfreq = merged.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = merged.join(F.broadcast(dfreq), "term").withColumn(
        "contrib",
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
