"""Benchmark harness (driver contract): runs the headline operators at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Headline groups:
- index build over the sf documents table (docs/sec) + WAND BM25 queries;
- a synthetic-corpus build at SPARK_GRAFT_BENCH_DOCS (default 30k) pages —
  the north-rule throughput number on realistic web-page inputs;
- dedup / similarity / textstats operator timings.

Scaling evidence (local[8] vs local[32]) is produced by
bench/scaling.py (separate JVMs per cluster size) and recorded in
BENCH/BASELINE.md; if BENCH/scaling.json exists its summary is embedded
in the JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "30000"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gloomy-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from gloomy_spark.build import IndexBuilder, extracted_docs
    from gloomy_spark.config import EngineConfig
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.entry_queries import registry
    from gloomy_spark.query.engine import SearchIndex

    # doc_bucket_width sized so bench corpora get MANY doc buckets — the
    # regime of big corpora (10^12 docs / default 2^20 width ≈ 10^6
    # buckets); serving parallelism comes from bucket count
    cfg = EngineConfig(
        shuffle_partitions=max(cpus * 2, 16), doc_bucket_width=1 << 9
    )
    timings: dict[str, float] = {}
    extra: dict[str, object] = {}

    def timed(name: str, fn):
        t = time.time()
        out = fn()
        timings[name] = round(time.time() - t, 3)
        return out

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # ---- index build over sf documents + queries ----
    idx_dir = tempfile.mkdtemp(prefix="gloomy_bench_sfidx_")
    manifest = timed(
        "q_build_index_sf",
        lambda: IndexBuilder(
            spark, cfg
        ).build(docs, idx_dir, n_buckets=2, resume=False, lang_col="lang"),
    )
    extra["sf_docs"] = manifest.n_docs
    extra["sf_docs_per_sec"] = round(manifest.n_docs / timings["q_build_index_sf"], 1)
    si = SearchIndex(spark, idx_dir).cache()

    bm25_queries = [
        "scan filter window the", "merge", "join hash batch",
        "customer order line", "slow fast", "the a", "sort key value",
        "group query row data", "spark table column", "part small",
    ]

    def run_wand():
        for q in bm25_queries:
            si.bm25_topk(q, 10).collect()

    timed("q_bm25_wand_10q", run_wand)
    extra["bm25_q_per_sec"] = round(len(bm25_queries) / timings["q_bm25_wand_10q"], 2)

    # batched serving: all 40 queries in ONE Spark job (shared segments
    # scan + partitioned per-query top-k) — the throughput headline
    batch_qs = [bm25_queries[i % len(bm25_queries)] for i in range(40)]
    timed("q_bm25_batch_40q", lambda: si.bm25_topk_batch(batch_qs, 10).collect())
    extra["bm25_batch_q_per_sec"] = round(40 / timings["q_bm25_batch_40q"], 2)

    # driver-local serving (decoded-postings cache; falls back distributed
    # on head-heavy queries) — the interactive-latency headline
    def run_serve():
        for q in bm25_queries:
            si.bm25_serve(q, 10)

    run_serve()  # warm the postings cache once (steady-state serving)
    timed("q_bm25_serve_10q", run_serve)
    extra["bm25_serve_q_per_sec"] = round(
        len(bm25_queries) / max(timings["q_bm25_serve_10q"], 1e-9), 1
    )
    timed("q_postings_decode", lambda: si.postings("scan").count())
    timed("q_prefix_search", lambda: si.search_prefix("s").collect())
    timed("q_regexp_search", lambda: si.search_regexp("s[ct]an").collect())
    # search-result Args (on-the-fly postings⨝docs path; the rollup path
    # is build-time and covered by tests)
    timed(
        "q_term_attr_counts",
        lambda: si.term_attr_counts(["the", "data", "scan"], ["lang"]).count(),
    )
    timed("q_phrase_match", lambda: si.phrase_match("merge group table").count())
    timed(
        "q_boolean_search",
        lambda: si.boolean_search(["scan", "filter"], (), ["slow"]).count(),
    )
    timed("q_kwic", lambda: si.kwic("data", docs, width=3).count())
    # head-term KWIC: tracks the tokenize-once plan shape (r5,
    # BENCH/kwic_ab.json) — per-hit work dominates here, not the join
    timed("q_kwic_head", lambda: si.kwic("the", docs, width=3).count())
    timed(
        "q_collocations",
        lambda: si.collocations("data", docs, window=3, min_freq=3).count(),
    )
    timed(
        "q_bm25_filtered",
        lambda: si.bm25_topk_filtered(
            "scan filter window", 10, "lang", ["en", "de"]
        ).collect(),
    )
    shutil.rmtree(idx_dir, ignore_errors=True)

    # ---- operator suite from the driver registry ----
    reg = registry()
    for name in [
        "unigram_counts", "bigram_counts", "term_dictionary", "bm25_topk",
        "dedup_exact_groups", "minhash_lsh_pairs", "simhash_values",
        "ann_cosine_topk", "language_id", "quality_score",
        "token_counts", "doc_fingerprint", "media_features",
    ]:
        fn, _sql = reg[name]
        timed(f"q_{name}", lambda fn=fn: fn(spark, sf_dir).count())

    # near-dup dedup at bench scale: LSH candidates + exact jaccard rerank
    # (all-pairs exact jaccard is the sf0.01 oracle entry, not the scale path)
    from gloomy_spark.ops.dedup import lsh_jaccard_pipeline

    timed(
        "q_dedup_lsh_jaccard",
        lambda: lsh_jaccard_pipeline(docs, shingle_k=2, threshold=0.3).count(),
    )

    # ---- synthetic web-corpus build (north-rule headline) ----
    corpus_dir = tempfile.mkdtemp(prefix="gloomy_bench_corpus_")
    pages_df(spark, bench_docs, partitions=cpus * 2).write.mode("overwrite").parquet(corpus_dir)
    pages = spark.read.parquet(corpus_dir)
    idx2 = tempfile.mkdtemp(prefix="gloomy_bench_synidx_")

    def build_synth():
        d = extracted_docs(pages)
        return IndexBuilder(spark, cfg).build(
            d, idx2, url_col="url", lang_col="lang", n_buckets=2, resume=False
        )

    m2 = timed("q_build_index_pages", build_synth)
    extra["pages_docs"] = m2.n_docs
    extra["pages_docs_per_sec"] = round(m2.n_docs / timings["q_build_index_pages"], 1)
    extra["pages_postings"] = m2.postings_total
    shutil.rmtree(idx2, ignore_errors=True)
    shutil.rmtree(corpus_dir, ignore_errors=True)

    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    # Embed HEADLINE scaling fields only. Round 4 embedded the whole files
    # (epoch_history + prose notes) and the single stdout line outgrew the
    # driver's tail capture, leaving BENCH_r04.json unparsed — the full
    # records stay in BENCH/*.json; this line must stay machine-readable.
    _headline = (
        "docs", "n_cores", "4n_cores", "build_sec_n", "build_sec_4n",
        "docs_per_sec_n", "docs_per_sec_4n", "scaling_efficiency",
        "batch_queries", "batch_query_sec_n", "batch_query_sec_4n",
        "batch_queries_per_sec_n", "batch_queries_per_sec_4n",
        "batch_query_scaling_efficiency", "concurrent_queries",
        "concurrent_query_sec_n", "concurrent_query_sec_4n",
        "concurrent_query_scaling_efficiency",
    )
    for key, fname in (("scaling", "scaling.json"), ("query_scaling", "query_scaling.json")):
        p = os.path.join(bench_dir, fname)
        if os.path.exists(p):
            with open(p) as f:
                full = json.load(f)
            extra[key] = {k: full[k] for k in _headline if k in full}

    total = round(sum(timings.values()), 2)
    print(
        json.dumps(
            {
                "metric": "gloomy-spark index-build + BM25 + training-data ops suite",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                **extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
