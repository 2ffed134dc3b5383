"""spark-submit entry: full index build over the deterministic synthetic
pages corpus (extract → tokenize → postings → dictionary → compressed
segments), reporting docs/sec. This is the north-rule scaling job — run it
at two parallelism levels on identical input:

    spark-submit --master local[8]  --py-files gloomy_spark.zip bench/build_job.py --docs 60000
    spark-submit --master local[32] --py-files gloomy_spark.zip bench/build_job.py --docs 60000

Prints one JSON line with build stats.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=60_000)
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--n-buckets", type=int, default=2)
    ap.add_argument("--queries", type=int, default=10, help="BM25 queries to run after build")
    ap.add_argument("--keep", default="", help="keep index at this dir")
    ap.add_argument("--index-dir", default="",
                    help="serve-only: skip the build, load this index")
    ap.add_argument("--bucket-width", type=int, default=0,
                    help="doc_bucket_width override (0 = config default); "
                         "smaller widths emulate large-corpus bucket counts")
    ap.add_argument("--conc-clients", type=int, default=400,
                    help="concurrent clients for the micro-batched serving "
                         "phase (each issues one query)")
    ap.add_argument("--conc-window-ms", type=float, default=50.0,
                    help="micro-batch coalescing window (latency/throughput "
                         "trade: longer windows mean fewer, larger batches)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("gloomy-build-job").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from gloomy_spark.build import IndexBuilder, extracted_docs
    from gloomy_spark.config import EngineConfig
    from gloomy_spark.corpus import pages_df
    from gloomy_spark.query.engine import SearchIndex

    parts = args.partitions or cores * 2
    cfg_kw = {"shuffle_partitions": max(cores * 2, 8)}
    if args.bucket_width:
        cfg_kw["doc_bucket_width"] = args.bucket_width
    cfg = EngineConfig(**cfg_kw)

    corpus_dir = None
    if args.index_dir:
        # serve-only mode: measure query scaling against a prebuilt index
        from gloomy_spark.index_store import Manifest

        out = args.index_dir
        manifest = Manifest.load(out)
        build_sec = 0.0
    else:
        out = args.keep or tempfile.mkdtemp(prefix="gloomy_bench_idx_")
        # corpus generation is NOT timed (it stands in for reading the
        # Iceberg pages table); materialize it to parquet first
        corpus_dir = tempfile.mkdtemp(prefix="gloomy_bench_corpus_")
        pages_df(spark, args.docs, partitions=parts).write.mode("overwrite").parquet(corpus_dir)
        pages = spark.read.parquet(corpus_dir)

        t0 = time.time()
        docs = extracted_docs(pages)
        manifest = IndexBuilder(spark, cfg).build(
            docs, out, url_col="url", lang_col="lang",
            n_buckets=args.n_buckets, resume=False,
            input_snapshot=f"synthetic:{args.docs}",
        )
        build_sec = time.time() - t0

    qsec = 0.0
    bsec = 0.0
    n_batch = 0
    n_conc = 0
    n_conc_batches = 0
    if args.queries:
        from concurrent.futures import ThreadPoolExecutor

        import numpy as np

        from gloomy_spark.corpus import build_vocab
        from gloomy_spark.query.microbatch import Bm25MicroBatcher

        si = SearchIndex(spark, out).cache()
        vocab = build_vocab()

        def zipf_queries(n: int, seed: int) -> list[str]:
            rng = np.random.default_rng(seed)
            probs = 1.0 / np.arange(1, len(vocab) + 1, dtype=np.float64) ** 0.7
            probs /= probs.sum()
            return [
                " ".join(
                    vocab[i]
                    for i in rng.choice(
                        len(vocab), size=int(l), replace=False, p=probs
                    )
                )
                for l in rng.integers(1, 5, size=n)
            ]

        # concurrent serving model (micro-batched since round 4): N
        # concurrent clients each issue ONE per-query request through
        # Bm25MicroBatcher — arrivals within the 50 ms window coalesce
        # into a handful of bm25_topk_batch jobs, so the per-job
        # scheduling floor amortizes and concurrent throughput tracks
        # batch throughput instead of the per-job floor (which measured
        # 0.55-0.62 N→4N for two rounds). DISTINCT Zipf queries (seed
        # differs from the batch workload). 400 clients: small client
        # counts re-measure the per-batch fixed cost (pushdown scan +
        # task dispatch), not scoring scaling — the same reason the
        # batch protocol uses 1000 queries.
        n_conc = min(args.queries, args.conc_clients)
        qs = zipf_queries(n_conc, seed=11)
        mb = Bm25MicroBatcher(si, window_ms=args.conc_window_ms)
        # untimed warmup: the first applyInPandas job pays python-worker
        # spawn + codegen compile once per session — a serving process
        # warms up once, so neither timed phase should carry it
        si.bm25_topk_batch([qs[0] if qs else vocab[0]], 1).collect()
        qsec = 0.0
        if n_conc:
            # all clients release together (main thread holds the barrier
            # and stamps t0 at release): without it the burst straggles
            # over thread-spawn time, and whether it coalesced into 1 or
            # 2 micro-batches varied WITH CLUSTER SIZE (spawn races the
            # first batch's start) — a protocol artifact that swung the
            # N→4N concurrent ratio by ±0.2 between runs
            import threading

            gate = threading.Barrier(n_conc + 1)

            def client(q):
                gate.wait()
                return mb.query(q, 10)

            with ThreadPoolExecutor(max_workers=n_conc) as ex:
                futs = [ex.submit(client, q) for q in qs]
                gate.wait()
                tq = time.time()
                for f in futs:
                    f.result()
                qsec = time.time() - tq
        n_conc_batches = mb.batches_run
        # batched serving model: ALL queries in ONE job — the per-query
        # scheduling floor amortizes, so this is the number that should
        # scale with cores. DISTINCT Zipf-sampled queries (seeded): the
        # batch scorer memoizes identical term-sets, so a repeated-query
        # workload would measure memoization, not scoring throughput.
        n_batch = max(args.queries, 40)
        batch_qs = zipf_queries(n_batch, seed=7)
        tb = time.time()
        si.bm25_topk_batch(batch_qs, 10).collect()
        bsec = time.time() - tb

    print(json.dumps({
        "docs": manifest.n_docs,
        "terms": manifest.n_terms,
        "postings": manifest.postings_total,
        "cores": cores,
        "stages": manifest.stages,
        "build_sec": round(build_sec, 2),
        "docs_per_sec": round(manifest.n_docs / build_sec, 1) if build_sec else None,
        "query_sec_total": round(qsec, 2),
        "queries_per_sec": round(n_conc / qsec, 2) if qsec else None,
        "conc_queries": n_conc,
        "conc_batches": n_conc_batches,
        "batch_queries": n_batch,
        "batch_query_sec": round(bsec, 2),
        "batch_queries_per_sec": round(n_batch / bsec, 2) if bsec else None,
    }))
    if not args.keep and not args.index_dir:
        shutil.rmtree(out, ignore_errors=True)
    if corpus_dir:
        shutil.rmtree(corpus_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
