"""Dump .explain("formatted") for the round-6-touched queries into
plans/r06/<name>_<tag>.txt. Run once from the round-start worktree with
tag=before and once from the optimized tree with tag=after:

    PYTHONPATH=<tree> python bench/plans_r06.py <tag> [sf_dir] [out_dir]

Entries whose registry fn collects driver-side rows (bm25_wand_topk &c.)
are represented by the underlying engine call instead.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06",
    )
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"plans-r06-{tag}")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: str, df) -> None:
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        p = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(txt)
        print("wrote", p)

    from gloomy_spark.entry_queries import registry, _index_for, _docs

    reg = registry()
    for name in [
        "bm25_topk", "term_dictionary", "unigram_counts", "bigram_counts",
        "doc_stats", "postings_exact", "term_positions",
        "minhash_lsh_pairs", "simhash_values", "jaccard_pairs",
        "media_features",
    ]:
        fn, _ = reg[name]
        dump(name, fn(spark, sf_dir))

    # engine single-query BM25 (what q_bm25_wand_10q times per query)
    si = _index_for(spark, sf_dir)
    try:
        si.cache()
    except Exception:
        pass
    dump("bm25_index_topk", si.bm25_topk("scan filter window the", 10))

    # the LSH->jaccard rerank pipeline (q_dedup_lsh_jaccard)
    from gloomy_spark.ops.dedup import lsh_jaccard_pipeline

    dump(
        "dedup_lsh_jaccard",
        lsh_jaccard_pipeline(_docs(spark, sf_dir), shingle_k=2, threshold=0.3),
    )
    spark.stop()


if __name__ == "__main__":
    main()
