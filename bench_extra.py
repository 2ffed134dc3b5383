"""Extra benchmarks for the optimization round (guide §1.4): per-stage
build timings, per-query noop-sink isolation, and plan capture.

NOT part of the driver contract — bench.py stays frozen; numbers from
here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py build-stages [sf_dir]
  python bench_extra.py noop <query_name> [sf_dir] [repeats]
  python bench_extra.py plan <query_name> <out_file> [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("gloomy-bench-extra")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def build_stages(sf_dir: str) -> None:
    from gloomy_spark.build import IndexBuilder
    from gloomy_spark.config import EngineConfig

    spark = _spark()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cfg = EngineConfig(shuffle_partitions=max(cpus * 2, 16), doc_bucket_width=1 << 9)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    idx_dir = tempfile.mkdtemp(prefix="gloomy_stageprof_")
    t = time.time()
    m = IndexBuilder(spark, cfg).build(
        docs, idx_dir, n_buckets=2, resume=False, lang_col="lang"
    )
    wall = time.time() - t
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps({"wall": round(wall, 2), "stages": m.stages,
                      "n_docs": m.n_docs, "postings": m.postings_total}))


def noop(name: str, sf_dir: str, repeats: int) -> None:
    from gloomy_spark.entry_queries import registry

    spark = _spark()
    fn, _ = registry()[name]
    out = []
    for _ in range(repeats):
        t = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.time() - t, 3))
    print(json.dumps({name: out}))


def plan(name: str, out_file: str, sf_dir: str) -> None:
    from gloomy_spark.entry_queries import registry

    spark = _spark()
    fn, _ = registry()[name]
    df = fn(spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out_file, "w") as f:
        f.write(txt)
    print(f"wrote {out_file} ({len(txt)} bytes)")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "build-stages":
        build_stages(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0")
    elif cmd == "noop":
        noop(
            sys.argv[2],
            sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf1.0",
            int(sys.argv[4]) if len(sys.argv) > 4 else 1,
        )
    elif cmd == "plan":
        plan(
            sys.argv[2],
            sys.argv[3],
            sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf1.0",
        )
    else:
        raise SystemExit(f"unknown command {cmd}")
