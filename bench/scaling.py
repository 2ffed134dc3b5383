"""Scaling-evidence harness (north rule: throughput scaling efficiency
≥0.8 between N and 4N executors, evidenced in-sandbox by running the SAME
spark-submit job at two parallelism levels on identical input).

Runs bench/build_job.py via spark-submit --py-files at local[N] and
local[4N], computes efficiency = (T_N / T_4N) / 4, writes
BENCH/scaling.json and refreshes the results table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cores: int, docs: int, queries: int = 10) -> dict:
    env = dict(os.environ)
    cmd = [
        "/opt/spark/bin/spark-submit",
        "--master", f"local[{cores}]",
        "--conf", "spark.driver.memory=24g",
        "--conf", f"spark.sql.shuffle.partitions={max(cores * 2, 16)}",
        "--py-files", os.path.join(REPO, "gloomy_spark.zip"),
        os.path.join(REPO, "bench", "build_job.py"),
        "--docs", str(docs),
        "--queries", str(queries),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"no JSON from spark-submit at local[{cores}]")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="small cluster size N")
    ap.add_argument("--docs", type=int, default=60_000)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from gloomy_spark.session import build_zip

    build_zip()

    small = run_at(args.n, args.docs)
    big = run_at(args.n * 4, args.docs)
    t_n, t_4n = small["build_sec"], big["build_sec"]
    eff = (t_n / t_4n) / 4.0
    q_eff = None
    if small.get("query_sec_total") and big.get("query_sec_total"):
        q_eff = (small["query_sec_total"] / big["query_sec_total"]) / 4.0
    result = {
        "docs": args.docs,
        "n_cores": args.n,
        "4n_cores": args.n * 4,
        "build_sec_n": t_n,
        "build_sec_4n": t_4n,
        "docs_per_sec_n": small["docs_per_sec"],
        "docs_per_sec_4n": big["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "query_scaling_efficiency": round(q_eff, 3) if q_eff else None,
        "queries_per_sec_n": small.get("queries_per_sec"),
        "queries_per_sec_4n": big.get("queries_per_sec"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
