"""Query-serving scaling evidence: build the index ONCE, then run the
SAME serve-only spark-submit job at local[N] and local[4N] against it
(interleaved repeats, best-of). Isolates serving from the build, so the
measurement is cheap enough for several repeats.

The index is built with a doc_bucket_width that yields many doc buckets
even at bench corpus sizes — at 10^12 docs the default width gives ~10^6
buckets, so per-query scoring parallelism is the NORMAL regime; a 300k-doc
corpus under the default width collapses to ONE bucket and would measure a
single-task artifact instead of the engine.

Writes BENCH/query_scaling.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(cores: int, extra: list[str], shuffle_partitions: int | None = None,
            pin: bool = False) -> dict:
    tmp = "/dev/shm/gloomy_scaling"
    os.makedirs(tmp, exist_ok=True)
    env = dict(os.environ)
    env["TMPDIR"] = tmp
    cmd = [
        *(
            # optional hard CPU budget (see bench/scaling.py --pin:
            # local[N] caps task slots, not CPUs)
            ["taskset", "-c", ",".join(str(c) for c in range(cores))]
            if pin
            else []
        ),
        "/opt/spark/bin/spark-submit",
        "--master", f"local[{cores}]",
        "--conf", "spark.driver.memory=32g",
        "--conf", f"spark.local.dir={tmp}/spark-local",
        "--conf",
        f"spark.sql.shuffle.partitions={shuffle_partitions or max(cores * 2, 16)}",
        "--py-files", os.path.join(REPO, "gloomy_spark.zip"),
        os.path.join(REPO, "bench", "build_job.py"),
        *extra,
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=REPO)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"no JSON from spark-submit at local[{cores}]")
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1, help="small cluster size N")
    ap.add_argument("--docs", type=int, default=300_000)
    # official protocol since round 3: 1000 DISTINCT Zipf-sampled queries
    # (small batches measure fixed overhead, not scoring scaling)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--bucket-width", type=int, default=1 << 14,
                    help="docs per posting bucket (16384 → ~18 buckets at "
                         "300k docs, the multi-bucket regime of big corpora)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--pin", action="store_true")
    ap.add_argument("--index", default="",
                    help="reuse this prebuilt index dir (must match --docs/"
                         "--bucket-width; skips the build, kept on exit)")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from gloomy_spark.session import build_zip

    build_zip()

    reused = bool(
        args.index and os.path.exists(os.path.join(args.index, "manifest.json"))
    )
    if reused:
        idx = args.index
        sys.stderr.write(f"reusing index at {idx}\n")
    else:
        idx = args.index or tempfile.mkdtemp(
            prefix="gloomy_qscale_idx_", dir="/dev/shm"
        )
        shutil.rmtree(idx, ignore_errors=True)
        built = run_job(4, [
            "--docs", str(args.docs), "--queries", "0", "--n-buckets", "1",
            "--bucket-width", str(args.bucket_width), "--keep", idx,
        ])
        sys.stderr.write(
            f"index built: {built['docs']} docs, {built['postings']} postings\n"
        )

    serve = ["--index-dir", idx, "--queries", str(args.queries),
             "--bucket-width", str(args.bucket_width)]
    # SAME shuffle partitioning at both sizes, and ≥2× the scoring-group
    # count: with ~19 groups over 16 partitions, some partitions carry two
    # groups — a 2-wave straggler tax that only the multi-core run pays
    n_groups = max(1, args.docs // args.bucket_width) + 2
    sp = max(64, 2 * n_groups)
    smalls, bigs = [], []
    for i in range(args.repeats):
        smalls.append(run_job(args.n, serve, shuffle_partitions=sp, pin=args.pin))
        bigs.append(run_job(args.n * 4, serve, shuffle_partitions=sp, pin=args.pin))
        sys.stderr.write(
            f"repeat {i}: N batch={smalls[-1]['batch_query_sec']}s "
            f"4N batch={bigs[-1]['batch_query_sec']}s\n"
        )
    small = min(smalls, key=lambda r: r["batch_query_sec"])
    big = min(bigs, key=lambda r: r["batch_query_sec"])
    result = {
        "repeats": args.repeats,
        "pinned_cpus": bool(args.pin),
        "docs": args.docs,
        "bucket_width": args.bucket_width,
        "n_cores": args.n,
        "4n_cores": args.n * 4,
        "all_batch_sec_n": [r["batch_query_sec"] for r in smalls],
        "all_batch_sec_4n": [r["batch_query_sec"] for r in bigs],
        "batch_queries": small["batch_queries"],
        "batch_query_sec_n": small["batch_query_sec"],
        "batch_query_sec_4n": big["batch_query_sec"],
        "batch_queries_per_sec_n": small["batch_queries_per_sec"],
        "batch_queries_per_sec_4n": big["batch_queries_per_sec"],
        "batch_query_scaling_efficiency": round(
            (small["batch_query_sec"] / big["batch_query_sec"]) / 4.0, 3
        ),
        "concurrent_queries": small.get("conc_queries"),
        "concurrent_microbatches_n": small.get("conc_batches"),
        "concurrent_microbatches_4n": big.get("conc_batches"),
        "concurrent_query_sec_n": small["query_sec_total"],
        "concurrent_query_sec_4n": big["query_sec_total"],
        "concurrent_query_scaling_efficiency": round(
            (small["query_sec_total"] / big["query_sec_total"]) / 4.0, 3
        ),
    }
    # epoch history: the shared host drifts ±75% intra-day, so single
    # runs are not comparable — every run appends its predecessor's
    # headline to a rolling history instead of silently overwriting it
    out_path = os.path.join(REPO, "BENCH", "query_scaling.json")
    history = []
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            history = prev.get("epoch_history", [])
            history.append({
                k: prev.get(k)
                for k in (
                    "batch_query_scaling_efficiency",
                    "batch_query_sec_n", "batch_query_sec_4n",
                    "concurrent_query_scaling_efficiency",
                    "concurrent_query_sec_n", "concurrent_query_sec_4n",
                    "concurrent_microbatches_n",
                )
            })
            history = history[-12:]
        except (OSError, json.JSONDecodeError):
            pass
    result["epoch_history"] = history
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    if not reused:
        shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
