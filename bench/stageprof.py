"""Parse a Spark event log into a per-stage profile: wall time, summed
task executorRunTime (i.e. core-seconds), CPU time, GC, shuffle bytes,
and the idle fraction (1 - runTime / (cores * wall)) that exposes
scheduling waves / stragglers. Usage:

    spark-submit ... --conf spark.eventLog.enabled=true \
        --conf spark.eventLog.dir=/dev/shm/events ...
    python bench/stageprof.py /dev/shm/events/<app-id> [cores]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def _open_log(path):
    """Accept a plain event-log file, a rolling eventlog_v2 directory, or
    a .zstd-compressed segment (Spark 4 default; decompressed via
    pyarrow's bundled zstd — the container has no zstd CLI/module)."""
    import glob
    import io
    import os

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
        if not parts:
            raise FileNotFoundError(f"no events_* in {path}")
        path = parts[-1]
    if path.endswith(".zstd"):
        import pyarrow as pa

        return io.TextIOWrapper(
            pa.input_stream(path, compression="zstd"), encoding="utf-8"
        )
    return open(path)


def main() -> None:
    path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    stages: dict[tuple, dict] = {}
    tasks = defaultdict(lambda: defaultdict(float))
    with _open_log(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si.get("Stage Attempt ID", si.get("Attempt ID", 0)))
                stages[key] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "wall": (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3,
                    "n_tasks": si.get("Number of Tasks", 0),
                }
            elif t == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                tk = tasks[key]
                tk["run"] += m.get("Executor Run Time", 0) / 1e3
                tk["cpu"] += m.get("Executor CPU Time", 0) / 1e9
                tk["gc"] += m.get("JVM GC Time", 0) / 1e3
                tk["deser"] += m.get("Executor Deserialize Time", 0) / 1e3
                sw = m.get("Shuffle Write Metrics") or {}
                tk["sh_w"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                sr = m.get("Shuffle Read Metrics") or {}
                tk["sh_r"] += (
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                ) / 1e6
                inm = m.get("Input Metrics") or {}
                tk["in"] += inm.get("Bytes Read", 0) / 1e6
                om = m.get("Output Metrics") or {}
                tk["out"] += om.get("Bytes Written", 0) / 1e6
                tk["max_task"] = max(tk["max_task"], m.get("Executor Run Time", 0) / 1e3)

    rows = []
    for key, s in sorted(stages.items()):
        tk = tasks.get(key, {})
        wall = s["wall"]
        run = tk.get("run", 0.0)
        idle = 1.0 - run / (cores * wall) if wall > 0 else 0.0
        rows.append(
            (key[0], s["name"], s["n_tasks"], round(wall, 1), round(run, 1),
             round(tk.get("cpu", 0.0), 1), round(tk.get("gc", 0.0), 1),
             round(idle, 2), round(tk.get("max_task", 0.0), 1),
             round(tk.get("in", 0.0)), round(tk.get("sh_w", 0.0)),
             round(tk.get("sh_r", 0.0)), round(tk.get("out", 0.0)))
        )
    hdr = ("id", "name", "tasks", "wall", "run(core-s)", "cpu", "gc",
           "idle_frac", "max_task", "inMB", "shWMB", "shRMB", "outMB")
    print("\t".join(hdr))
    for r in rows:
        if r[3] >= 0.5:  # skip sub-second stages
            print("\t".join(str(x) for x in r))
    total_wall = sum(r[3] for r in rows)
    total_run = sum(r[4] for r in rows)
    print(f"# total stage wall {total_wall:.1f}s, core-seconds {total_run:.1f}, "
          f"cores {cores}, overall idle {1 - total_run / (cores * total_wall):.2f}")


if __name__ == "__main__":
    main()
