"""Parse an (uncompressed) Spark event log: per labelled-job breakdown.

For each job whose description starts with ``timed:``, prints job wall
time, scheduling gaps between consecutive jobs, and the slowest stages
(duration, task count, total task time) — the local stand-in for the
Spark UI's Stages tab (guide §7.1) with the UI disabled.

Usage: python tools/evlog_parse.py <eventlog-file-or-rolling-dir>
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import defaultdict


def load_events(path: str):
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "events*")))
    else:
        files = [path]
    for f in files:
        for line in open(f, errors="replace"):
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


def main() -> None:
    path = sys.argv[1]
    jobs = {}
    stages = []
    task_time = defaultdict(float)
    for e in load_events(path):
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "t0": e["Submission Time"],
                "desc": (e.get("Properties") or {}).get("spark.job.description") or "",
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
            }
        elif ev == "SparkListenerJobEnd":
            j = jobs.get(e["Job ID"])
            if j:
                j["t1"] = e["Completion Time"]
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages.append(
                (
                    si["Stage ID"],
                    si["Stage Name"],
                    si.get("Submission Time", 0),
                    si.get("Completion Time", 0),
                    si["Number of Tasks"],
                )
            )
        elif ev == "SparkListenerTaskEnd":
            ti = e.get("Task Info", {})
            task_time[e["Stage ID"]] += (
                ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            ) / 1000

    by_desc = defaultdict(list)
    for k, v in jobs.items():
        if "t1" in v and v["desc"].startswith("timed:"):
            by_desc[v["desc"]].append((k, v))

    for desc in sorted(by_desc):
        js = sorted(by_desc[desc])
        t0 = min(v["t0"] for _, v in js)
        t1 = max(v["t1"] for _, v in js)
        wall = (t1 - t0) / 1000
        jsum = sum((v["t1"] - v["t0"]) / 1000 for _, v in js)
        gaps = []
        prev = None
        for _, v in js:
            if prev is not None:
                gaps.append((v["t0"] - prev) / 1000)
            prev = v["t1"]
        print(f"\n=== {desc}  wall={wall:.3f}s  jobs={len(js)} "
              f"jobsum={jsum:.3f}s  inter-job-gap={sum(gaps):.3f}s")
        sids = {s for _, v in js for s in v["stages"]}
        ss = [(sid, nm, (ct - st) / 1000, nt, task_time[sid])
              for sid, nm, st, ct, nt in stages if sid in sids]
        ss.sort(key=lambda x: -x[2])
        for sid, nm, dur, nt, tt in ss[:12]:
            print(f"  stage {sid:4d} {dur:7.3f}s tasks={nt:3d} "
                  f"tasktime={tt:7.3f}s  {nm[:70]}")
        rest = ss[12:]
        if rest:
            print(f"  ... {len(rest)} more stages, "
                  f"dur sum {sum(s[2] for s in rest):.3f}s")


if __name__ == "__main__":
    main()
