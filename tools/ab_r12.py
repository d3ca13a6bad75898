"""Interleaved A/B harness for round-12 edits (generic query list).

Run one variant per process, alternating, with PYTHONPATH selecting the
repo root (the base worktree vs /root/repo):

    PYTHONPATH=/tmp/repo_base python tools/ab_r12.py before q1 q2 ...
    PYTHONPATH=/root/repo     python tools/ab_r12.py after  q1 q2 ...

Same protocol as bench.py per query: 1 discarded warm-up, then
median-of-3 noop-sink runs, release_persisted() between queries; u01
probe (median-of-3 vs the 60 ms round-1 pin) at start and end so host
state is recorded with every sample. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    label = sys.argv[1]
    queries = sys.argv[2:]
    from pydatalake_gen2_spark.operators.util import release_persisted
    from pydatalake_gen2_spark.registry import load_all
    from pydatalake_gen2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    spark = get_spark(f"ab-r12-{label}")

    def u01_ratio() -> float:
        fn = reg["u01_union_all"].spark_fn
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        return round(statistics.median(runs) / 0.060, 2)

    out = {"variant": label, "probe_start": u01_ratio()}
    timings = {}
    for name in queries:
        fn = reg[name].spark_fn
        spark.sparkContext.setJobDescription(f"{label}:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_persisted()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)
        release_persisted()
    out["queries"] = timings
    out["probe_end"] = u01_ratio()
    out["total"] = round(sum(timings.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
