"""Phase profiler for the r11 optimization round.

For each named query, separates per-run wall time into:
  build    — Python DataFrame construction (registry spark_fn call)
  analyze  — df.schema (Catalyst analysis, no job)
  plan     — executedPlan materialization (optimize + physical planning)
  exec     — noop-sink write (includes AQE re-planning + codegen + jobs)

Methodology matches bench.py (warm-up discarded, median of N), but the
phases tell WHERE a heavy query's seconds live — driver-side plan work
vs executed stages — which decides between plan-truncation and
shuffle-removal optimizations (guide §1.1, §7.3).

Usage: python tools/profile_r11.py [name ...]   (default: top-cost set)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pydatalake_gen2_spark.operators.util import release_persisted  # noqa: E402
from pydatalake_gen2_spark.registry import load_all  # noqa: E402
from pydatalake_gen2_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "gr01_pagerank", "gr10_hits", "gr03_kcore", "g54_bootstrap_ci",
    "lx_ivfpq_topk", "l23_span_dedup", "l36_minhash_sql",
    "er03_entity_clusters", "gr07_link_prediction", "l17_decontaminate",
    "l31_semdedup", "l41_knn_label_propagation", "dq08_simhash_cap_audit",
    "lx_kmeans", "lx_pq_rerank", "lx_pq_topk", "g27_table_checksum",
    "l59_incremental_neardup", "l20_line_dedup", "g45_correlation_matrix",
    "lx_lsh_topk", "lx_simhash_neardup",
]
N_RUNS = 3


def profile(spark, fn, sf_dir: str) -> dict:
    runs = []
    for i in range(N_RUNS + 1):  # first run = warm-up, discarded
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        _ = df.schema
        t2 = time.perf_counter()
        _ = df._jdf.queryExecution().executedPlan()
        t3 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        release_persisted()
        if i > 0:
            runs.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3, t4 - t0))
    med = [round(statistics.median(r[i] for r in runs), 3) for i in range(5)]
    return dict(zip(["build", "analyze", "plan", "exec", "total"], med))


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    spark = get_spark("profile_r11")
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        out[name] = profile(spark, reg[name].spark_fn, sf_dir)
        print(name, json.dumps(out[name]), flush=True)
    print("TOTALS", json.dumps({
        k: round(sum(v[k] for v in out.values()), 3)
        for k in ["build", "analyze", "plan", "exec", "total"]
    }))


if __name__ == "__main__":
    main()
