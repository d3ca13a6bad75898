"""Dump .explain("formatted") for bench queries → plans/r12/<name>_<tag>.txt.

Usage: python tools/plans_r12.py <tag> [name ...]
Defaults to every BENCH_QUERIES entry when no names are given.
Plan generation is driver-side (no job execution), so this is safe to run
while other Spark work is in flight.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from bench import BENCH_QUERIES  # noqa: E402
from pydatalake_gen2_spark.registry import load_all  # noqa: E402
from pydatalake_gen2_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo/plans/r12")
    os.makedirs(out_dir, exist_ok=True)
    reg = load_all()
    spark = get_spark("plans_r12")
    for name in names:
        if name not in reg:
            print(f"skip {name}: not registered")
            continue
        try:
            df = reg[name].spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record the failure verbatim
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
