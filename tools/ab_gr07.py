"""Interleaved A/B for gr07_link_prediction (aggregate-first rewrite audit).

PYTHONPATH selects the variant; prints one JSON line with u01 probes
bracketing a median-of-3 noop-sink timing (bench protocol).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    label = sys.argv[1]
    from pydatalake_gen2_spark.operators.util import release_persisted
    from pydatalake_gen2_spark.registry import load_all
    from pydatalake_gen2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    spark = get_spark(f"ab-gr07-{label}")

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
    fn = reg["gr07_link_prediction"].spark_fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    release_persisted()
    out["runs"] = [round(r, 3) for r in runs]
    out["median"] = round(statistics.median(runs), 3)
    out["probe_end"] = u01_ratio()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
