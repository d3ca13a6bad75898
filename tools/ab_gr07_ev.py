"""gr07 profile run: timed jobs labelled for evlog_parse, event log on.

Usage: PYTHONPATH=<variant> python tools/ab_gr07_ev.py <label> <evlog_dir>
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    label, evdir = sys.argv[1], sys.argv[2]
    from pydatalake_gen2_spark.operators.util import release_persisted
    from pydatalake_gen2_spark.registry import load_all
    from pydatalake_gen2_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    spark = get_spark(
        f"ab-gr07ev-{label}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
        },
    )

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
    spark.sparkContext.setJobDescription(f"warm:{label}")
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"timed:{label}:{i}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    release_persisted()
    out["runs"] = [round(r, 3) for r in runs]
    out["median"] = round(statistics.median(runs), 3)
    out["probe_end"] = u01_ratio()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
