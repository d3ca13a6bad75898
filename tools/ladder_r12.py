"""Round-12 decade ladder: re-measure the heavy paths the r12 edits target
(gr11 frontier BFS, l36/l59/l60 row-local shingle dedup, lx_lsh local
top-k prune, gr04 frontier BFS) at sf10 and sf30.

Usage: python tools/ladder_r12.py [sf_dir ...]  (default fixtures/sf10 fixtures/sf30)
Protocol matches tools/ladder_r11.py (one session, count() action,
release_persisted between queries) plus a WARM second run per query so
cold-JVM/codegen inflation is visible instead of footnoted. Run under
SPARK_DRIVER_MEM=64g (the r11 ladder's local-harness sizing note).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydatalake_gen2_spark.operators.util import release_persisted
from pydatalake_gen2_spark.registry import ensure_views, load_all
from pydatalake_gen2_spark.session import get_spark

QUERIES = [
    ("gr11_landmark_centrality", "rows"),
    ("l36_minhash_sql", "pairs"),
    ("l59_incremental_neardup", "pairs"),
    ("lx_lsh_topk", "rows"),
    ("gr04_bfs_distances", "rows"),
    ("l60_split_leakage", "rows"),
]


def main() -> None:
    dirs = sys.argv[1:] or ["fixtures/sf10", "fixtures/sf30"]
    reg = load_all()
    spark = get_spark("ladder-r12")
    for sf_dir in dirs:
        ensure_views(spark, sf_dir)
        for name, counter in QUERIES:
            for run in ("cold", "warm"):
                t0 = time.time()
                out = reg[name].spark_fn(spark, sf_dir)
                n = out.count()
                wall = time.time() - t0
                release_persisted()
                print(
                    f"{sf_dir} {name} [{run}] {wall:.1f}s {counter}={n}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
