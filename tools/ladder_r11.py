"""Round-11 decade-ladder extension (r10 verdict #7): the remaining heavy
constants with no sf30 point — gr11 landmark centrality (194 s at sf10)
and the two banded-MinHash paths l36/l59 — measured at sf10 AND sf30 in
ONE session (within-session ratios are the stat, BASELINE.md r7
protocol), with candidate-volume accounting so a super-linear exponent
can be attributed to candidate growth vs plan defect.

Usage: python tools/ladder_r11.py [sf_dir ...]  (default fixtures/sf10 fixtures/sf30)
Emits one line per (query, scale): wall seconds + volume counters.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydatalake_gen2_spark.operators.util import release_persisted
from pydatalake_gen2_spark.registry import ensure_views, load_all
from pydatalake_gen2_spark.session import get_spark


def main() -> None:
    dirs = sys.argv[1:] or ["fixtures/sf10", "fixtures/sf30"]
    reg = load_all()
    spark = get_spark("ladder-r11")
    for sf_dir in dirs:
        ensure_views(spark, sf_dir)
        for name, counter in (
            # gr11: fixed 8-landmark BFS panel — volume = result rows
            # (nodes reached); the fixed panel is what keeps work linear
            # in edges rather than nodes x landmarks growing with scale.
            ("gr11_landmark_centrality", "rows"),
            # l36: pure-SQL banded MinHash LSH — volume = emitted
            # near-dup pairs (candidate growth is the quadratic risk).
            ("l36_minhash_sql", "pairs"),
            # l59: incremental index probe — volume = emitted pairs;
            # O(batch x bucket) by design, never O(corpus^2).
            ("l59_incremental_neardup", "pairs"),
        ):
            t0 = time.time()
            out = reg[name].spark_fn(spark, sf_dir)
            n = out.count()
            wall = time.time() - t0
            release_persisted()
            print(f"{sf_dir} {name} {wall:.1f}s {counter}={n}", flush=True)


if __name__ == "__main__":
    main()
