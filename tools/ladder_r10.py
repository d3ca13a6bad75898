"""Round-10 decade-ladder extension (r9 verdict #7): er03 post-collapse and
the capped-default SimHash path, one decade beyond their single post-fix
point — sf10 and sf30 in ONE session (within-session ratios are the stat,
BASELINE.md r7 protocol), with candidate-volume accounting.

Usage: python tools/ladder_r10.py [sf_dir ...]   (default fixtures/sf10 fixtures/sf30)
Emits one line per (query, scale): wall seconds + volume counters.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pydatalake_gen2_spark.operators import dedup
from pydatalake_gen2_spark.operators.util import release_persisted
from pydatalake_gen2_spark.registry import ensure_views, load_all
from pydatalake_gen2_spark.session import get_spark


def main() -> None:
    dirs = sys.argv[1:] or ["fixtures/sf10", "fixtures/sf30"]
    reg = load_all()
    spark = get_spark("ladder-r10")
    for sf_dir in dirs:
        ensure_views(spark, sf_dir)
        # er03: blocked entity resolution end-to-end (post exact-dup
        # collapse). Volume counter: distinct output clusters.
        t0 = time.time()
        out = reg["er03_entity_clusters"].spark_fn(spark, sf_dir)
        n_rows = out.count()
        er03_s = time.time() - t0
        release_persisted()
        print(f"{sf_dir} er03_entity_clusters {er03_s:.1f}s rows={n_rows}",
              flush=True)
        # capped-default SimHash near-dup pairs (band_max_df=1000):
        # volume counter = emitted true pairs (the r8 sf10 row recorded
        # 439,754 pairs / 19.5 s for the same path).
        t0 = time.time()
        pairs = dedup.simhash_neardup_pairs(spark.table("documents"), r=4)
        n_pairs = pairs.count()
        sim_s = time.time() - t0
        release_persisted()
        print(f"{sf_dir} simhash_capped_default {sim_s:.1f}s pairs={n_pairs}",
              flush=True)
        # cap-drop accounting for the same corpus: how many band buckets
        # the default cap actually removed (dq08's audit path).
        t0 = time.time()
        n_hot = dedup.simhash_dropped_bands(
            spark.table("documents"), r=4, band_max_df=1000
        ).count()
        audit_s = time.time() - t0
        release_persisted()
        print(f"{sf_dir} simhash_dropped_bands {audit_s:.1f}s hot_buckets={n_hot}",
              flush=True)


if __name__ == "__main__":
    main()
