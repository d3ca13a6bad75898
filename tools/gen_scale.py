"""Generate a larger bench fixture by replicating sf0.1 with shifted keys.

Usage: python tools/gen_scale.py [factor] [out_dir]
       (default: factor 10 -> fixtures/sf1)

BENCH-ONLY data (SCALE.md / BASELINE.md validation runs at sf >= 1):
correctness stays on the driver-generated /root/testdata fixtures. Each
replica i shifts every key by i * (max_key + 1) so joins keep their
exact selectivity (one customer per order, one order per lineitem
group, FK closure preserved within a replica and disjoint across
replicas). Text and embeddings are perturbed per replica — every 2nd
word is replaced with a replica-salted token and one embedding
component is nudged — so near-dup/ANN operators see a 10x corpus, not
10 exact copies of one (exact copies would quadratically inflate
near-dup pair output and measure the wrong thing). Output files are
written with multiple row groups (Spark's default writer), so scans
parallelize the way real lake files do — the single-row-group layout
of the driver fixtures is itself a measured bench artifact (see
BASELINE.md, g02 root cause).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pydatalake_gen2_spark.session import get_spark
from pydatalake_gen2_spark.tables import load_table


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", f"sf{factor // 10}" if factor % 10 == 0 else f"sfx{factor}",
    )
    src = "/root/testdata/sf0.1"
    spark = get_spark("gen-scale")
    os.makedirs(out, exist_ok=True)

    # dims too small to matter: copy as-is
    for t in ("region", "nation"):
        load_table(spark, src, t).write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    shifts = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
        "documents": ["doc_id"],
    }
    # key spaces must shift consistently ACROSS tables (o_custkey by the
    # customer stride, l_suppkey by the supplier stride, ...)
    stride_col = {
        "c_custkey": "c_custkey", "o_custkey": "c_custkey",
        "user_id": "c_custkey",
        "s_suppkey": "s_suppkey", "l_suppkey": "s_suppkey",
        "p_partkey": "p_partkey", "l_partkey": "p_partkey",
        "o_orderkey": "o_orderkey", "l_orderkey": "o_orderkey",
        "event_id": "event_id", "vec_id": "vec_id", "doc_id": "doc_id",
    }
    strides: dict[str, int] = {}
    for t in ("customer", "supplier", "part", "orders", "events", "embeddings", "documents"):
        df = load_table(spark, src, t)
        key = [c for c in shifts[t] if stride_col[c] == c][0]
        strides[key] = df.agg(F.max(key)).first()[0] + 1

    for t, keys in shifts.items():
        base = load_table(spark, src, t)
        legs = []
        for i in range(factor):
            leg = base
            for c in keys:
                leg = leg.withColumn(c, F.col(c) + F.lit(i * strides[stride_col[c]]))
            if t == "documents" and i > 0:
                # replace every 2nd word with a replica-salted token:
                # 3-gram shingle Jaccard vs the original drops below any
                # near-dup threshold, so replicas are new documents
                leg = leg.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w, p: F.when(
                                p % 2 == 0,
                                F.concat(F.lit(f"r{i}x"), F.substring(w, 1, 4)),
                            ).otherwise(w),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text"))
            if t == "embeddings" and i > 0:
                # nudge two components deterministically: replicas are
                # near the original direction but not identical
                leg = leg.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, p: F.when(
                            p == (i % 64), x + F.lit(0.05 * ((i % 7) + 1))
                        ).when(
                            p == ((i * 13) % 64), x - F.lit(0.03 * ((i % 5) + 1))
                        ).otherwise(x).cast("float"),
                    ),
                )
            legs.append(leg)
        full = legs[0]
        for leg in legs[1:]:
            full = full.unionByName(leg)
        n_files = max(4, factor)
        full.repartition(n_files).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {factor}x written")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
