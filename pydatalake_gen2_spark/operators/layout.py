"""Z-order (Morton-curve) clustered write layout — S18.

One-dimensional sorted layouts (S13 range-partition) give perfect file
skipping on ONE column and none on the other. Interleaving the bits of
two columns' bucket numbers (the Morton / Z curve — the technique behind
Databricks Delta's OPTIMIZE ZORDER BY and the classic UB-tree) yields a
layout where files cover small RECTANGLES in (a, b) space, so footer
min/max zone maps prune files for predicates on EITHER column or both.

Implementation is pure Catalyst expressions (bit shifts + OR — all
whole-stage codegen, no UDFs):

1. Bucket each column to ``bits``-bit ordinals with width_bucket over
   the [min, max] range (equal-width; swap the boundaries for
   approxQuantile output when the distribution is skewed — the z-math is
   identical, only the bucket map changes).
2. Interleave the two ordinals' bits into a single z value.
3. repartitionByRange(n_files, z) → files own disjoint z ranges
   (rectangles), sortWithinPartitions(z) clusters row groups inside.

The min/max scan for the bucket domain is one cheap partial agg; at
100 TB use static domain knowledge or sketch stats instead. Lossless by
construction — only row placement changes; the S18 query pair
hash-matches read-back content against the oracle, and the file-skipping
property is asserted from real parquet footers in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton code: bit i of ``a`` → z bit 2i+1, bit i of ``b`` → z bit 2i."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)).cast("bigint"), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("bigint"), 2 * i)
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet z-ordered on (col_a, col_b)."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    n_buckets = 1 << bits
    # width_bucket yields 1..n+1; clamp the right edge and 0-base
    def bucket(c: str, lo, hi) -> Column:
        return F.least(
            F.width_bucket(F.col(c), F.lit(lo), F.lit(hi), F.lit(n_buckets)),
            F.lit(n_buckets),
        ).cast("int") - 1

    z = _interleave(bucket(col_a, lo_a, hi_a), bucket(col_b, lo_b, hi_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
