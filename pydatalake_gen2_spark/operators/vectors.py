"""Vector operations over ARRAY<FLOAT> embedding columns (L03/L04/L09).

All JVM-side via higher-order functions (zip_with/aggregate/transform) —
no Python in the hot path. Floats are widened to double BEFORE any
arithmetic so results are IEEE-deterministic and match an oracle that
computes in double.

Scale path: brute-force cosine is a broadcast-join + codegen'd HOF —
linear in corpus size, embarrassingly parallel, no shuffle. For 100 TB
corpora, operators/similarity.py layers LSH bucketing on top.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right sum of products — bit-identical to
    DuckDB's list_dot_product on DOUBLE[]."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda s, x: s + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalize(a: Column) -> Column:
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)
