"""Weighted sampling operators for corpus construction.

Two primitives (the reference exposes no sampling surface — these are
task-brief training-pipeline extensions, SURVEY.md §2B.14):

- ``weighted_bernoulli``: P(keep) ∝ weight via a pure-integer hash
  comparison (the ``l18_weighted_sample`` core) — fraction-targeting,
  bit-deterministic, zero shuffle.
- ``weighted_reservoir_k``: EXACT-k weighted sample without replacement
  (Efraimidis & Spirakis 2006, "Weighted random sampling with a
  reservoir"): each row draws the key u^(1/w) from a deterministic
  per-row uniform u and the global top-k keys win. One TakeOrderedAndProject
  (per-partition local top-k, k rows per partition shuffled to the driver
  stage) — never a total sort, so k bounds the exchange at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = 4294967296  # 2^32


def _hash32(id_col: Column) -> Column:
    """First 32 md5 bits of the id as a BIGINT in [0, 2^32)."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def weighted_bernoulli(
    df: DataFrame, weight: Column, id_col: str, scale: int
) -> DataFrame:
    """Keep each row with probability min(1, weight/scale), decided by
    ``hash32(id) < weight * 2^32 / scale`` — integer arithmetic only, so
    the decision is identical across engines, partitionings, and retries
    (speculative-execution safe), and the predicate evaluates scan-side."""
    threshold = F.least(
        F.lit(_U32), weight.cast("bigint") * F.lit(_U32 // scale)
    )
    return df.filter(_hash32(F.col(id_col)) < threshold)


def weighted_reservoir_k(
    df: DataFrame, weight: Column, id_col: str, k: int
) -> DataFrame:
    """Exact-k weighted sample without replacement: rank by the
    Efraimidis-Spirakis key u^(1/w) (u uniform from md5(id), w > 0) and
    keep the k largest. Inclusion probability is proportional-to-size
    without replacement; the ordering is invariant to rescaling all
    weights (u^(1/(c*w)) is a monotone transform of u^(1/w)) — both
    property-tested. Returns the input columns plus ``es_key``.

    The deterministic u makes the "reservoir" a plain top-k: no RNG
    state, reruns and stragglers agree, and Spark executes it as
    TakeOrderedAndProject (local top-k per partition, k-row exchange)."""
    u = (_hash32(F.col(id_col)).cast("double") + F.lit(0.5)) / F.lit(float(_U32))
    key = F.pow(u, F.lit(1.0) / weight.cast("double"))
    return (
        df.withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), F.col(id_col))
        .limit(k)
    )
