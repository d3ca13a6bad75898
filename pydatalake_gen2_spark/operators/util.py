"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Ensure a DataFrame has at least defaultParallelism partitions.

    Heavy per-row work (HOF expressions, hashing, explodes) inherits the
    input's split count. A small local fixture arrives as ONE parquet
    split, so without this the whole pipeline runs in a single task. On a
    real cluster the scan already has far more splits than cores and this
    is a no-op — the branch costs one plan inspection, no job.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
