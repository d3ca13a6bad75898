"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Everything is backed by the QueryPair registry in
``pydatalake_gen2_spark.registry`` — one entry per implemented operator
from SURVEY.md §2B, with the DuckDB oracle SQL carried alongside the
Spark implementation so the contract stays auditable in one place.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pydatalake_gen2_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape, SURVEY.md §7.1) on sf0.001."""
    reg = load_all()
    return reg["g02_groupby_agg"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qp.spark_fn for name, qp in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every hash-matched (tier-H) query; tier-P/S
    entries are omitted → driver records the weaker rows-only check."""
    return {
        name: qp.duck_sql
        for name, qp in sorted(load_all().items())
        if qp.duck_sql is not None
    }
