"""Fixture tables: explicit schemas, loaders, temp-view registration.

Schemas are pinned to the parquet footers documented in FIXTURES.md —
explicit ``StructType`` (via DDL strings) rather than inference, so the
engine and the DuckDB oracle bind to identical types. Replaces the
reference's schema-less byte-stream reads
(/root/reference/azure/datalake/gen2/client.py:528-546 `read_path`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Spark DDL schema per table (FIXTURES.md, read from parquet footers).
TABLES: dict[str, str] = {
    "region": "r_regionkey INT, r_name STRING",
    "nation": "n_nationkey INT, n_name STRING, n_regionkey INT",
    "supplier": "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE",
    "customer": (
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, "
        "c_acctbal DOUBLE, c_mktsegment STRING"
    ),
    "part": (
        "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, "
        "p_size INT, p_retailprice DOUBLE"
    ),
    "orders": (
        "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority STRING"
    ),
    "lineitem": (
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INT, "
        "l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag STRING, l_linestatus STRING, l_shipdate TIMESTAMP"
    ),
    # ts unit varies across fixture generations (TIMESTAMP(NANOS) vs
    # TIMESTAMP(MICROS)); load_table sniffs the parquet footer and reads
    # NANOS as BIGINT (nanosAsLong conf) truncated to µs — matching
    # DuckDB's read — while MICROS maps to TimestampType natively.
    "events": (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    ),
    "documents": "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    "embeddings": "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _events_ts_is_nanos(path: str) -> bool:
    """Footer-only probe (no data read) for the events.ts parquet unit.
    Handles both a single parquet file (driver fixtures) and a directory
    of part files (any real lake layout, tools/gen_scale.py output) —
    one footer decides for the table."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        if not parts:
            return False
        path = os.path.join(path, parts[0])
    return getattr(pq.read_schema(path).field("ts").type, "unit", None) == "ns"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with its pinned schema."""
    path = table_path(sf_dir, name)
    schema = TABLES[name]
    if name == "events" and _events_ts_is_nanos(path):
        # TIMESTAMP(NANOS) parquet: read the raw int64 (nanosAsLong conf)
        # and truncate to µs, same as DuckDB's read of TIMESTAMP(NANOS).
        schema = schema.replace("ts TIMESTAMP", "ts BIGINT")
        return spark.read.schema(schema).parquet(path).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.schema(schema).parquet(path)


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register fixture tables as temp views for the SQL surface.

    Lazy: registration reads only parquet footers; scans happen at action
    time with Catalyst's pushdown/pruning intact.
    """
    out: dict[str, DataFrame] = {}
    for name in names or list(TABLES):
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
