"""Set operations — SURVEY.md §2B.7 (U01-U05)."""

from __future__ import annotations

from pydatalake_gen2_spark.registry import sql_pair

sql_pair(
    "u01_union_all",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)

sql_pair(
    "u02_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)

sql_pair(
    "u03_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)

sql_pair(
    "u04_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)

sql_pair(
    "u05_intersect_except_all",
    """
    SELECT nationkey, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT l_suppkey AS nationkey FROM lineitem WHERE l_linenumber = 1
      INTERSECT ALL
      SELECT l_suppkey AS nationkey FROM lineitem WHERE l_linenumber = 2
    ) t GROUP BY nationkey
    """,
)


# u07 uses the DataFrame API (unionByName with allowMissingColumns), so it
# registers a function rather than a pure SQL pair.
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pydatalake_gen2_spark.registry import register  # noqa: E402


@register(
    "u07_union_by_name_missing",
    duck_sql="""
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL BY NAME
    SELECT o_orderkey, NULL AS o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    ORDER BY o_orderkey
    """,
)
def u07_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of frames with DIFFERENT column sets — unionByName
    (allowMissingColumns=True) NULL-fills the absent side, matching
    DuckDB's UNION ALL BY NAME. The schema-drift-tolerant append every
    multi-generation lake pipeline needs (the relational twin of s15's
    mergeSchema read)."""
    orders = spark.table("orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    b = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b, allowMissingColumns=True).orderBy("o_orderkey")


sql_pair(
    "u08_union_type_widening",
    """
    SELECT k, CAST(v AS DOUBLE) AS v FROM (
      SELECT 'int' AS k, CAST(l_linenumber AS INT) AS v FROM lineitem WHERE l_orderkey < 50
      UNION ALL
      SELECT 'big' AS k, CAST(l_orderkey AS BIGINT) AS v FROM lineitem WHERE l_orderkey < 50
      UNION ALL
      SELECT 'dbl' AS k, l_quantity AS v FROM lineitem WHERE l_orderkey < 50
    )
    """,
    doc="U08: implicit type widening across UNION branches (INT ∪ BIGINT "
        "∪ DOUBLE → DOUBLE): both engines must agree on the promoted "
        "common type and the exact widened values — the silent-coercion "
        "corner that corrupts ids when a union partner is floating "
        "(BIGINTs above 2^53 would round; the explicit final CAST makes "
        "the promotion auditable).",
)
