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
