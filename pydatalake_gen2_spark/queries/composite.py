"""Composite analytics queries — TPC-H-shaped multi-operator pipelines.

Single operators are proven one-by-one in the other modules; these are the
"whole engine at once" rows: multi-way joins + filters + aggregation +
ordering in one plan, the shape a 100 TB warehouse actually runs. All
tier-H, identical ANSI text on both engines except decimal casts.

Scale notes: every join below is dim-to-fact (broadcast) or keyed
fact-to-fact (shuffle on the FK); aggregations are partial+final; the
final ORDER BY runs over the aggregated (small) side only.
"""

from __future__ import annotations

from pydatalake_gen2_spark.registry import sql_pair

# TPC-H Q3 shape: shipping priority. customer ⋈ orders ⋈ lineitem,
# selective filters on both ends, revenue agg, top-10.
sql_pair(
    "c01_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND c.c_acctbal > 0
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)

# TPC-H Q5 shape: local-supplier revenue by nation. 5-way join through
# both FK paths (customer→nation and supplier→nation must agree).
sql_pair(
    "c02_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)

# TPC-H Q10 shape: returned-item losses per customer, top-20.
sql_pair(
    "c03_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)

# TPC-H Q4 shape: order-priority counting via EXISTS (semi-join rewrite).
sql_pair(
    "c04_order_priority",
    """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)

# Correlated scalar subquery (decorrelates to aggregate + join): customers
# spending above their nation's average order value.
sql_pair(
    "c05_above_nation_avg",
    """
    WITH cust_spend AS (
      SELECT c.c_custkey, c.c_nationkey,
             sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS spend_dec
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey, c.c_nationkey
    ),
    nation_tot AS (
      SELECT c_nationkey, sum(spend_dec) AS total_spend,
             CAST(count(*) AS BIGINT) AS n_cust
      FROM cust_spend GROUP BY c_nationkey
    )
    SELECT cs.c_custkey, CAST(ROUND(cs.spend_dec, 2) AS DOUBLE) AS spend
    FROM cust_spend cs JOIN nation_tot nt
      ON cs.c_nationkey = nt.c_nationkey
    WHERE cs.spend_dec * nt.n_cust > nt.total_spend
    ORDER BY cs.c_custkey
    """,
    doc="spend > nation average, compared exactly in decimal (spend·n > Σ)",
)

# Uncorrelated scalar subquery in a predicate (both planners evaluate the
# subquery once and broadcast the scalar).
sql_pair(
    "c06_scalar_subquery",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
)

# IN / NOT IN subqueries (semi/anti-join rewrites).
sql_pair(
    "c07_in_subquery",
    """
    SELECT l_orderkey, l_linenumber, l_suppkey
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)
    ORDER BY l_orderkey, l_linenumber
    """,
)

sql_pair(
    "c08_not_in_subquery",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY c_custkey
    """,
)
