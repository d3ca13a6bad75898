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


# Correlated EXISTS (TPC-H Q4 shape): priority counts over orders that
# have at least one late lineitem. Decorrelates to a left-semi join.
sql_pair(
    "c09_exists_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)

# Correlated NOT EXISTS (anti-join decorrelation).
sql_pair(
    "c10_not_exists_quiet_customers",
    """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)

# TPC-H Q13 shape: customer order-count distribution via LEFT OUTER join
# + two-level aggregation (the canonical histogram-of-group-sizes plan).
sql_pair(
    "c11_order_count_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey) cc
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)

# TPC-H Q18 shape: big orders via HAVING on a join-feeding subquery.
sql_pair(
    "c12_big_orders",
    """
    SELECT o.o_orderkey, ROUND(o.o_totalprice, 2) AS price,
           CAST(big.qty AS DOUBLE) AS total_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150) big
      ON big.l_orderkey = o.o_orderkey
    ORDER BY o.o_orderkey
    """,
)

# TPC-H Q22 shape: customers above the positive-balance average with no
# orders — scalar subquery + anti join in one query.
sql_pair(
    "c13_rich_inactive_customers",
    """
    SELECT substring(c_name, 1, 9) AS cntry, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY substring(c_name, 1, 9)
    ORDER BY cntry
    """,
)

# TPC-H Q15 shape: top supplier(s) by revenue — a reused CTE consumed
# twice (revenue table + its max) in one plan.
sql_pair(
    "c14_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                      (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS total_revenue
      FROM lineitem GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)

# TPC-H Q16 shape: distinct-count with a NOT IN prune and multi-key group.
sql_pair(
    "c15_part_supplier_counts",
    """
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p_brand <> 'Brand#1'
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)


# TPC-H Q7 shape: shipping volume between two nations by year — the
# 5-table snowflake join (fact + orders + customer + supplier + nation x2).
sql_pair(
    "c16_nation_volume",
    """
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE n1.n_nationkey < 5 AND n2.n_nationkey < 5
        AND n1.n_nationkey <> n2.n_nationkey) shipping
    GROUP BY supp_nation, cust_nation, yr
    ORDER BY supp_nation, cust_nation, yr
    """,
)

# ---------------------------------------------------------------------------
# Round 3: the remaining TPC-H query shapes (Q2/Q6/Q8/Q11/Q12/Q14/Q17/Q19/
# Q20/Q21), completing all 22. The fixtures have no partsupp table and no
# shipmode/receiptdate/commitdate columns, so Q2/Q11/Q20/Q21/Q12 are
# SHAPE-preserving adaptations (same plan skeleton: correlated-min over a
# part-supplier link, HAVING vs scalar subquery, nested IN, multi-EXISTS
# self-joins, conditional counts) over the columns that exist — the same
# convention c17 (Q9) established with its supplycost surrogate.

# TPC-H Q2 shape: min-cost supplier per part. The part-supplier link
# (partsupp surrogate) is the observed min price per (part, supplier) in
# lineitem; the correlated scalar subquery re-derives the per-part min
# under the same region filter — the classic double-evaluation plan.
sql_pair(
    "c18_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, CAST(min(l_extendedprice) AS DOUBLE) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s.s_name, n.n_name, p.p_partkey, p.p_name, ps.cost
    FROM part p
    JOIN ps ON ps.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size <= 10 AND r.r_name = 'EUROPE'
      AND ps.cost = (
        SELECT min(ps2.cost) FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY p.p_partkey, s.s_name
    """,
)

# TPC-H Q6 shape: forecasting-revenue-change — tight scan-side range
# filters, one global decimal-exact aggregate, no join at all.
sql_pair(
    "c19_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)

# TPC-H Q8 shape: national market share — conditional numerator over a
# 6-table snowflake, one final IEEE division per year.
sql_pair(
    "c20_market_share",
    """
    SELECT yr,
           CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS yr,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA') all_nations
    GROUP BY yr
    ORDER BY yr
    """,
)

# TPC-H Q11 shape: important stock — per-part value vs a scalar-subquery
# global threshold; the fraction compare stays exact-decimal (x*1000 > total).
sql_pair(
    "c21_important_stock",
    """
    SELECT l_partkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS value
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE s.s_nationkey < 13
    GROUP BY l_partkey
    HAVING sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 1000 >
      (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,4)))
       FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
       WHERE s2.s_nationkey < 13)
    ORDER BY value DESC, l_partkey
    """,
)

# TPC-H Q12 shape: late-shipment priority counts — conditional CASE sums
# per lineitem class inside a date window (shipmode surrogate: linestatus).
sql_pair(
    "c22_priority_shipments",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)

# TPC-H Q14 shape: promo-revenue percentage — CASE numerator / total, one
# scalar output row per month window.
sql_pair(
    "c23_promo_revenue",
    """
    SELECT 100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)

# TPC-H Q17 shape: small-quantity-order revenue — correlated AVG subquery
# per part (quantities are integral doubles, so the avg is bit-identical).
sql_pair(
    "c24_small_quantity_revenue",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = p.p_partkey)
    """,
)

# TPC-H Q19 shape: disjunctive predicate join — three OR'd conjunct groups
# over part x lineitem attributes sharing the partkey equi-condition (the
# planner must still extract the equi-join under the OR).
sql_pair(
    "c25_disjunctive_revenue",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)

# TPC-H Q20 shape: excess-stock suppliers — nested IN subqueries (supplier
# IN link-table IN part) with a HAVING threshold on shipped quantity.
sql_pair(
    "c26_excess_stock_suppliers",
    """
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 100)
    ORDER BY s.s_name
    """,
)

# TPC-H Q21 shape: suppliers who kept multi-supplier orders waiting —
# EXISTS + NOT EXISTS self-joins against a shared flagged-lineitem CTE
# ("late" = shipped after the order date; fixtures carry no receipt/commit
# dates).
sql_pair(
    "c27_waiting_suppliers",
    """
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate THEN 1 ELSE 0 END AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN flagged f ON f.l_suppkey = s.s_suppkey
    WHERE f.late = 1
      AND EXISTS (SELECT 1 FROM flagged f2
                  WHERE f2.l_orderkey = f.l_orderkey
                    AND f2.l_suppkey <> f.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged f3
                      WHERE f3.l_orderkey = f.l_orderkey
                        AND f3.l_suppkey <> f.l_suppkey AND f3.late = 1)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)


# TPC-H Q9 shape: profit by supplier nation and year with a part filter.
sql_pair(
    "c17_nation_profit",
    """
    SELECT n_name AS nation, yr,
           CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM (
      SELECT n.n_name, year(o.o_orderdate) AS yr,
             l.l_extendedprice * (1 - l.l_discount) - 0.5 * l.l_quantity AS amount
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%a%') profit
    GROUP BY n_name, yr
    ORDER BY nation, yr DESC
    """,
)


# Recursive CTE (Spark 4 WITH RECURSIVE): hierarchical ancestor-chain
# roll-up — the BOM/org-chart recursion shape. Suppliers form an implicit
# binary tree (parent(k) = floor(k/2)); each supplier's chain walks to its
# terminal node accumulating DECIMAL-exact account balances. The fixture's
# keys start at 0, and floor(0/2) = 0 would self-join forever, so the
# recursion stops at node <= 1 and the terminal filter accepts both fixed
# points (node 1 for every key >= 1, node 0 for key 0) — one output row
# per supplier. Both engines run the IDENTICAL text; Spark executes the
# recursion as an iterative union — one equi-join per level, so the
# 100 TB cost is depth(hierarchy) shuffles of the frontier, not an
# unbounded loop (depth here = log2(n_suppliers)).
sql_pair(
    "c28_recursive_cte",
    """
    WITH RECURSIVE chain AS (
      SELECT s_suppkey AS root, s_suppkey AS node,
             CAST(s_acctbal AS DECIMAL(18,4)) AS bal, 0 AS depth
      FROM supplier
      UNION ALL
      SELECT c.root, s.s_suppkey AS node,
             CAST(c.bal + CAST(s.s_acctbal AS DECIMAL(18,4))
                  AS DECIMAL(18,4)) AS bal,
             c.depth + 1 AS depth
      FROM chain c
      JOIN supplier s ON s.s_suppkey = CAST(floor(c.node / 2.0) AS BIGINT)
      WHERE c.node > 1
    )
    SELECT root AS s_suppkey, CAST(depth AS BIGINT) AS depth,
           CAST(bal AS DOUBLE) AS chain_bal
    FROM chain WHERE node <= 1 ORDER BY s_suppkey
    """,
)


def _c29_sql(datediff_expr: str) -> str:
    return f"""
    WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
    cust AS (
      SELECT o_custkey,
             CAST({datediff_expr} AS INT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders CROSS JOIN anchor GROUP BY o_custkey, maxd)
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS INT)
             AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency ASC, o_custkey) AS INT)
             AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, o_custkey) AS INT)
             AS m_score
    FROM cust ORDER BY o_custkey
    """


sql_pair(
    "c29_rfm_scoring",
    _c29_sql("datediff(maxd, MAX(CAST(o_orderdate AS DATE)))"),
    _c29_sql("date_diff('day', MAX(CAST(o_orderdate AS DATE)), maxd)"),
    doc="C29: RFM customer scoring — recency (days since last order, "
        "anchored at the corpus max date so the pair is reproducible), "
        "frequency, exact-cents monetary, each quintiled into a 1-5 "
        "score (5 = most recent / most frequent / highest spend; ntile "
        "ordering carries the custkey tie-break so equal metrics score "
        "deterministically). The segmentation table behind lifecycle "
        "campaigns and, for corpora, source-freshness triage. The fact "
        "table reduces to one row per customer in a partial agg; the "
        "three ntile windows run on that REDUCED table (W19/W22 "
        "discipline) — at 100 TB swap exact ntile for G32's percentile "
        "fences if even the customer dimension outgrows one partition.",
)


sql_pair(
    "c30_market_basket",
    """
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n_b AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM baskets),
    item AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS c FROM baskets
             GROUP BY brand),
    pair AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM baskets a JOIN baskets b
        ON a.ok = b.ok AND a.brand < b.brand
      GROUP BY a.brand, b.brand)
    SELECT brand_a, brand_b, c_ab,
           ROUND(CAST(c_ab AS DOUBLE) / n_b.n, 6) AS support,
           ROUND(CAST(c_ab AS DOUBLE) / ia.c, 6) AS confidence_a_to_b,
           ROUND(CAST(c_ab AS DOUBLE) * n_b.n
                 / (CAST(ia.c AS DOUBLE) * ib.c), 6) AS lift
    FROM pair
    JOIN item ia ON pair.brand_a = ia.brand
    JOIN item ib ON pair.brand_b = ib.brand
    CROSS JOIN n_b
    ORDER BY lift DESC, brand_a, brand_b
    LIMIT 20
    """,
    doc="C30: market-basket association rules over order baskets — "
        "brand-pair co-occurrence tallies to support / confidence / "
        "lift, top-20 by lift ('bought X, also bought Y' with the "
        "base-rate correction GR09's cosine lacks; GR09 scores "
        "customer-neighbourhood similarity, this scores in-basket "
        "co-purchase). Baskets reduce to DISTINCT (order, brand) first "
        "(dim join broadcasts), so the self-join fan-out per order is "
        "bounded by the BRAND vocabulary (<=25 here), never by basket "
        "line count, and the output is |brands|^2/2 tallies regardless "
        "of data size — integer counts cross the shuffle, ratios are "
        "one ROUND(6) expression each at the end.",
)


# ---------------------------------------------------------------------------
# c31: position-based (U-shaped) multi-touch attribution
# ---------------------------------------------------------------------------

sql_pair(
    "c31_position_attribution",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, ts AS pts,
             CAST(ROUND(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type = 'purchase'),
    touch AS (
      SELECT p.pid, p.v, c.event_type AS channel,
             CAST(ROW_NUMBER() OVER (PARTITION BY p.pid
                                     ORDER BY c.ts, c.event_id) AS BIGINT)
               AS pos,
             CAST(COUNT(*) OVER (PARTITION BY p.pid) AS BIGINT) AS n
      FROM p JOIN events c
        ON c.user_id = p.user_id
       AND c.event_type <> 'purchase'
       AND c.ts <= p.pts
       AND c.ts >= p.pts - INTERVAL 1 DAY),
    credit AS (
      SELECT pid, channel, pos, n, v,
             CAST(FLOOR((v * 4.0) / 10) AS BIGINT) AS endc,
             CAST(FLOOR(v / 2.0) AS BIGINT) AS halfc
      FROM touch),
    assigned AS (
      SELECT pid, channel,
             CASE
               WHEN n = 1 THEN v
               WHEN n = 2 AND pos = 1 THEN v - halfc
               WHEN n = 2 AND pos = 2 THEN halfc
               WHEN pos = 1 THEN endc
               WHEN pos = n THEN endc
               WHEN pos = 2 THEN
                 CAST(FLOOR((v - 2 * endc) / (n - 2.0)) AS BIGINT)
                 + (v - 2 * endc)
                 - (n - 2) * CAST(FLOOR((v - 2 * endc) / (n - 2.0)) AS BIGINT)
               ELSE CAST(FLOOR((v - 2 * endc) / (n - 2.0)) AS BIGINT)
             END AS credit_cents
      FROM credit)
    SELECT channel,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(credit_cents) AS BIGINT) AS credit_cents
    FROM assigned
    GROUP BY channel ORDER BY channel
    """,
    doc="C31: position-based (U-shaped 40/20/40) multi-touch attribution "
    "— each purchase's credit splits across its 1-day journey: 40% to "
    "the first touch, 40% to the last, the remaining 20% evenly over "
    "the middle (1 touch takes all, 2 touches split half-and-half). "
    "The companion to j33's winner-takes-all last-touch. ALL splits "
    "are integer-cents arithmetic (FLOOR divides with the remainder "
    "assigned to the first middle touch), so credit conservation — "
    "sum of credits == sum of purchase cents — holds EXACTLY, and the "
    "pair is float-free after the one cents conversion. The journey "
    "build is a time-band join on user_id (J10's shape: equi-key + "
    "range predicate, never a cross product); windows partition by "
    "purchase — bounded journeys, no skew amplification at 100 TB. "
    "One SQL text, both dialects.",
)
