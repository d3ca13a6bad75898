"""Sorts / limits / top-k — SURVEY.md §2B.6 (O01-O04).

O03's plan is Catalyst's TakeOrderedAndProject (per-partition top-k +
driver merge — no full sort, the right shape at 100 TB). O04 is the
windowed top-k-per-group; its deterministic tie-break is the group key +
unique id in the ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pydatalake_gen2_spark.registry import register, sql_pair

# Driver hash is order-insensitive, so ORDER BY matters only for which rows
# survive a LIMIT — there the key set must be unique (tie-proof).
sql_pair(
    "o01_multikey_order",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority DESC, o_totalprice ASC, o_orderkey ASC
    """,
)

sql_pair(
    "o02_nulls_first_last",
    """
    SELECT c.c_custkey, MAX(o.o_totalprice) AS max_price
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    GROUP BY c.c_custkey
    ORDER BY max_price DESC NULLS LAST, c.c_custkey ASC
    """,
)

sql_pair(
    "o03_limit_topk",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)


@register(
    "o04_topk_per_group",
    duck_sql="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def o04_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. One shuffle on the group key; rank inside
    the partition — no cross-group data movement."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        spark.table("orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


sql_pair(
    "o05_limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    doc="Paginated top-k: LIMIT under total order with OFFSET (Spark "
        "plans GlobalLimit(offset+k) over partial per-partition limits — "
        "still never a full sort at scale; the skip happens driver-side "
        "on k+offset rows).",
)


@register(
    "o06_global_row_id",
    duck_sql="""
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS row_id
    FROM orders
    """,
    doc="O06: global ordered row-id assignment (DataFrame-native "
        "zipWithIndex). The oracle is the naive ROW_NUMBER-over-everything; "
        "the engine side computes the identical ids with the two-pass "
        "range-partition layout (operators/rowid.py) — disjoint ordered "
        "ranges + local Arrow-batched ranks + broadcast cumulative "
        "offsets — so no single task ever sorts the full table. Plan-gated "
        "in tests/test_plans.py: no empty-partition Window, range exchange "
        "present.",
)
def o06_global_row_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pydatalake_gen2_spark.operators.rowid import global_row_ids

    ids = global_row_ids(spark.table("orders"), ["o_orderkey"])
    return ids.select("o_orderkey", "row_id")


@register(
    "o08_topk_with_ties",
    duck_sql="""
    WITH r AS (
      SELECT o_orderkey, o_totalprice,
             CAST(RANK() OVER (ORDER BY o_totalprice DESC) AS BIGINT) AS rnk
      FROM orders)
    SELECT o_orderkey, o_totalprice, rnk FROM r WHERE rnk <= 10
    """,
)
def o08_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O08: top-k WITH TIES (FETCH FIRST 10 ROWS WITH TIES / rank() <= 10)
    — every order tying the 10th price survives, the semantics a plain
    LIMIT silently breaks. The oracle states the textbook global-rank
    form; the engine does NOT run a global rank window (one partition
    sorting the world): it takes the 10th value with a
    TakeOrderedAndProject micro-pass (k rows to the driver plan, no full
    sort), broadcasts it as a threshold predicate — which PUSHES TO THE
    SCAN — and ranks only the tie-inflated survivor set (k + ties rows).
    At 100 TB the full-sort form is a cluster-killer; threshold-then-rank
    reads the same parquet twice but shuffles ~k rows total."""
    o = spark.table("orders")
    kth = o.select("o_totalprice").orderBy(F.desc("o_totalprice")).limit(10)
    thresh = kth.agg(F.min("o_totalprice").alias("t"))
    from pyspark.sql.window import Window

    survivors = o.join(F.broadcast(thresh), F.col("o_totalprice") >= F.col("t")).select(
        "o_orderkey", "o_totalprice"
    )
    return survivors.select(
        "o_orderkey",
        "o_totalprice",
        F.rank()
        .over(Window.orderBy(F.desc("o_totalprice")))
        .cast("bigint")
        .alias("rnk"),
    ).filter(F.col("rnk") <= 10)


@register(
    "o09_skyline",
    duck_sql="""
    WITH pts AS (
      SELECT DISTINCT q.qty, s.bal_cents
      FROM (SELECT l_suppkey,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem GROUP BY l_suppkey) q
      JOIN (SELECT s_suppkey,
                   CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
            FROM supplier) s
        ON q.l_suppkey = s.s_suppkey)
    SELECT qty, bal_cents FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.qty >= p.qty AND q.bal_cents >= p.bal_cents
        AND (q.qty > p.qty OR q.bal_cents > p.bal_cents))
    ORDER BY qty DESC, bal_cents
    """,
)
def o09_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O09: SKYLINE (Pareto-frontier) query — the distinct per-supplier
    (total shipped quantity, account balance) points not dominated by
    any other point (dominated = another point >= in both coordinates,
    > in at least one). The multi-objective shortlist primitive ("no
    supplier is better on both axes") that single-key top-k cannot
    express — W32's Pareto CONCENTRATION measures one cumulative axis;
    this returns the frontier SET over two. The oracle states the
    textbook O(n^2) NOT-EXISTS dominance test; the engine never runs
    it: after deduping points, ONE window pass in (qty DESC, bal DESC)
    order keeps exactly the points whose balance strictly exceeds the
    running max of all preceding balances — the classic sort-scan
    skyline, O(k log k) on the REDUCED per-supplier frame (suppliers,
    not lineitems, so the single-partition window tail is bounded by
    entity cardinality, the same reduction W32 rides; a 1e9-entity
    frontier would first shrink candidates with per-bucket local
    skylines, the same partial-then-global shape as any agg).
    Equal-(qty,bal) duplicates collapse in the dedup so the strict
    running-max test cannot drop a tied frontier point; integer cents
    keep every comparison exact."""
    li = spark.table("lineitem")
    sup = spark.table("supplier")
    qty = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty")
    )
    bal = sup.select(
        "s_suppkey",
        F.round(F.col("s_acctbal") * 100, 0).cast("bigint").alias("bal_cents"),
    )
    pts = (
        qty.join(bal, qty.l_suppkey == bal.s_suppkey)
        .select("qty", "bal_cents")
        .distinct()
    )
    w = (
        Window.orderBy(F.desc("qty"), F.desc("bal_cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.withColumn("_runmax", F.max("bal_cents").over(w))
        .filter(
            F.col("_runmax").isNull() | (F.col("bal_cents") > F.col("_runmax"))
        )
        .select("qty", "bal_cents")
        .orderBy(F.desc("qty"), "bal_cents")
    )
