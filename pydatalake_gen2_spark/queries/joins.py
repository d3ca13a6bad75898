"""Joins — SURVEY.md §2B.3 (J01-J12).

Physical strategy notes (the 100 TB story):
- J01/J03-J07/J12: equi joins → Catalyst picks sort-merge or shuffled-hash;
  AQE switches to broadcast at runtime when a side is small.
- J02: explicit broadcast of `part` — dims stay under the driver's
  broadcast threshold even at 100 TB fact scale.
- J09: theta join is BroadcastNestedLoop with the small side broadcast —
  acceptable only because dims are small; never theta-join two fact tables.
- J10: range self-join is bounded by the join key (user_id) so the
  per-key cross product stays small; the interval predicate is applied
  inside the join.
- J11: as-of join via operators.asof (union-sort, one shuffle — see module).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_gen2_spark.operators.asof import asof_join
from pydatalake_gen2_spark.registry import register, sql_pair

sql_pair(
    "j01_inner_equi",
    """
    SELECT o.o_orderkey, c.c_custkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)


@register(
    "j02_broadcast_inner",
    duck_sql="""
    SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 20
    GROUP BY p.p_brand
    """,
)
def j02_broadcast_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⨝dim with an explicit broadcast hint: no shuffle of lineitem —
    the one join strategy that survives a 100× fact-table scale-up."""
    li = spark.table("lineitem")
    part = spark.table("part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double").alias("sum_qty"),
        )
    )


sql_pair(
    "j03_left_outer",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
    """,
)

sql_pair(
    "j04_right_outer",
    """
    SELECT c.c_custkey, o.o_orderkey
    FROM orders o RIGHT JOIN customer c
      ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    """,
)

sql_pair(
    "j05_full_outer",
    """
    SELECT big_o.k AS order_cust, big_c.c_custkey AS cust_key
    FROM (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 350000) big_o
    FULL JOIN (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 8000) big_c
      ON big_o.k = big_c.c_custkey
    """,
)

sql_pair(
    "j06_left_semi",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)

sql_pair(
    "j07_left_anti",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)

sql_pair(
    "j08_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)

sql_pair(
    "j09_theta_nonequi",
    """
    SELECT s.s_suppkey,
           CAST(COUNT(c.c_custkey) AS BIGINT) AS n_poorer_customers
    FROM supplier s LEFT JOIN customer c ON s.s_acctbal > c.c_acctbal
    GROUP BY s.s_suppkey
    """,
)

sql_pair(
    "j10_range_band",
    """
    SELECT e1.event_id AS base_event,
           CAST(COUNT(e2.event_id) AS BIGINT) AS n_followups,
           CAST(SUM(CASE WHEN e2.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
    FROM events e1 LEFT JOIN events e2
      ON e1.user_id = e2.user_id
     AND e2.ts > e1.ts
     AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
    WHERE e1.event_type = 'click'
    GROUP BY e1.event_id
    """,
)


@register(
    "j11_asof",
    duck_sql="""
    SELECT p.event_id, p.user_id, c.event_id AS asof_event_id,
           CAST(c.value AS DOUBLE) AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def j11_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest click at-or-before each purchase, per user. DuckDB's native
    ASOF JOIN is the oracle for our union-sort implementation.

    Equal-ts ties among clicks pick max event_id (matches DuckDB's ASOF,
    which takes the single matching right row; fixture event times are
    unique per user so the tie rule is exercised, not load-bearing)."""
    ev = spark.table("events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    res = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_order="event_id",
        carry=["event_id", "value"],
        how="left",
    )
    return res.select(
        "event_id",
        "user_id",
        F.col("asof_event_id"),
        F.col("asof_value").cast("double").alias("asof_value"),
    )


sql_pair(
    "j12_multikey_self",
    """
    SELECT l1.l_orderkey, l1.l_linenumber,
           CAST(l2.l_quantity - l1.l_quantity AS DOUBLE) AS qty_delta
    FROM lineitem l1 JOIN lineitem l2
      ON l1.l_orderkey = l2.l_orderkey AND l2.l_linenumber = l1.l_linenumber + 1
    """,
)


@register(
    "jx_salted_skew_join",
    duck_sql="""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name,
           ROUND(s.s_acctbal, 2) AS s_acctbal
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
    tier="H",
)
def jx_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigating salted join (operators.joins.salted_join): same
    result set as the plain equi-join oracle — the salt only changes the
    shuffle-key distribution, which is the point at 100 TB."""
    from pydatalake_gen2_spark.operators.joins import salted_join

    out = salted_join(
        spark.table("lineitem"),
        spark.table("supplier"),
        "l_suppkey",
        "s_suppkey",
        n_salt=8,
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "s_name",
        F.round(F.col("s_acctbal"), 2).alias("s_acctbal"),
    )


@register(
    "j14_asof_tolerance",
    duck_sql="""
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 10 MINUTE THEN c.event_id END
             AS asof_event_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 10 MINUTE
                THEN CAST(c.value AS DOUBLE) END AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def j14_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a bounded lookback (pandas merge_asof `tolerance`):
    the latest click at-or-before each purchase counts only within 10
    minutes. The right ts rides in the carried struct so the tolerance is
    one post-window predicate — same single-shuffle union-sort plan as
    j11."""
    ev = spark.table("events")
    res = asof_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_order="event_id",
        carry=["event_id", "value"],
        how="left",
        tolerance="10 minutes",
    )
    return res.select(
        "event_id",
        "user_id",
        "asof_event_id",
        F.col("asof_value").cast("double").alias("asof_value"),
    )


_SCD2_REBUILD_SQL = """
    SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           LEAD(o_orderdate) OVER w IS NULL AS is_current,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("j15_scd2_history", duck_sql=_SCD2_REBUILD_SQL)
def j15_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change stream (orders as per-
    customer changes): validity intervals + version chain via one
    window shuffle on the business key (operators/merge.py)."""
    from pydatalake_gen2_spark.operators.merge import scd2_history

    return scd2_history(
        spark.table("orders"),
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderkey", "o_totalprice", "o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    )


@register("j16_scd2_incremental", duck_sql=_SCD2_REBUILD_SQL)
def j16_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-INTO equivalence: build the dimension from pre-1997-07
    orders, then scd2_merge the later batch in — the oracle is a FULL
    REBUILD over the whole stream, so a hash match proves the
    incremental path (broadcast batch summary + union, dimension never
    shuffled) is exactly equivalent under the append-only contract."""
    from pydatalake_gen2_spark.operators.merge import scd2_history, scd2_merge

    o = spark.table("orders")
    cut = F.lit("1997-07-01").cast("timestamp")
    dim = scd2_history(
        o.filter(F.col("o_orderdate") < cut),
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderkey", "o_totalprice", "o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    )
    return scd2_merge(
        dim,
        o.filter(F.col("o_orderdate") >= cut),
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderkey", "o_totalprice", "o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    )


@register(
    "j17_interval_overlap",
    duck_sql="""
    WITH iv AS (
      SELECT event_id, user_id, event_type,
             epoch_us(ts) AS s,
             epoch_us(ts) + CAST(round(value * 1000000) AS BIGINT) AS e
      FROM events),
    v AS (SELECT event_id AS view_id, user_id, s AS vs, e AS ve
          FROM iv WHERE event_type = 'view'),
    c AS (SELECT event_id AS click_id, user_id, s AS cs, e AS ce
          FROM iv WHERE event_type = 'click')
    SELECT v.user_id, view_id, click_id,
           CAST(least(ve, ce) - greatest(vs, cs) AS BIGINT) AS overlap_us
    FROM v JOIN c ON v.user_id = c.user_id AND vs <= ce AND cs <= ve
    """,
)
def j17_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: per-user 'view' intervals [ts, ts+value s]
    vs 'click' intervals, via the bin-bucketed EQUI-join (1-hour bins,
    exactly-once emission at the later start's bin — no theta join, no
    distinct; operators/joins.py:interval_overlap_join)."""
    from pydatalake_gen2_spark.operators.joins import interval_overlap_join

    ev = spark.table("events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.round(F.col("value") * 1000000).cast("bigint")).alias("e"),
    )
    v = ev.filter("event_type = 'view'").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("s").alias("vs"), F.col("e").alias("ve"),
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("s").alias("cs"), F.col("e").alias("ce"),
    )
    out = interval_overlap_join(
        v, c, on=["user_id"],
        left_start="vs", left_end="ve", right_start="cs", right_end="ce",
        bin_width=3_600_000_000,
    )
    return out.select(
        "user_id", "view_id", "click_id",
        (F.least("ve", "ce") - F.greatest("vs", "cs")).cast("bigint").alias("overlap_us"),
    )


@register(
    "j18_fuzzy_name_match",
    duck_sql="""
    WITH v AS (SELECT DISTINCT p_name AS v FROM part WHERE p_name IS NOT NULL)
    SELECT a.v AS val_a, b.v AS val_b,
           CAST(levenshtein(a.v, b.v) AS BIGINT) AS distance
    FROM v a JOIN v b ON a.v < b.v
    WHERE levenshtein(a.v, b.v) <= 3
    """,
)
def j18_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching over the part-name dictionary (levenshtein <= 3)
    via length-bucket blocking with exactly-once pair emission — the
    oracle is the full theta join, so the hash match proves the blocking
    has perfect recall (operators/joins.py:fuzzy_pairs)."""
    from pydatalake_gen2_spark.operators.joins import fuzzy_pairs

    return fuzzy_pairs(spark.table("part"), "p_name", k=3)


@register(
    "j21_nearest_event",
    duck_sql="""
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    j AS (SELECT p.event_id, p.user_id, c.event_id AS nearest_event_id,
                 abs(epoch_us(p.ts) - epoch_us(c.ts)) AS dist_us,
                 row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)), c.ts, c.event_id
                 ) AS rn
          FROM p JOIN c ON p.user_id = c.user_id)
    SELECT event_id, user_id, nearest_event_id, CAST(dist_us AS BIGINT) AS dist_us
    FROM j WHERE rn = 1
    """,
)
def j21_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest click to each purchase per user, EITHER direction —
    merge_asof(direction='nearest') semantics via operators.asof.
    nearest_join: one union-sort shuffle, two frames over the same sort,
    row-local closer-side pick; the oracle is the brute-force per-pair
    argmin (viable only at fixture scale — the implementation never
    builds those pairs). Ties: equal distance → earlier click; equal
    click ts → min event_id."""
    from pydatalake_gen2_spark.operators.asof import nearest_join

    ev = spark.table("events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click")
    res = nearest_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_id="event_id",
        carry=["event_id"],
        how="inner",
    )
    return res.select(
        "event_id",
        "user_id",
        F.col("nearest_event_id"),
        F.col("dist_us").cast("bigint").alias("dist_us"),
    )


@register(
    "j19_dpp_partitioned_join",
    duck_sql="""
    WITH f AS (SELECT year(o_orderdate) AS o_year, o_totalprice FROM orders),
    d AS (SELECT DISTINCT year(o_orderdate) AS o_year,
                 CASE WHEN year(o_orderdate) % 2 = 0 THEN 'even' ELSE 'odd' END AS tag
          FROM orders)
    SELECT f.o_year,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM f JOIN d ON f.o_year = d.o_year
    WHERE d.tag = 'odd'
    GROUP BY 1 ORDER BY 1
    """,
)
def j19_dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is a parquet layout
    partitioned by o_year; the dim carries the selective predicate
    (tag = 'odd') on a NON-join column, so static pruning can't help —
    at execution Spark broadcasts the filtered dim and injects
    `o_year IN dynamicpruning#N` into the fact scan's PartitionFilters,
    reading only the matching partition directories. At 100 TB this is
    the difference between scanning the whole fact table and scanning
    the qualifying date partitions; plan-gated in tests/test_plans.py.

    Mirrors the star-join + date-dim pattern the reference's consumers
    would run against a partitioned lake layout (reference has no
    relational surface; /root/reference/azure/datalake/gen2/client.py
    is byte-stream I/O only)."""
    from pydatalake_gen2_spark.queries.scans import _tmp, _write_once

    fact_p = _tmp("j19_fact", sf_dir)
    dim_p = _tmp("j19_dim", sf_dir)
    fact = spark.table("orders").withColumn("o_year", F.year("o_orderdate"))
    _write_once(
        fact_p,
        lambda: fact.write.mode("overwrite").partitionBy("o_year").parquet(fact_p),
    )
    dim = (
        fact.select("o_year")
        .distinct()
        .withColumn(
            "tag",
            F.when(F.col("o_year") % 2 == 0, F.lit("even")).otherwise(F.lit("odd")),
        )
    )
    _write_once(dim_p, lambda: dim.write.mode("overwrite").parquet(dim_p))
    f = spark.read.parquet(fact_p)
    d = spark.read.parquet(dim_p)
    return (
        f.join(d, "o_year")
        .filter(F.col("tag") == "odd")
        .groupBy("o_year")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_year")
    )


@register(
    "j22_bucketed_join",
    duck_sql="""
    SELECT o.o_orderkey, o.o_totalprice,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS line_total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
    doc="J22: shuffle-free fact-fact join via bucketed layout — both "
        "sides written once with bucketBy(8, orderkey) + sortBy into the "
        "session catalog, then joined WITHOUT any Exchange (plan-gated in "
        "tests/test_plans.py: zero Exchange nodes in the join subtree). "
        "This is THE layout move for a 100 TB fact⋈fact: pay the shuffle "
        "once at write time, then every subsequent join/aggregate on the "
        "bucket key is co-located scan-side. The groupBy on the same key "
        "also rides the bucketing (no post-join shuffle). Oracle is the "
        "plain logical join — bucketing is physical-only.",
)
def j22_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    to, tl = f"j22_orders_{tag}", f"j22_lineitem_{tag}"
    # The in-memory session catalog forgets tables across processes while
    # the warehouse directory persists — drop stale locations first.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in (to, tl):
        if not spark.catalog.tableExists(t):
            shutil.rmtree(
                os.path.join(warehouse.replace("file:", ""), t), ignore_errors=True
            )
    if not spark.catalog.tableExists(to):
        (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(to)
        )
    if not spark.catalog.tableExists(tl):
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_orderkey", "l_extendedprice")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(tl)
        )
    o = spark.table(to).filter(F.col("o_orderstatus") == "F")
    l = spark.table(tl)
    # merge hint: at fixture scale AQE would broadcast the small side and
    # throw away the co-located layout; at 100 TB both sides are facts and
    # SMJ-over-buckets IS the plan — pin it so the gate tests that plan.
    return (
        o.join(l.hint("merge"), o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("line_total"),
        )
    )


_J23_BODY = """
    WITH v0 AS (
      SELECT c_custkey, c_name,
             CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS STRING) AS bal
      FROM customer),
    v1 AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 10 = 4
                  THEN CAST(CAST(c_acctbal + 100.0 AS DECIMAL(18,4)) AS STRING)
                  ELSE CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS STRING)
             END AS bal
      FROM customer WHERE c_custkey % 10 <> 3
      UNION ALL
      SELECT -c_custkey, concat('new_', c_name),
             CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS STRING)
      FROM customer WHERE c_custkey % 10 = 5)
    SELECT COALESCE(v1.c_custkey, v0.c_custkey) AS c_custkey,
           CASE WHEN v0.c_custkey IS NULL THEN 'I'
                WHEN v1.c_custkey IS NULL THEN 'D'
                ELSE 'U' END AS change_type,
           v0.bal AS old_bal, v1.bal AS new_bal
    FROM v0 FULL OUTER JOIN v1 ON v0.c_custkey = v1.c_custkey
    WHERE v0.c_custkey IS NULL OR v1.c_custkey IS NULL OR v0.bal <> v1.bal
    ORDER BY c_custkey
"""

sql_pair(
    "j23_snapshot_diff",
    _J23_BODY,
    _J23_BODY,
    doc="J23: CDC snapshot diff — classify every key across two table "
        "versions as Insert / Update / Delete via ONE full-outer join on "
        "the business key, emitting old/new values for changed rows only "
        "(unchanged keys are filtered before they leave the join). The "
        "change-feed primitive for incremental downstream refresh when "
        "the source offers only snapshots. The two versions here are "
        "derived deterministically from `customer` (drop %10=3, shift "
        "balances %10=4, insert negated keys %10=5) so the pair is "
        "hashable. Scale: one co-partitioned shuffle on the key for both "
        "sides; with both snapshots bucketed on the key (j22 layout) the "
        "diff is shuffle-free. Values compared as DECIMAL-exact strings.",
)


@register(
    "j24_shuffle_hash_hint",
    duck_sql="""
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="J24: explicit SHUFFLE_HASH strategy pin — the third physical "
        "join strategy alongside broadcast (J02) and sort-merge (J22), "
        "surfaced so a user can force hash join when one side fits an "
        "executor's memory but exceeds the driver broadcast threshold "
        "(the classic mid-size dimension at 100 TB: too big to "
        "broadcast, wasteful to sort). Plan-gated: ShuffledHashJoin "
        "node present. Oracle is the plain logical join — the hint is "
        "physical-only.",
)
def j24_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.table("customer")
    n = spark.table("nation").hint("shuffle_hash")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            .alias("total_bal"),
        )
    )


@register(
    "j25_merge_upsert",
    duck_sql="""
    WITH agg AS (
      SELECT o_custkey AS c_custkey,
             'upd-' || CAST(o_custkey AS VARCHAR) AS c_name,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS c_acctbal
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01'
      GROUP BY o_custkey),
    src AS (
      SELECT c_custkey, c_name, c_acctbal, CAST(NULL AS VARCHAR) AS c_mktsegment
      FROM agg
      UNION ALL
      SELECT c_custkey + 1000000, 'new-' || CAST(c_custkey AS VARCHAR),
             c_acctbal, 'MERGED' FROM agg WHERE c_custkey % 7 = 0),
    tgt AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,4)) AS c_acctbal,
             c_mktsegment
      FROM customer)
    SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
           COALESCE(s.c_name, t.c_name)       AS c_name,
           COALESCE(s.c_acctbal, t.c_acctbal) AS c_acctbal,
           COALESCE(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment,
           CASE WHEN s.c_custkey IS NULL THEN 'carry'
                WHEN t.c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS action
    FROM tgt t FULL JOIN src s ON t.c_custkey = s.c_custkey
    ORDER BY c_custkey
    """,
)
def j25_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J25: generic MERGE INTO (operators/merge.merge_upsert) — a change
    batch derived from recent orders upserts the customer dimension:
    matched customers get name+balance overwritten (segment NULL in the
    batch -> target's segment carries, proving per-column partial
    update), synthetic keys insert, untouched customers carry. The
    oracle is the textbook FULL JOIN + COALESCE expansion of MERGE —
    hash-equality certifies the operator implements exactly ANSI MERGE
    semantics. See the operator docstring for the partition-pruned
    rewrite this plan becomes at 100 TB."""
    from pydatalake_gen2_spark.operators.merge import merge_upsert

    agg = (
        spark.table("orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("c_acctbal"))
        .select(
            "c_custkey",
            F.concat(F.lit("upd-"), F.col("c_custkey").cast("string")).alias("c_name"),
            "c_acctbal",
        )
    )
    src = agg.select(
        "c_custkey", "c_name", "c_acctbal",
        F.lit(None).cast("string").alias("c_mktsegment"),
    ).unionByName(
        agg.filter(F.col("c_custkey") % 7 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("c_custkey").cast("string")).alias("c_name"),
            "c_acctbal",
            F.lit("MERGED").alias("c_mktsegment"),
        )
    )
    tgt = spark.table("customer").select(
        "c_custkey", "c_name",
        F.col("c_acctbal").cast("decimal(18,4)").alias("c_acctbal"),
        "c_mktsegment",
    )
    return merge_upsert(tgt, src, ["c_custkey"]).orderBy("c_custkey")


@register(
    "j26_bloom_prefiltered_join",
    duck_sql="""
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS revenue
    FROM lineitem
    WHERE l_orderkey IN
          (SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0)
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def j26_bloom_prefiltered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J26: semi-join reduction via a broadcast bloom filter — the fact
    table is pre-filtered by operators/bloom.might_contain (pure codegen
    bit probes against the one-row broadcast bitmap built by
    build_bloom) BEFORE the exact left-semi join removes the bloom's
    false positives. Result is EXACTLY the plain semi join (the oracle),
    but at 100 TB the bloom drops ~all non-matching fact rows inside the
    scan stage, so the semi join's shuffle carries only survivors — the
    manual form of the runtime-filter pushdown engines inject, with the
    bitmap's size (m_bits) under the pipeline's control instead of the
    optimizer's."""
    from pydatalake_gen2_spark.operators.bloom import build_bloom, might_contain

    keys = (
        spark.table("orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .select("o_orderkey")
    )
    bloom = F.broadcast(build_bloom(keys, "o_orderkey"))
    li = (
        spark.table("lineitem")
        .crossJoin(bloom)
        .filter(might_contain(F.col("l_orderkey"), F.col("bloom_words")))
    )
    exact = li.join(
        keys.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    )
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "j27_null_safe_join",
    duck_sql="""
    WITH a AS (SELECT c_custkey, NULLIF(c_nationkey % 5, 3) AS k FROM customer),
         b AS (SELECT n_nationkey, NULLIF(n_nationkey % 5, 3) AS k FROM nation)
    SELECT a.k AS k, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT a.c_custkey) AS BIGINT) AS n_cust,
           CAST(count(DISTINCT b.n_nationkey) AS BIGINT) AS n_nation
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k
    """,
)
def j27_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J27: null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — NULL
    keys MATCH each other instead of vanishing, the semantics dimension
    lookups with optional keys need. Still a hash-join key for Catalyst
    (EqualNullSafe is an equi-join condition, not a theta filter), so the
    physical plan is the same broadcast/SMJ as J01 — no nested loop."""
    a = spark.table("customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(3)).alias("k")
    )
    b = spark.table("nation").select(
        "n_nationkey", F.nullif(F.col("n_nationkey") % 5, F.lit(3)).alias("k")
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .groupBy(a["k"].alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("n_nationkey").alias("n_nation"),
        )
    )


sql_pair(
    "j28_lateral_subquery",
    """
    SELECT n.n_name, t.o_orderkey, t.o_totalprice
    FROM nation n,
    LATERAL (
      SELECT o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(18,4)) AS o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
    ) t
    """,
    """
    SELECT n.n_name, t.o_orderkey, t.o_totalprice
    FROM nation n,
    LATERAL (
      SELECT o.o_orderkey,
             CAST(o.o_totalprice AS DECIMAL(18,4)) AS o_totalprice
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2
    ) t
    """,
    doc="J28: correlated LATERAL subquery with ORDER BY ... LIMIT — the "
        "declarative top-k-per-group join (each nation's 2 priciest "
        "orders). Catalyst decorrelates the correlated limit into a "
        "rank-over-partition under the hood rather than re-running the "
        "subquery per outer row — the per-row-rescan formulation would "
        "be the 100 TB killer; deterministic tie-break on orderkey "
        "keeps the pair hashable.",
)


@register(
    "j29_incremental_join_maintenance",
    duck_sql="""
    SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment,
           CAST(o.o_totalprice AS DECIMAL(18,4)) AS price,
           o.o_orderkey % 10 >= 8 AS from_delta
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def j29_incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J29: incremental JOIN view maintenance — the delta rule
    new_view = old_view ∪ (Δfact ⋈ dim). The fact is split
    deterministically into a 'materialized' 80% and a 'delta' 20%
    (o_orderkey % 10), the old view is joined once, and only the delta
    re-joins the dimension; the union must equal the full recompute (the
    oracle). At 100 TB this is the difference between re-joining a day's
    increment and re-joining three years of facts — same discipline as
    L33's aggregate maintenance, for the join operator. Each leg is an
    ordinary equi-join (broadcast-able dim); the delta leg's input is
    20× smaller than the recompute's."""
    orders = spark.table("orders")
    cust = spark.table("customer").select("c_custkey", "c_mktsegment")
    old_fact = orders.filter(F.col("o_orderkey") % 10 < 8)
    delta_fact = orders.filter(F.col("o_orderkey") % 10 >= 8)

    def leg(fact: DataFrame, from_delta: bool) -> DataFrame:
        return fact.join(
            cust, fact["o_custkey"] == cust["c_custkey"]
        ).select(
            "o_orderkey", "c_custkey", "c_mktsegment",
            F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
            F.lit(from_delta).alias("from_delta"),
        )

    # "old view" materialized once (in production: read back from the
    # stored view); here the leg is computed to certify the union rule
    return leg(old_fact, False).unionByName(leg(delta_fact, True))


sql_pair(
    "j30_sequence_gap_detection",
    """
    WITH ids AS (SELECT DISTINCT event_id FROM events),
    s AS (
      SELECT event_id,
             LAG(event_id) OVER (ORDER BY event_id) AS prev_id
      FROM ids)
    SELECT CAST(prev_id + 1 AS BIGINT) AS gap_start,
           CAST(event_id - 1 AS BIGINT) AS gap_end,
           CAST(event_id - prev_id - 1 AS BIGINT) AS n_missing
    FROM s
    WHERE prev_id IS NOT NULL AND event_id - prev_id > 1
    ORDER BY gap_start
    """,
    doc="J30: sequence-gap detection via islands-and-gaps — LAG over the "
        "observed ids emits one (gap_start, gap_end, n_missing) row per "
        "hole: the ingestion-completeness audit (missing Kafka offsets, "
        "dropped batches). O(observed) and robust to wild outlier ids, "
        "unlike the naive generate-the-dense-spine formulation, which "
        "materializes max-min rows and explodes on the very anomaly it "
        "audits for (one corrupt 10^12 id). The window sorts only the "
        "deduped 8-byte id projection; at extreme scale the same "
        "recurrence runs on o06's range-partitioned sort with boundary "
        "exchange. On the complete fixture the result is EMPTY — equally "
        "strong as a hash match (any missing id breaks it).",
)


# ---------------------------------------------------------------------------
# j32: grid-bucketed spatial nearest-neighbour join (haversine)
# ---------------------------------------------------------------------------

# Synthetic deterministic placements (fixtures carry no coordinates): lat in
# [-60, 60) so cos(lat) >= 0.5 bounds the lon cell size. Same integer
# arithmetic in both dialects (the l54/f56 build-from-columns pattern).
_J32_R_KM = 200.0
_J32_HAVERSINE = (
    "2 * 6371.0 * ASIN(SQRT(POWER(SIN(RADIANS(s_lat - c_lat) / 2), 2) "
    "+ COS(RADIANS(c_lat)) * COS(RADIANS(s_lat)) "
    "* POWER(SIN(RADIANS(s_lon - c_lon) / 2), 2)))"
)


def _j32_duck() -> str:
    return f"""
    WITH c AS (
      SELECT c_custkey,
             ((c_custkey * 37) % 12000) / 100.0 - 60.0 AS c_lat,
             ((c_custkey * 73) % 36000) / 100.0 - 180.0 AS c_lon
      FROM customer),
    s AS (
      SELECT s_suppkey,
             ((s_suppkey * 41) % 12000) / 100.0 - 60.0 AS s_lat,
             ((s_suppkey * 79) % 36000) / 100.0 - 180.0 AS s_lon
      FROM supplier),
    d AS (
      SELECT c_custkey, s_suppkey, {_J32_HAVERSINE} AS km
      FROM c CROSS JOIN s),
    r AS (
      SELECT c_custkey, s_suppkey, km,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY ROUND(km, 6), s_suppkey) AS rn
      FROM d WHERE ROUND(km, 6) <= {_J32_R_KM})
    SELECT c_custkey, s_suppkey, ROUND(km, 4) AS dist_km
    FROM r WHERE rn = 1 ORDER BY c_custkey
    """


@register("j32_geo_grid_join", duck_sql=_j32_duck())
def j32_geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J32: spatial nearest-neighbour join — nearest supplier within 200 km
    of each customer by exact haversine, via operators/geo.grid_nearest:
    suppliers land in one (2-deg, 4-deg) grid cell each, customers probe
    their cell plus the 8 neighbours, candidates meet in a plain
    equi-join on the cell key — never a cross product. Recall is exact
    by pigeonhole (lats confined to +-60 deg, see geo.py); the oracle
    brute-forces all pairs, so a single missed in-range pair breaks the
    hash. Ties and the radius fence round per the libm discipline. At
    100 TB this is the standard geo join: site cells are a partial agg
    (persistable as an index), the 9x explode rides the probe side, the
    haversine verify is row-local."""
    from pydatalake_gen2_spark.operators.geo import grid_nearest

    cust = spark.table("customer").selectExpr(
        "c_custkey AS p_id",
        "((c_custkey * 37) % 12000) / 100.0 - 60.0 AS c_lat",
        "((c_custkey * 73) % 36000) / 100.0 - 180.0 AS c_lon",
    )
    supp = spark.table("supplier").selectExpr(
        "s_suppkey AS s_id",
        "((s_suppkey * 41) % 12000) / 100.0 - 60.0 AS s_lat",
        "((s_suppkey * 79) % 36000) / 100.0 - 180.0 AS s_lon",
    )
    return (
        grid_nearest(cust, supp, radius_km=_J32_R_KM)
        .select(
            F.col("p_id").alias("c_custkey"),
            F.col("s_id").alias("s_suppkey"),
            "dist_km",
        )
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# j33: last-touch marketing attribution (as-of + credit rollup)
# ---------------------------------------------------------------------------


@register(
    "j33_last_touch_attribution",
    duck_sql="""
    WITH att AS (
      SELECT p.event_id, p.value,
             CASE WHEN c.ts >= p.ts - INTERVAL 1 DAY THEN c.event_type END
               AS channel
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type <> 'purchase') c
        ON p.user_id = c.user_id AND p.ts >= c.ts)
    SELECT coalesce(channel, 'direct') AS channel,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM att GROUP BY coalesce(channel, 'direct') ORDER BY channel
    """,
)
def j33_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J33: last-touch attribution — each purchase credits the user's most
    recent non-purchase event within a 1-day lookback (else 'direct'),
    rolled up to per-channel purchase counts and exact-cents revenue:
    the marketing-analytics composite built on the engine's as-of
    operator (J11's single-shuffle union-sort plan, J14's tolerance
    fence), certified against DuckDB's NATIVE ASOF JOIN + the same
    rollup. At scale nothing new shuffles beyond the as-of's one
    sort-shuffle; the credit rollup is a tiny partial agg."""
    ev = spark.table("events")
    att = asof_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") != "purchase"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_order="event_id",
        carry=["event_type"],
        how="left",
        tolerance="1 day",
    )
    return (
        att.select(
            F.coalesce(F.col("asof_event_type"), F.lit("direct")).alias("channel"),
            F.col("value"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("channel")
    )


@register(
    "j34_temporal_dim_enrich",
    duck_sql="""
    WITH dim AS (
      SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER w AS valid_to,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    f AS (
      SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, l.l_shipdate
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT f.l_orderkey, f.l_linenumber, f.o_custkey,
           d.version AS dim_version, d.o_orderstatus AS status_at_ship
    FROM f JOIN dim d
      ON f.o_custkey = d.o_custkey
     AND d.valid_from <= f.l_shipdate
     AND (d.valid_to IS NULL OR f.l_shipdate < d.valid_to)
    """,
)
def j34_temporal_dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J34: fact enrichment against a VERSIONED (SCD2) dimension at event
    time — every lineitem picks up the customer-state version valid at
    its ship date. The oracle states the textbook point-in-interval
    predicate (valid_from <= t < valid_to over J15's rebuilt history);
    the engine does NOT run that non-equi join — under the SCD2 chain
    contract (valid_to = next valid_from) 'version valid at t' IS 'latest
    version with valid_from <= t', so the plan is the J11 union-sort
    AS-OF join: ONE shuffle on the business key, no interval blow-up, the
    zero-length versions a same-timestamp burst leaves behind resolved
    identically by the version-order tie-break. This is the
    slowly-changing-dimension read path every warehouse fact pipeline
    runs, in the shape that survives a 100 TB fact table."""
    from pydatalake_gen2_spark.operators.merge import scd2_history

    o = spark.table("orders")
    facts = (
        spark.table("lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "o_custkey", "l_shipdate")
    )
    dim = scd2_history(
        o,
        key_cols=["o_custkey"],
        ts_col="o_orderdate",
        attr_cols=["o_orderkey", "o_totalprice", "o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    ).select("o_custkey", "valid_from", "version", "o_orderstatus")
    res = asof_join(
        facts,
        dim,
        on="o_custkey",
        left_ts="l_shipdate",
        right_ts="valid_from",
        right_order="version",
        carry=["version", "o_orderstatus"],
        how="inner",
    )
    return res.select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        F.col("asof_version").alias("dim_version"),
        F.col("asof_o_orderstatus").alias("status_at_ship"),
    )


# ---------------------------------------------------------------------------
# j35: point-in-polygon spatial join (exact integer ray casting)
# ---------------------------------------------------------------------------

_J35_BODY = """
    WITH quad AS (
      SELECT n_nationkey,
             CAST((n_nationkey % 5) * 200 + 100 AS BIGINT) AS cx,
             CAST(CAST(floor(n_nationkey / 5.0) AS BIGINT) * 200 + 100
                  AS BIGINT) AS cy,
             CAST(40 + n_nationkey * 3 AS BIGINT) AS r
      FROM nation),
    verts AS (
      SELECT n_nationkey, i,
             CASE i WHEN 0 THEN cx + r WHEN 1 THEN cx
                           WHEN 2 THEN cx - r ELSE cx END AS x,
             CASE i WHEN 0 THEN cy WHEN 1 THEN cy + r
                           WHEN 2 THEN cy ELSE cy - r END AS y
      FROM quad CROSS JOIN {values_clause}),
    edges AS (
      SELECT a.n_nationkey, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      FROM verts a JOIN verts b
        ON a.n_nationkey = b.n_nationkey AND b.i = (a.i + 1) % 4),
    pts AS (
      SELECT c_custkey,
             CAST((c_custkey * 7919) % 1000 AS BIGINT) AS px,
             CAST((c_custkey * 104729) % 1000 AS BIGINT) AS py
      FROM customer),
    crossings AS (
      SELECT p.c_custkey, e.n_nationkey,
             CAST(SUM(CASE WHEN ((e.y1 > p.py) <> (e.y2 > p.py))
                            AND (CASE WHEN e.y2 > e.y1
                                 THEN (p.px - e.x1) * (e.y2 - e.y1)
                                      < (p.py - e.y1) * (e.x2 - e.x1)
                                 ELSE (p.px - e.x1) * (e.y2 - e.y1)
                                      > (p.py - e.y1) * (e.x2 - e.x1) END)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_cross
      FROM pts p CROSS JOIN edges e
      GROUP BY p.c_custkey, e.n_nationkey),
    area AS (
      SELECT n_nationkey,
             CAST(abs(SUM(x1 * y2 - x2 * y1)) / 2 AS BIGINT) AS poly_area
      FROM edges GROUP BY n_nationkey)
    SELECT a.n_nationkey, a.poly_area,
           CAST(COALESCE(SUM(CASE WHEN c.n_cross % 2 = 1 THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_points_inside
    FROM area a
    LEFT JOIN crossings c ON a.n_nationkey = c.n_nationkey
    GROUP BY a.n_nationkey, a.poly_area
    ORDER BY a.n_nationkey
"""

_J35_VALUES_SPARK = "(VALUES (0), (1), (2), (3) AS corner(i))"
_J35_VALUES_DUCK = "(VALUES (0), (1), (2), (3)) corner(i)"

sql_pair(
    "j35_point_in_polygon",
    _J35_BODY.format(values_clause=_J35_VALUES_SPARK),
    _J35_BODY.format(values_clause=_J35_VALUES_DUCK),
    doc="J35: point-in-polygon spatial join — customers at deterministic "
        "integer coordinates tested against 25 per-nation quadrilaterals "
        "with the GENERIC even-odd ray-casting rule over an edge table "
        "(crossing-number parity), plus the shoelace polygon area. The "
        "polygon-containment primitive behind geofencing / "
        "region-assignment joins that J32's grid join (cell equality) "
        "cannot decide — the grid narrows CANDIDATES, this edge test "
        "decides membership, and together they are the standard scale "
        "pipeline (grid prune -> exact test; the doc is explicit that "
        "the all-polygons comparison here is the post-prune stage). "
        "Every comparison is EXACT 64-bit integer arithmetic: the ray "
        "intersection px < x1 + (py-y1)(x2-x1)/(y2-y1) is cross-"
        "multiplied by the edge's dy with a sign-aware CASE, so no "
        "division or float ever decides a boundary, and the shoelace "
        "sum is integers throughout. Polygon edges are a ~100-row frame "
        "built from VALUES x nation (broadcast at any scale); the "
        "points side streams map-side against it, and the per-(point, "
        "polygon) crossing tally is a partial+final aggregate. Dialect "
        "split: inline-VALUES derived-table syntax only.",
)


# ---------------------------------------------------------------------------
# j36: interval-overlap join via week-bucket candidate equi-join
# ---------------------------------------------------------------------------

@register(
    "j36_interval_overlap_join",
    duck_sql="""
    WITH r AS (
      SELECT o_orderkey AS ok, o_orderdate AS d0,
             o_orderdate + INTERVAL 30 DAY AS d1
      FROM orders WHERE o_orderkey % 100 = 0),
    s AS (
      SELECT l_orderkey AS lk, l_linenumber AS ln, l_suppkey AS supp,
             l_shipdate AS s0, l_shipdate + INTERVAL 7 DAY AS s1
      FROM lineitem WHERE l_suppkey <= 20)
    , pairs AS (
      SELECT DISTINCT r.ok, s.lk, s.ln, s.supp
      FROM r JOIN s ON s.s0 <= r.d1 AND r.d0 <= s.s1)
    SELECT ok,
           CAST(COUNT(*) AS BIGINT) AS n_overlaps,
           CAST(MIN(supp) AS BIGINT) AS min_supp,
           CAST(MAX(supp) AS BIGINT) AS max_supp,
           CAST(COUNT(DISTINCT lk) AS BIGINT) AS n_orders_touched
    FROM pairs GROUP BY ok ORDER BY ok
    """,
    doc="J36: interval-overlap join — order activity windows "
        "[orderdate, +30d] against shipment windows [shipdate, +7d], "
        "overlap iff s0<=r1 AND r0<=s1. The oracle states the THETA "
        "join directly; the engine runs the scale path a theta join "
        "cannot survive: each interval explodes to the epoch-WEEKS it "
        "spans (sequence+explode — 5 rows per order window, 2 per "
        "shipment), the candidate set is the week-bucket EQUI-join "
        "Catalyst hashes/sorts like any other key join, the exact "
        "predicate re-filters candidates, and a distinct on the pair "
        "key undoes multi-bucket double-counting. No BroadcastNestedLoop "
        "or CartesianProduct node exists in the plan (gated in "
        "tests/test_plans.py). This is J32's spatial-grid recipe on the "
        "time axis, and the generic form of J10's band join: at 100 TB "
        "both sides shuffle ONCE on the week key and skew is bounded by "
        "interval span / bucket width. Output: per-order overlap "
        "aggregates (exact integer counts).",
)
def j36_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.lit("1970-01-01").cast("date")
    r = (
        spark.table("orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("ok"),
            F.col("o_orderdate").alias("rd0"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("rd1"),
        )
    )
    s = (
        spark.table("lineitem")
        .where(F.col("l_suppkey") <= 20)
        .select(
            F.col("l_orderkey").alias("lk"),
            F.col("l_linenumber").alias("ln"),
            F.col("l_suppkey").alias("supp"),
            F.col("l_shipdate").alias("sd0"),
            (F.col("l_shipdate") + F.expr("INTERVAL 7 DAYS")).alias("sd1"),
        )
    )

    def weeks(lo, hi):
        return F.sequence(
            F.floor(F.datediff(F.to_date(lo), epoch) / 7),
            F.floor(F.datediff(F.to_date(hi), epoch) / 7),
        )

    rw = r.withColumn("wk", F.explode(weeks(F.col("rd0"), F.col("rd1"))))
    sw = s.withColumn("wk", F.explode(weeks(F.col("sd0"), F.col("sd1"))))
    pairs = (
        rw.join(sw, "wk")
        .where((F.col("sd0") <= F.col("rd1")) & (F.col("rd0") <= F.col("sd1")))
        .select("ok", "lk", "ln", "supp")
        .distinct()
    )
    return (
        pairs.groupBy("ok")
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.min("supp").cast("long").alias("min_supp"),
            F.max("supp").cast("long").alias("max_supp"),
            F.countDistinct("lk").alias("n_orders_touched"),
        )
        .orderBy("ok")
    )
