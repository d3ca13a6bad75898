"""Aggregations — SURVEY.md §2B.4 (G01-G13).

Spark executes these as partial+final hash aggregation (HashAggregateExec
with map-side combine), which is exactly the 100 TB-friendly shape: only
group keys + partial states cross the shuffle.

Float determinism: doubles are cast to DECIMAL(18,4) *before* SUM (exact in
both engines); averages are computed as exact-decimal-sum cast to DOUBLE
then one IEEE division by COUNT — bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_gen2_spark.queries.sqlexact import (
    dec2dbl as _dec2dbl,
    wide_mul as _wide_mul,
)
from pydatalake_gen2_spark.registry import register, sql_pair


def _dec(c):
    return F.col(c).cast("decimal(18,4)")


@register(
    "g02_groupby_agg",
    duck_sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def g02_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the flagship. Partial agg on 2 low-cardinality keys:
    at 100 TB the shuffle carries ~6 rows per map task.

    Accumulation runs in BIGINT 1e-4 units, not DECIMAL sums: the per-row
    quantization is still the exact decimal(18,4) cast (so values are
    bit-identical to the DECIMAL-sum oracle), but the hot sum loop is a
    long add instead of a checked 28-digit decimal add — measured 1.5x
    faster on the single-row-group scan task. Exactness envelope: the
    unit sums stay below 2^53 through roughly sf15 for l_extendedprice
    (6e8 rows x 1e9 units); past that, per-partition partial sums still
    fit and the final render should switch back to DECIMAL — noted, not
    hidden."""
    li = spark.table("lineitem")

    def units(c):  # exact decimal(18,4) quantization, long accumulation
        return (c.cast("decimal(18,4)") * 10000).cast("bigint")

    qty = F.sum(units(F.col("l_quantity")))
    base = F.sum(units(F.col("l_extendedprice")))
    disc = F.sum(units(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (qty.cast("double") / 10000).alias("sum_qty"),
        (base.cast("double") / 10000).alias("sum_base_price"),
        (disc.cast("double") / 10000).alias("sum_disc_price"),
        ((qty.cast("double") / 10000) / n).alias("avg_qty"),
        n.alias("count_order"),
    )


sql_pair(
    "g01_global_agg",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price
    FROM lineitem
    """,
)

sql_pair(
    "g03_count_distinct",
    """
    SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_flag,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
)


@register(
    "g04_approx_count_distinct",
    duck_sql="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_within_bound, TRUE AS orders_within_bound
    FROM lineitem
    """,
)
def g04_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate (rsd=0.05). At 100 TB this replaces
    G03's exact distinct (which shuffles every key) with fixed-size
    mergeable sketches.

    Hashable form (r2 verdict ask #2): the registered result carries the
    EXACT distinct counts as hash anchors plus booleans asserting the HLL
    estimate lands within 3*rsd of exact — the accuracy assertion is folded
    into the row itself, so the driver gets a full hash-match instead of a
    permanent `no_oracle` row while the sketch path is still exercised."""
    li = spark.table("lineitem")
    rsd = 0.05
    tol = 3 * rsd  # 3-sigma relative bound on the HLL estimate
    agg = li.agg(
        F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"),
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", rsd).alias("ap"),
        F.approx_count_distinct("l_orderkey", rsd).alias("ao"),
    )
    return agg.select(
        "exact_parts",
        "exact_orders",
        (F.abs(F.col("ap") - F.col("exact_parts")) <= F.col("exact_parts") * tol).alias(
            "parts_within_bound"
        ),
        (F.abs(F.col("ao") - F.col("exact_orders")) <= F.col("exact_orders") * tol).alias(
            "orders_within_bound"
        ),
    )


sql_pair(
    "g05_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

sql_pair(
    "g06_cube",
    """
    SELECT l_returnflag, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY CUBE (l_returnflag, o_orderstatus)
    """,
)

sql_pair(
    "g07_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)

sql_pair(
    "g08_having",
    """
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) >= 5 AND SUM(CAST(l_quantity AS DECIMAL(18,4))) > 100
    """,
)

# min_by/max_by with a UNIQUE ordering key (o_orderkey) so ties can't occur.
sql_pair(
    "g09_min_max_by",
    """
    SELECT o_custkey,
           CAST(MIN_BY(o_totalprice, o_orderkey) AS DOUBLE) AS first_order_price,
           CAST(MAX_BY(o_totalprice, o_orderkey) AS DOUBLE) AS last_order_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey
    FROM orders
    GROUP BY o_custkey
    """,
)

sql_pair(
    "g10_sorted_list_agg",
    """
    SELECT n_regionkey,
           array_join(sort_array(collect_list(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    duck_sql="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)

sql_pair(
    "g11_stats_aggs",
    """
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
           ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 4) AS cov_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)

sql_pair(
    "g12_median",
    """
    SELECT l_returnflag,
           CAST(MEDIAN(l_quantity) AS DOUBLE) AS med_qty,
           CAST(MEDIAN(l_linenumber) AS DOUBLE) AS med_line
    FROM lineitem
    GROUP BY l_returnflag
    """,
)

sql_pair(
    "g13_filtered_agg",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderstatus = 'O')
                AS DOUBLE) AS open_value
    FROM orders
    GROUP BY o_orderpriority
    """,
)


@register(
    "g18_approx_percentile",
    duck_sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
           TRUE AS p50_within_bound, TRUE AS p95_within_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def g18_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch (G12's scale path: exact median sorts every
    group; the KLL-style sketch is fixed-size and mergeable across
    partitions).

    Hashable form (r2 verdict ask #2): emit EXACT interpolated percentiles
    (round 4, hash-anchored against DuckDB quantile_cont, same convention
    g19 proved out) plus booleans asserting the sketch value lands inside
    the exact [p-0.01, p+0.01] rank envelope — generous vs the sketch's
    1/accuracy = 1e-4 rank-error guarantee, so the row is deterministic."""
    li = spark.table("lineitem")
    pcts = F.array(*[F.lit(p) for p in (0.49, 0.5, 0.51, 0.94, 0.95, 0.96)])
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", pcts).alias("ex"),
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("ap"),
    )
    e = lambda i: F.element_at("ex", i)  # noqa: E731
    a = lambda i: F.element_at("ap", i)  # noqa: E731
    return agg.select(
        "l_returnflag",
        F.round(e(2), 4).alias("p50_exact"),
        F.round(e(5), 4).alias("p95_exact"),
        ((a(1) >= e(1)) & (a(1) <= e(3))).alias("p50_within_bound"),
        ((a(2) >= e(4)) & (a(2) <= e(6))).alias("p95_within_bound"),
    ).orderBy("l_returnflag")


sql_pair(
    "g19_percentile_exact",
    """
    SELECT l_returnflag,
           round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity), 4) AS q25,
           round(percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity), 4) AS q50,
           round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_quantity), 4) AS q75,
           round(percentile_disc(0.9)  WITHIN GROUP (ORDER BY l_quantity), 4) AS d90
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    duck_sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25,
           round(quantile_cont(l_quantity, 0.5), 4) AS q50,
           round(quantile_cont(l_quantity, 0.75), 4) AS q75,
           round(quantile_disc(l_quantity, 0.9), 4) AS d90
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="""Exact percentiles (interpolating + discrete) per group — the
    exact anchor for the g18 sketch variant. Exact percentile needs a full
    sort per group; the scale path is g18's approx_percentile sketch
    (mergeable, one pass).""",
)


@register(
    "g21_heavy_hitters_cms",
    duck_sql="""
    WITH counts AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    freq AS (SELECT token, COUNT(*) AS n FROM counts GROUP BY token)
    SELECT token, CAST(n AS BIGINT) AS exact_count, TRUE AS cms_within_bound
    FROM freq ORDER BY n DESC, token LIMIT 10
    """,
)
def g21_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Count-Min Sketch, bound-checked against exact
    counts (same hashable pattern as g04/g18): result rows are the exact
    top-10 tokens (hash anchor) plus a boolean asserting the CMS estimate
    obeys its guarantee (exact <= est <= exact + eps*N at eps=0.001).

    Scale rationale: the exact token group-by shuffles every distinct
    token; the CMS is a fixed 2.7 KB-per-row-of-depth mergeable sketch
    computed in one pass with partial aggregation — at 100 TB you keep the
    sketch and drop the exact side (here both run so the sketch is
    verified)."""
    eps, conf = 0.001, 0.99
    tok = spark.table("documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    )
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(10)
        .collect()
    )
    n_rows = tok.count()
    sk_bytes = bytes(
        tok.agg(
            F.count_min_sketch(
                "token", F.lit(eps), F.lit(conf), F.lit(42)
            ).alias("sk")
        ).first()["sk"]
    )
    jvm = spark._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(sk_bytes)
    )
    slack = int(eps * n_rows) + 1
    rows = [
        (
            r["token"],
            int(r["n"]),
            bool(r["n"] <= sk.estimateCount(r["token"]) <= r["n"] + slack),
        )
        for r in top
    ]
    return spark.createDataFrame(
        rows, "token STRING, exact_count BIGINT, cms_within_bound BOOLEAN"
    )


sql_pair(
    "g20_regression_aggs",
    """
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 4) AS r,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS cov_s,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS icpt,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="""Bivariate statistical aggregates (corr / covariance / least-
    squares fit) — single-pass mergeable accumulators on both engines, so
    they scale as partial+final aggregation like any sum.""",
)


@register(
    "g22_histogram",
    duck_sql="""
    WITH b AS (
      SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket
      FROM lineitem)
    SELECT bucket,
           -- CAST to DOUBLE: DuckDB's BIGINT * DECIMAL literal stays
           -- DECIMAL(s=1) while Spark's `col * 5000.0` is float64 — a
           -- rendering-type drift the driver's typed hash rejects even
           -- though the values (exact 5000-multiples) are identical.
           CAST(bucket * 5000.0 AS DOUBLE) AS lo,
           CAST((bucket + 1) * 5000.0 AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket
    """,
)
def g22_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (5000-wide buckets over l_extendedprice):
    one partial-aggregated groupBy on the computed bucket — the
    mergeable building block for distributed distribution profiling."""
    b = F.floor(F.col("l_extendedprice") / 5000.0).cast("bigint")
    return (
        spark.table("lineitem")
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 5000.0).alias("lo"),
            ((F.col("bucket") + 1) * 5000.0).alias("hi"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


@register(
    "g23_mode",
    duck_sql="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n FROM events
      GROUP BY user_id, event_type)
    SELECT user_id, event_type AS mode_event, CAST(n AS BIGINT) AS n
    FROM (SELECT user_id, event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY n DESC, event_type) AS rn
          FROM c) t
    WHERE rn = 1
    """,
)
def g23_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with deterministic tie-break (count DESC, value
    ASC): the raw rows partial-aggregate into (group, value, n) tallies
    first, and only that tally table — bounded by groups × distinct
    values, not row count — passes through the rank window."""
    c = (
        spark.table("events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", F.col("event_type").alias("mode_event"),
                F.col("n").cast("bigint").alias("n"))
    )


sql_pair(
    "g24_skew_kurtosis",
    """
    SELECT l_returnflag,
           ROUND(skewness(CAST(l_quantity AS DOUBLE)), 3) AS skew,
           ROUND(kurtosis(CAST(l_quantity AS DOUBLE)), 3) AS kurt
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    """
    WITH b AS (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q FROM lineitem),
    m AS (SELECT l_returnflag, avg(q) AS mu, avg(q*q) AS m2r,
                 avg(q*q*q) AS m3r, avg(q*q*q*q) AS m4r
          FROM b GROUP BY 1)
    SELECT l_returnflag,
           ROUND((m3r - 3*mu*m2r + 2*mu*mu*mu)
                 / pow(m2r - mu*mu, 1.5), 3) AS skew,
           ROUND((m4r - 4*mu*m3r + 6*mu*mu*m2r - 3*pow(mu, 4))
                 / pow(m2r - mu*mu, 2) - 3, 3) AS kurt
    FROM m ORDER BY l_returnflag
    """,
    doc="Higher-moment aggregates: Spark's skewness/kurtosis use the "
        "POPULATION formulas (g1 = m3/m2^1.5, excess g2 = m4/m2^2 - 3), "
        "while DuckDB's natives are bias-corrected sample statistics — "
        "the oracle composes the population definitions from raw moments "
        "(one partial-agg pass; mergeable, skew-safe).",
)


@register(
    "g25_hll_sketch_distinct",
    duck_sql="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS within_2pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def g25_hll_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL per group (hll_sketch_agg, Spark 3.5+):
    unlike g04's approx_count_distinct, the SKETCH itself is a column —
    mergeable across partitions/days with hll_union_agg, which is what a
    100 TB incremental-rollup pipeline stores. Hashable g04-style form:
    exact per-group anchors + a boolean asserting the sketch estimate
    lands within 2% of exact (lgConfigK=14 → ~0.8% rse, 2% ≈ 2.5 sigma)."""
    li = spark.table("lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_orders"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey, 14))").alias("est"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("est") - F.col("exact_orders"))
            <= F.col("exact_orders") * 0.02
        ).alias("within_2pct"),
    ).orderBy("l_returnflag")


@register(
    "g26_hll_union_rollup",
    duck_sql="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS within_2pct
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def g26_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY — the property that makes sketches the 100 TB
    distinct-count answer: per-(flag, ship-month) HLL sketches (what an
    incremental pipeline would persist daily) re-aggregate to per-flag
    via hll_union_agg WITHOUT touching raw data again; the estimate off
    the merged sketch must land within 2% of the exact global distinct.
    Two-level plan: fine-grained sketch agg → sketch-union agg — raw
    keys cross the wire once, sketches (~10 KB) thereafter."""
    li = spark.table("lineitem")
    daily = li.groupBy(
        "l_returnflag", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.expr("hll_sketch_agg(l_orderkey, 14)").alias("sk"),
        F.countDistinct("l_orderkey").alias("_ignore"),
    )
    merged = daily.groupBy("l_returnflag").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_orders")
    )
    return (
        exact.join(merged, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_orders",
            (
                F.abs(F.col("est") - F.col("exact_orders"))
                <= F.col("exact_orders") * 0.02
            ).alias("within_2pct"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "g29_median_abs_deviation",
    duck_sql="""
    SELECT event_type,
           ROUND(CAST(median(value) AS DOUBLE), 4) AS med_value,
           ROUND(CAST(mad(value) AS DOUBLE), 4) AS mad_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="G29: per-group median absolute deviation — the robust dispersion "
        "stat quality pipelines use for outlier gating. Engine side "
        "composes it from two exact-median passes (median per group, "
        "broadcast the tiny per-group medians back, median of |x-med|); "
        "the oracle is DuckDB's NATIVE mad() — an independent "
        "implementation, so agreement is a strong check. Scale: groups "
        "are low-cardinality (event types), medians per group via "
        "single-shuffle sort-based exact percentile; the medians frame "
        "is group-count-sized and broadcast.",
)
def g29_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.table("events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med_value"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med_value"))
    )
    return (
        dev.groupBy("event_type")
        .agg(
            F.round(F.first("med_value"), 4).alias("med_value"),
            F.round(F.median("absdev"), 4).alias("mad_value"),
        )
        .orderBy("event_type")
    )


_G27_SPARK = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(conv(substr(md5(concat_ws('|',
                CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING),
                l_returnflag, l_linestatus,
                CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS STRING),
                date_format(l_shipdate, 'yyyy-MM-dd'))), 1, 12), 16, 10)
             AS DECIMAL(38,0))) AS STRING) AS sum_check,
           CAST(bit_xor(CAST(conv(substr(md5(concat_ws('|',
                CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING),
                l_returnflag, l_linestatus,
                CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS STRING),
                date_format(l_shipdate, 'yyyy-MM-dd'))), 1, 12), 16, 10)
             AS BIGINT)) AS BIGINT) AS xor_check
    FROM lineitem
    """


@register(
    "g27_table_checksum",
    duck_sql="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(concat('0x', substr(md5(concat_ws('|',
                CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING),
                l_returnflag, l_linestatus,
                CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS STRING),
                strftime(l_shipdate, '%Y-%m-%d'))), 1, 12)) AS UBIGINT))
             AS STRING) AS sum_check,
           CAST(bit_xor(CAST(concat('0x', substr(md5(concat_ws('|',
                CAST(l_orderkey AS STRING), CAST(l_linenumber AS STRING),
                l_returnflag, l_linestatus,
                CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS STRING),
                strftime(l_shipdate, '%Y-%m-%d'))), 1, 12)) AS UBIGINT))
             AS BIGINT) AS xor_check
    FROM lineitem
    """,
    doc="G27: order-independent table checksum — count + commutative SUM "
        "and XOR of a 48-bit md5 prefix of each row's canonical rendering "
        "(decimal-exact numeric strings, explicit date format, '|' joins). "
        "The anti-entropy primitive for comparing a 100 TB table across "
        "clusters/engines without sorting anything: fully partial-agg, one "
        "tiny final merge, no shuffle of data rows. Cross-engine by "
        "construction (md5 is bit-identical everywhere); DuckDB computes "
        "the identical scalar pipeline via 0x-prefix UBIGINT casts. "
        "Spark side reads through a spread() base view so the per-row "
        "md5 render parallelizes on a single-split local fixture "
        "(no-op on real multi-split layouts; the g54 pattern).",
)
def g27_table_checksum(spark, sf_dir):
    from pydatalake_gen2_spark.operators.util import spread

    spread(
        spark.table("lineitem").select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
            "l_extendedprice", "l_shipdate",
        )
    ).createOrReplaceTempView("g27_base")
    return spark.sql(_G27_SPARK.replace("FROM lineitem", "FROM g27_base"))


sql_pair(
    "g28_quality_audit",
    """
    WITH m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_rows,
             CAST(count(l_quantity) AS DOUBLE) AS qty_nonnull,
             CAST(count(DISTINCT l_orderkey, l_linenumber) AS DOUBLE)
               AS key_distinct,
             CAST(min(l_discount) AS DOUBLE) AS min_disc,
             CAST(max(l_discount) AS DOUBLE) AS max_disc,
             CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0
                           ELSE 1 END) AS DOUBLE) AS bad_flag
      FROM lineitem)
    SELECT check_name, ROUND(metric, 4) AS metric, passed FROM (
      SELECT stack(5,
        'completeness_l_quantity', qty_nonnull / n_rows, qty_nonnull = n_rows,
        'uniqueness_order_line',   key_distinct / n_rows, key_distinct = n_rows,
        'min_discount_ge_0',       min_disc,              min_disc >= 0.0,
        'max_discount_le_1',       max_disc,              max_disc <= 1.0,
        'domain_returnflag',       bad_flag,              bad_flag = 0.0
      ) AS (check_name, metric, passed) FROM m)
    ORDER BY check_name
    """,
    """
    WITH m AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_rows,
             CAST(count(l_quantity) AS DOUBLE) AS qty_nonnull,
             CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE)
               AS key_distinct,
             CAST(min(l_discount) AS DOUBLE) AS min_disc,
             CAST(max(l_discount) AS DOUBLE) AS max_disc,
             CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0
                           ELSE 1 END) AS DOUBLE) AS bad_flag
      FROM lineitem)
    SELECT 'completeness_l_quantity' AS check_name,
           ROUND(qty_nonnull / n_rows, 4) AS metric,
           qty_nonnull = n_rows AS passed FROM m
    UNION ALL SELECT 'uniqueness_order_line', ROUND(key_distinct / n_rows, 4),
           key_distinct = n_rows FROM m
    UNION ALL SELECT 'min_discount_ge_0', ROUND(min_disc, 4),
           min_disc >= 0.0 FROM m
    UNION ALL SELECT 'max_discount_le_1', ROUND(max_disc, 4),
           max_disc <= 1.0 FROM m
    UNION ALL SELECT 'domain_returnflag', ROUND(bad_flag, 4),
           bad_flag = 0.0 FROM m
    ORDER BY check_name
    """,
    doc="G28: deequ-style data-quality audit — completeness, key "
        "uniqueness, numeric bounds, and categorical-domain checks "
        "computed in ONE aggregation pass over the table (a single "
        "partial+final HashAggregate; the count-distinct expands to one "
        "extra shuffle on the key), then unpivoted row-per-check with a "
        "boolean verdict. The shape a 100 TB nightly table-health job "
        "wants: metrics all ride the same scan, verdicts are row-local "
        "on a 1-row frame. Spark side renders the report via stack(); "
        "the oracle unpivots the same 1-row CTE with UNION ALL.",
)


@register(
    "g31_observe_metrics",
    duck_sql="""
    SELECT CAST(count(*) AS BIGINT)                   AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_min,
           CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_max
    FROM lineitem
    """,
)
def g31_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G31: the Observation API — named metrics attached to a running
    query (`df.observe(...)`) and harvested from the driver AFTER the
    action, with ZERO extra scan: the aggregates ride the same tasks as
    the job they instrument. This is how a production pipeline exports
    row counts / bounds / null tallies for every batch without paying a
    second pass over 100 TB (the push-based alternative to G28's
    dedicated audit query). Metrics here are integer-exact so the
    harvested values hash-match the oracle's standalone aggregation."""
    from pyspark.sql import Observation

    obs = Observation("g31")
    base = spark.table("lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty_sum"),
        F.min(F.col("l_quantity").cast("bigint")).alias("qty_min"),
        F.max(F.col("l_quantity").cast("bigint")).alias("qty_max"),
    )
    base.count()  # the instrumented action; metrics are now available
    m = obs.get
    return spark.createDataFrame(
        [(m["n"], m["qty_sum"], m["qty_min"], m["qty_max"])],
        "n BIGINT, qty_sum BIGINT, qty_min BIGINT, qty_max BIGINT",
    )


_G32_SPARK = """
    WITH f AS (
      SELECT {fences}
      FROM orders),
    b AS (
      SELECT o_totalprice AS v,
             1 {bucket} AS bucket
      FROM orders, f)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           ROUND(min(v), 2) AS lo, ROUND(max(v), 2) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
"""


def _g32_pair() -> tuple[str, str]:
    ks = [i / 8 for i in range(1, 8)]
    spark_f = ", ".join(
        f"percentile_disc({k}) WITHIN GROUP (ORDER BY o_totalprice) AS q{i}"
        for i, k in enumerate(ks, 1)
    )
    duck_f = ", ".join(
        f"quantile_disc(o_totalprice, {k}) AS q{i}" for i, k in enumerate(ks, 1)
    )
    spark_b = " ".join(
        f"+ (CASE WHEN o_totalprice > f.q{i} THEN 1 ELSE 0 END)" for i in range(1, 8)
    )
    duck_b = " ".join(f"+ CAST(o_totalprice > f.q{i} AS INT)" for i in range(1, 8))
    return (
        _G32_SPARK.format(fences=spark_f, bucket=spark_b),
        _G32_SPARK.format(fences=duck_f, bucket=duck_b),
    )


_g32_s, _g32_d = _g32_pair()

sql_pair(
    "g32_equiheight_histogram",
    _g32_s,
    _g32_d,
    doc="G32: equi-HEIGHT histogram (equal row counts per bucket; g22 is "
        "the equi-width sibling) built the scale-right way: bucket fences "
        "come from exact discrete percentiles (one agg), assignment is a "
        "row-local CASE ladder against the 7 broadcast fence values, "
        "counts are one more partial agg — NO global ntile sort of the "
        "table, which is the naive formulation's 100 TB killer. Exact "
        "discrete quantiles on data values keep both engines bit-equal.",
)


sql_pair(
    "g33_skew_report",
    """
    WITH c AS (
      SELECT l_suppkey AS key, count(*) AS n FROM lineitem GROUP BY l_suppkey),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(n) AS BIGINT) AS total,
             CAST(max(n) AS BIGINT) AS max_n
      FROM c),
    top AS (SELECT key, n FROM c ORDER BY n DESC, key LIMIT 5)
    SELECT t.key, CAST(t.n AS BIGINT) AS n, s.n_keys, s.total,
           CAST(t.n AS DOUBLE) / s.total AS share,
           CAST(s.max_n AS DOUBLE) * s.n_keys / s.total AS skew_factor
    FROM top t CROSS JOIN s ORDER BY n DESC, key
    """,
    doc="G33: join-key skew diagnostic — per-key tallies (partial agg; "
        "the shuffle carries key counts, not rows), hottest keys, each "
        "hot key's share of all rows, and skew_factor = max/mean (the "
        "number that says whether AQE skew-split / JX salting is needed "
        "BEFORE a 100 TB join is launched). The report any production "
        "join planner wants next to its query.",
)


@register(
    "g34_approx_top_k",
    duck_sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type LIMIT 3
    """,
    doc="G34: approx_top_k heavy hitters (Spark 4 native DataSketches "
        "frequent-items). At this cardinality (5 types < maxItemsTracked) "
        "the sketch is EXACT, so the pair hashes against the exact "
        "oracle; the 100 TB story is the sketch's bounded memory and "
        "mergeable partials — the engine-native sibling of G21's "
        "hand-rolled count-min sketch. The fixture's type counts are "
        "strictly separated at every SF, so top-3 membership and order "
        "are deterministic.",
)
def g34_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH s AS (SELECT approx_top_k(event_type, 3) AS tk FROM events)
        SELECT x.item AS event_type, CAST(x.count AS BIGINT) AS n
        FROM s LATERAL VIEW inline(tk) x AS item, count
        """
    )


@register(
    "g35_bitmap_distinct",
    duck_sql="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="G35: bitmap-index distinct counting (bitmap_bit_position → "
        "bitmap_construct_agg → bitmap_count, Spark 3.5+) — the "
        "roaring-bitmap-style exact-distinct path: per-bucket bitmaps "
        "are fixed-size, mergeable partials, so the shuffle carries "
        "bitmap bytes instead of raw key sets, and rollups across "
        "groups re-merge bitmaps with bitmap_or_agg instead of "
        "re-scanning. The hash match against count(DISTINCT) certifies "
        "exactness; the scale story is G25/G26's (HLL) with exactness "
        "kept and memory bounded by keyspace/8 bits per bucket.",
)
def g35_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH buckets AS (
          SELECT o_orderpriority,
                 bitmap_bucket_number(o_custkey) AS bkt,
                 bitmap_construct_agg(bitmap_bit_position(o_custkey)) AS bm
          FROM orders GROUP BY o_orderpriority, bitmap_bucket_number(o_custkey))
        SELECT o_orderpriority,
               CAST(sum(bitmap_count(bm)) AS BIGINT) AS n_cust
        FROM buckets GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


sql_pair(
    "g36_join_cardinality_preflight",
    """
    WITH a AS (SELECT o_custkey AS k, count(*) AS ca FROM orders GROUP BY o_custkey),
         b AS (SELECT c_custkey AS k, count(*) AS cb FROM customer GROUP BY c_custkey)
    SELECT CAST(sum(a.ca * b.cb) AS BIGINT)            AS join_rows,
           CAST(count(*) AS BIGINT)                    AS matched_keys,
           CAST((SELECT count(*) FROM a) AS BIGINT)    AS keys_left,
           CAST((SELECT count(*) FROM b) AS BIGINT)    AS keys_right,
           CAST(max(a.ca * b.cb) AS BIGINT)            AS hottest_key_rows
    FROM a JOIN b ON a.k = b.k
    """,
    doc="G36: join-cardinality pre-flight — the EXACT output size of "
        "orders⋈customer computed from per-key tallies (Σ cntA·cntB) "
        "before the join is ever launched, plus the hottest key's "
        "contribution. G33's skew report answers 'is one key hot'; this "
        "answers 'how many rows will the join emit and who dominates' — "
        "the two numbers a planner (or an engineer sizing shuffle "
        "partitions for a 100 TB join) wants first. Cost: two partial-agg "
        "tally shuffles + a key-level join — tallies, never rows.",
)


sql_pair(
    "g37_grouping_id",
    """
    SELECT COALESCE(l_returnflag, '(all)') AS flag,
           COALESCE(l_linestatus, '(all)') AS status,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="G37: GROUPING() metadata under ROLLUP — the bit that "
        "distinguishes 'NULL because the data is NULL' from 'NULL "
        "because this row is a subtotal', without which rollup outputs "
        "are ambiguous to consumers. Same partial-agg rollup plan as "
        "G05; the grouping bits ride the aggregation for free.",
)


def _g44_sql(duck: bool) -> str:
    # Round-6 hardening: 2*U1 = r1x2 - n1*(n1+1) and the tie cube sum
    # are wide-decimal integers that can pass 2^53 (~1e20 at 1e10 rows);
    # they reach DOUBLE via sqlexact.dec2dbl's deterministic hi/lo
    # split, never the native decimal cast (DuckDB's int128->double is
    # not correctly rounded).
    u1x2 = _dec2dbl(duck, "r1x2 - CAST(n1 AS DECIMAL(19,0)) * (n1 + 1)")
    tie3 = _dec2dbl(duck, "tie3")
    return f"""
    WITH g AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS in1
      FROM orders WHERE o_orderstatus IN ('F', 'O')),
    spine AS (
      SELECT v, CAST(SUM(in1) AS BIGINT) AS c1,
             CAST(COUNT(*) - SUM(in1) AS BIGINT) AS c2
      FROM g GROUP BY v),
    ranked AS (
      SELECT v, c1, c2, c1 + c2 AS c,
             COALESCE(SUM(c1 + c2) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM spine),
    s AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2,
             SUM(CAST(c1 AS DECIMAL(19,0)) * (2 * cb + c + 1)) AS r1x2,
             SUM(CAST(c AS DECIMAL(19,0)) * c * c - c) AS tie3
      FROM ranked)
    SELECT n1, n2,
           {u1x2} / 2 AS u1,
           ROUND({u1x2} / 2
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS auc,
           ROUND(({u1x2} / 2
                  - CAST(n1 AS DOUBLE) * n2 / 2)
                 / SQRT(CAST(n1 AS DOUBLE) * n2 / 12
                        * ((n1 + n2 + 1)
                           - {tie3}
                             / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1.0)))), 6) AS z
    FROM s
"""

sql_pair(
    "g44_mann_whitney",
    _g44_sql(duck=False),
    duck_sql=_g44_sql(duck=True),
    doc="G44: Mann-Whitney U rank-sum test between finished ('F') and open "
        "('O') order price distributions — the nonparametric sibling of "
        "G41's KS test (KS asks 'same distribution?'; U also yields "
        "AUC = P(F-order price > O-order price), the effect size). Ranks "
        "are never materialized per row: the distinct-value spine carries "
        "per-value group tallies, midranks come from the cumulative count "
        "(2*midrank = 2*cum_before + ties + 1, integer), and 2*R1 is an "
        "exact DECIMAL(19+)-width sum (hugeint-safe in DuckDB, overflow-"
        "safe at 1e10 rows). Tie-corrected normal z and AUC take one IEEE "
        "expression each, ROUND(6). Cost: one partial-agg shuffle to the "
        "spine + a bounded window over distinct prices.",
)


_G45_MOMENTS = """
      SELECT CAST(SUM(CAST(q AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s_q,
             CAST(SUM(CAST(p AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s_p,
             CAST(SUM(CAST(d AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s_d,
             CAST(SUM(CAST(t AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS s_t,
             CAST(SUM(CAST(q AS DECIMAL(19,0)) * q) AS DECIMAL(38,0)) AS s_qq,
             CAST(SUM(CAST(p AS DECIMAL(19,0)) * p) AS DECIMAL(38,0)) AS s_pp,
             CAST(SUM(CAST(d AS DECIMAL(19,0)) * d) AS DECIMAL(38,0)) AS s_dd,
             CAST(SUM(CAST(t AS DECIMAL(19,0)) * t) AS DECIMAL(38,0)) AS s_tt,
             CAST(SUM(CAST(q AS DECIMAL(19,0)) * p) AS DECIMAL(38,0)) AS s_qp,
             CAST(SUM(CAST(q AS DECIMAL(19,0)) * d) AS DECIMAL(38,0)) AS s_qd,
             CAST(SUM(CAST(q AS DECIMAL(19,0)) * t) AS DECIMAL(38,0)) AS s_qt,
             CAST(SUM(CAST(p AS DECIMAL(19,0)) * d) AS DECIMAL(38,0)) AS s_pd,
             CAST(SUM(CAST(p AS DECIMAL(19,0)) * t) AS DECIMAL(38,0)) AS s_pt,
             CAST(SUM(CAST(d AS DECIMAL(19,0)) * t) AS DECIMAL(38,0)) AS s_dt,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM c
"""

def _g45_corr(duck: bool, x: str, y: str, xy: str, xx: str, yy: str) -> str:
    # Round-6 hardening: each covariance term n*S_xy - S_x*S_y is now an
    # EXACT wide-integer (the old form multiplied ALREADY-CAST doubles of
    # >2^53 moments — s_pp ~ 1.5e18 at sf0.01 — inheriting DuckDB's
    # 1-ulp int128->double cast drift); the single conversion to DOUBLE
    # goes through sqlexact.dec2dbl's deterministic hi/lo split.
    # Magnitudes: n*s ~ 9e22 at sf0.01, ~9e28 at sf100 — inside
    # wide-int range and dec2dbl's hi-fits-BIGINT bound (9.2e33).
    def cov(a: str, b: str, ab: str) -> str:
        return _dec2dbl(
            duck,
            f"{_wide_mul(duck, 'n', 's_' + ab)} - "
            f"{_wide_mul(duck, 's_' + a, 's_' + b)}",
        )

    return (
        f"ROUND({cov(x, y, xy)}"
        f" / SQRT({cov(x, x, xx)}"
        f"        * {cov(y, y, yy)}), 6)"
    )

_G45_PREFIX = (
    """
    WITH c AS (
      SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
             CAST(round(l_discount * 100) AS BIGINT) AS d,
             CAST(round(l_tax * 100) AS BIGINT) AS t
      FROM lineitem),
    m AS ("""
    + _G45_MOMENTS
    + """)"""
)

# DuckDB re-evaluates the small scalar CTE per branch cheaply; Spark would
# INLINE it into six full lineitem scans, so the Spark text unpivots the
# single moments row with stack() instead (one scan, one aggregate).
_G45_DUCK = (
    _G45_PREFIX
    + """
    SELECT pair, corr FROM (
      SELECT 'quantity~extendedprice' AS pair, """
    + _g45_corr(True, "q", "p", "qp", "qq", "pp")
    + """ AS corr FROM m
      UNION ALL SELECT 'quantity~discount', """
    + _g45_corr(True, "q", "d", "qd", "qq", "dd")
    + """ FROM m
      UNION ALL SELECT 'quantity~tax', """
    + _g45_corr(True, "q", "t", "qt", "qq", "tt")
    + """ FROM m
      UNION ALL SELECT 'extendedprice~discount', """
    + _g45_corr(True, "p", "d", "pd", "pp", "dd")
    + """ FROM m
      UNION ALL SELECT 'extendedprice~tax', """
    + _g45_corr(True, "p", "t", "pt", "pp", "tt")
    + """ FROM m
      UNION ALL SELECT 'discount~tax', """
    + _g45_corr(True, "d", "t", "dt", "dd", "tt")
    + """ FROM m
    ) ORDER BY pair
    """
)

_G45_SPARK = (
    _G45_PREFIX
    + """
    SELECT pair, corr FROM (
      SELECT stack(6,
        'quantity~extendedprice', """
    + _g45_corr(False, "q", "p", "qp", "qq", "pp")
    + """,
        'quantity~discount', """
    + _g45_corr(False, "q", "d", "qd", "qq", "dd")
    + """,
        'quantity~tax', """
    + _g45_corr(False, "q", "t", "qt", "qq", "tt")
    + """,
        'extendedprice~discount', """
    + _g45_corr(False, "p", "d", "pd", "pp", "dd")
    + """,
        'extendedprice~tax', """
    + _g45_corr(False, "p", "t", "pt", "pp", "tt")
    + """,
        'discount~tax', """
    + _g45_corr(False, "d", "t", "dt", "dd", "tt")
    + """) AS (pair, corr)
      FROM m)
    ORDER BY pair
    """
)

@register(
    "g45_correlation_matrix",
    duck_sql=_G45_DUCK,
    doc="G45: pairwise Pearson correlation matrix over the four lineitem "
        "measures (quantity, extendedprice, discount, tax) from EXACT "
        "integer-cents moments — one single-pass partial aggregate "
        "computes all 14 sums (Σx, Σx², Σxy at DECIMAL(38,0); the "
        "DECIMAL(19,0) operand casts force hugeint multiply in DuckDB "
        "and overflow-safety at 1e10 rows in Spark), then each corr is "
        "one IEEE expression ROUND(6) over the scalar moments — the "
        "scale factors cancel. The feature-selection / drift pre-flight "
        "for any numeric feature matrix: one scan, one 14-number shuffle, "
        "zero per-pair passes. Spark side reads through a spread() base "
        "view so the 14-sum partial aggregate parallelizes on a "
        "single-split local fixture (no-op on real multi-split layouts; "
        "the g27/g54 pattern).",
)
def g45_correlation_matrix(spark, sf_dir):
    from pydatalake_gen2_spark.operators.util import spread

    spread(
        spark.table("lineitem").select(
            "l_quantity", "l_extendedprice", "l_discount", "l_tax"
        )
    ).createOrReplaceTempView("g45_base")
    return spark.sql(_G45_SPARK.replace("FROM lineitem", "FROM g45_base"))


sql_pair(
    "g46_categorical_entropy",
    """
    WITH t AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
             CAST(count(*) AS BIGINT) AS c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_orderpriority),
    s AS (SELECT seg, CAST(SUM(c) AS BIGINT) AS ns,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM t GROUP BY seg)
    SELECT t.seg AS segment, s.ns AS n_orders, s.k AS n_priorities,
           CAST(SUM(CAST(ROUND(
                 -(CAST(t.c AS DOUBLE) / s.ns)
                  * LN(CAST(t.c AS DOUBLE) / s.ns), 8)
               AS DECIMAL(20,8))) AS DOUBLE) AS entropy_nats,
           ROUND(CAST(SUM(CAST(ROUND(
                 -(CAST(t.c AS DOUBLE) / s.ns)
                  * LN(CAST(t.c AS DOUBLE) / s.ns), 8)
               AS DECIMAL(20,8))) AS DOUBLE) / LN(CAST(s.k AS DOUBLE)), 6)
             AS entropy_normalized
    FROM t JOIN s ON t.seg = s.seg
    GROUP BY t.seg, s.ns, s.k ORDER BY t.seg
    """,
    doc="G46: Shannon entropy (and normalized entropy) of the order-"
        "priority mix per market segment — the concentration/diversity "
        "audit next to L58's KL (KL measures drift BETWEEN distributions; "
        "entropy measures flatness OF one). Integer contingency tallies "
        "(one partial-agg shuffle, |seg|x|pri| cells cross the wire), "
        "each -p*ln(p) term ROUND(8) then summed EXACTLY as "
        "DECIMAL(20,8) — order-independent across engines (the L58/GR07 "
        "discipline).",
)


sql_pair(
    "g47_winsorized_mean",
    """
    WITH c AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
    q AS (
      SELECT PERCENTILE_DISC(0.05) WITHIN GROUP (ORDER BY cents) AS lo,
             PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY cents) AS hi
      FROM c)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           -- CAST to BIGINT: Spark's percentile_disc returns DOUBLE
           -- while DuckDB's returns the input type (BIGINT); the fence
           -- is an actual data value (exact integer cents), so the cast
           -- is lossless on both engines and pins one rendering class.
           CAST(q.lo AS BIGINT) AS lo_cents,
           CAST(q.hi AS BIGINT) AS hi_cents,
           CAST(SUM(CASE WHEN cents < q.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_low,
           CAST(SUM(CASE WHEN cents > q.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped_high,
           ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 4) AS mean_raw,
           ROUND(CAST(SUM(CASE WHEN cents < q.lo THEN q.lo
                               WHEN cents > q.hi THEN q.hi
                               ELSE cents END) AS DOUBLE)
                 / COUNT(*) / 100, 4) AS mean_winsorized,
           ROUND(CAST(SUM(CASE WHEN cents BETWEEN q.lo AND q.hi
                               THEN cents END) AS DOUBLE)
                 / SUM(CASE WHEN cents BETWEEN q.lo AND q.hi
                            THEN 1 ELSE 0 END) / 100, 4) AS mean_trimmed
    FROM c CROSS JOIN q GROUP BY q.lo, q.hi
    """,
    doc="G47: winsorized + trimmed robust means of order totals — the "
        "outlier-resistant center estimates G29's MAD is the spread "
        "sibling of. The 5%/95% fences come from PERCENTILE_DISC, which "
        "returns ACTUAL data values (discrete, no interpolation float — "
        "the G43 discipline), so clamping and trimming are exact integer "
        "comparisons on cents; every sum is an exact integer and only "
        "the three final means divide, ROUND(4). One scan + one sort for "
        "the discrete quantiles; at 100 TB swap PERCENTILE_DISC for "
        "G18's approx_percentile fences, same downstream arithmetic.",
)


# ---------------------------------------------------------------------------
# g53: two-proportion z-test (A/B experiment readout)
# ---------------------------------------------------------------------------

sql_pair(
    "g53_two_proportion_ztest",
    """
    WITH assigned AS (
      SELECT CAST(o_custkey % 2 AS INT) AS arm,
             CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS conv
      FROM orders),
    cells AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(conv) AS BIGINT) AS x
      FROM assigned GROUP BY arm),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 0 THEN n END) AS n0,
        MAX(CASE WHEN arm = 0 THEN x END) AS x0,
        MAX(CASE WHEN arm = 1 THEN n END) AS n1,
        MAX(CASE WHEN arm = 1 THEN x END) AS x1
      FROM cells)
    SELECT n0, x0, n1, x1,
           ROUND(CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS p0,
           ROUND(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p1,
           ROUND(
             (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             / SQRT((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))),
             6) AS z_stat,
           CASE WHEN ABS(
             (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             / SQRT((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
                    * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))))
             > 1.959963985 THEN 1 ELSE 0 END AS significant_95
    FROM wide
    """,
    doc="G53: two-proportion z-test — the A/B-experiment readout next to "
        "G50's Welch t (means) and the chi-square family: arm assignment "
        "is the deterministic key parity CAST(o_custkey %% 2 AS INT) (the "
        "hash-bucket split every experimentation platform uses), the "
        "conversion event is an exact integer predicate, and the four "
        "cell counts (n0,x0,n1,x1) are the ONLY aggregates — one "
        "partial+final agg over one scan, four bigints cross the shuffle "
        "regardless of table size. The pooled-variance z statistic and "
        "the |z| > 1.96 significance verdict are one final DOUBLE "
        "expression over those integers (every operand explicitly CAST "
        "to DOUBLE before mixing with fractional literals — the shared-"
        "text decimal-arithmetic trap), ROUND(6). At 100 TB the shape is "
        "unchanged: counts are mergeable, the test is driver-side "
        "arithmetic on four numbers. One SQL text, both dialects.",
)


# ---------------------------------------------------------------------------
# g54: deterministic bootstrap confidence interval for the mean
# ---------------------------------------------------------------------------

# The one dialect divergence in this pair is PHYSICAL, not logical: the
# Spark side materializes the base CTE as a temp view fed through
# util.spread(), because the ×100 replicate expansion + LCG + partial
# sums all run pre-exchange — on the single-split local fixture that
# serialized the whole bootstrap into ONE task (r11 event-log: a 3.2 s
# single-task stage was ~90% of the query; spreading cut it 2.7 s ->
# 1.1 s, rows identical). On a real cluster the orders scan has more
# splits than cores and spread() is a no-op. The SQL text below this
# base is shared verbatim with the DuckDB oracle.
_G54_BASE_DUCK = """
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders),
"""

_G54_BASE_SPARK = """
    WITH base AS (SELECT k, cents FROM g54_base),
"""

_G54_TAIL = """
    reps AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY k) AS BIGINT) - 1 AS b
      FROM (SELECT k FROM base ORDER BY k LIMIT 100) t),
    draws AS (
      SELECT r.b, i.cents,
             ((1103515245 * ((r.b + 1) * 1000003 + i.k) + 12345)
               % 2147483648 + 2147483648) % 2147483648 AS u
      FROM base i CROSS JOIN reps r),
    weighted AS (
      SELECT b, cents,
             (CASE WHEN u >= 790015084 THEN 1 ELSE 0 END)
           + (CASE WHEN u >= 1580030168 THEN 1 ELSE 0 END)
           + (CASE WHEN u >= 1975037710 THEN 1 ELSE 0 END)
           + (CASE WHEN u >= 2106706891 THEN 1 ELSE 0 END)
           + (CASE WHEN u >= 2139624186 THEN 1 ELSE 0 END)
           + (CASE WHEN u >= 2146207645 THEN 1 ELSE 0 END)
           + (CASE WHEN u >= 2147304888 THEN 1 ELSE 0 END)
           + (CASE WHEN u >= 2147461638 THEN 1 ELSE 0 END)
           + (CASE WHEN u >= 2147481231 THEN 1 ELSE 0 END) AS w
      FROM draws),
    rep_sums AS (
      SELECT b, CAST(SUM(w * cents) AS BIGINT) AS s,
             CAST(SUM(w) AS BIGINT) AS wn
      FROM weighted GROUP BY b),
    means AS (
      SELECT b, CAST(s AS DOUBLE) / CAST(wn AS DOUBLE) AS m
      FROM rep_sums WHERE wn > 0),
    dist AS (
      SELECT PERCENTILE_DISC(0.025) WITHIN GROUP (ORDER BY m) AS lo_m,
             PERCENTILE_DISC(0.975) WITHIN GROUP (ORDER BY m) AS hi_m,
             CAST(COUNT(*) AS BIGINT) AS n_boot
      FROM means),
    point AS (SELECT CAST(SUM(cents) AS BIGINT) AS s0,
                     CAST(COUNT(*) AS BIGINT) AS nrows
              FROM base)
    SELECT n_boot,
           ROUND(CAST(s0 AS DOUBLE) / CAST(nrows AS DOUBLE) / 100, 4) AS mean_estimate,
           ROUND(lo_m / 100, 4) AS ci_lo,
           ROUND(hi_m / 100, 4) AS ci_hi,
           CASE WHEN lo_m <= CAST(s0 AS DOUBLE) / CAST(nrows AS DOUBLE)
                 AND CAST(s0 AS DOUBLE) / CAST(nrows AS DOUBLE) <= hi_m
                THEN 1 ELSE 0 END AS point_in_ci
    FROM dist CROSS JOIN point
    """


@register(
    "g54_bootstrap_ci",
    duck_sql=_G54_BASE_DUCK + _G54_TAIL,
    doc="G54: seeded deterministic POISSON bootstrap CI for the mean "
        "order value — the distribution-free uncertainty quantifier the "
        "G50/G53 parametric tests assume away, in the large-scale "
        "formulation (Chamandy et al., 'Estimating Uncertainty for "
        "Massive Data Streams', Google 2012): each row draws an i.i.d. "
        "Poisson(1) multiplicity PER REPLICATE from a portable LCG on "
        "(replicate, o_orderkey) — u compared against 9 precomputed "
        "integer CDF thresholds (floor(cdf*2^31): pure int64, "
        "bit-identical in both engines, no RNG state, no floats until "
        "the final means) — so a replicate is SUM(w*cents)/SUM(w). "
        "This replaces the round-4 multinomial form whose B×n pick "
        "table re-JOINED the ranked rows (measured 46 s at sf1, "
        "superlinear, and impossible at 100 TB): now there is NO join "
        "and NO global row_number — one scan, a broadcast 100-row "
        "replicate spine, and B partial sums per task crossing the "
        "shuffle. PERCENTILE_DISC fences are actual replicate means "
        "(exact-int ratios, deterministic doubles). Shared SQL text past "
        "the spread() base view (see _G54_BASE_DUCK note).",
)
def g54_bootstrap_ci(spark, sf_dir):
    from pydatalake_gen2_spark.operators.util import spread

    base = spread(
        spark.table("orders").selectExpr(
            "CAST(o_orderkey AS BIGINT) AS k",
            "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents",
        )
    )
    base.createOrReplaceTempView("g54_base")
    return spark.sql(_G54_BASE_SPARK + _G54_TAIL)


# ---------------------------------------------------------------------------
# g55: leave-one-out target encoding with prior smoothing
# ---------------------------------------------------------------------------

sql_pair(
    "g55_target_encoding",
    """
    WITH joined AS (
      SELECT p.p_brand,
             CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    brand AS (
      SELECT p_brand,
             CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(cents) AS BIGINT) AS s_b
      FROM joined GROUP BY p_brand),
    gtot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(cents) AS BIGINT) AS s_g
      FROM joined)
    SELECT p_brand, n_b,
           ROUND(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100, 4) AS brand_mean,
           ROUND(CAST((n_b - 1) * s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                 / CAST(n_b - 1 + 20 AS DOUBLE) / 100
                 + 20.0 * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
                   / CAST(n_b - 1 + 20 AS DOUBLE) / 100, 4) AS avg_loo_encoded,
           ROUND(CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE) / 100, 4) AS prior_mean
    FROM brand CROSS JOIN gtot
    ORDER BY p_brand
    """,
    doc="G55: leave-one-out target encoding with additive (m=20) prior "
        "smoothing — the categorical-feature encoder every tabular-ML "
        "pipeline runs before training, audited per brand. Each row's "
        "encoding excludes its own target ((S_b - x_i)/(n_b - 1), the "
        "leakage guard) and shrinks toward the global prior with weight "
        "m; the certified column is the per-brand MEAN of those row "
        "encodings via its closed form ((n_b-1)·S_b/n_b + m·prior) / "
        "(n_b-1+m) — all numerators exact integer cents, one final "
        "DOUBLE expression ROUND(4). Scale: two partial+final aggs (per-"
        "brand, global) over one lineitem⋈part equi-join with the dim "
        "side broadcast; the encode-at-train-time join ships only 25 "
        "brand rows. One SQL text, both dialects.",
)


# ---------------------------------------------------------------------------
# g56: Gini coefficient + Lorenz deciles of customer revenue concentration
# ---------------------------------------------------------------------------

sql_pair(
    "g56_gini_coefficient",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT cents,
             CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
      FROM per_cust),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(i * cents) AS BIGINT) AS ws
      FROM ranked)
    SELECT n,
           ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100, 4)
             AS mean_revenue,
           ROUND(2.0 * CAST(ws AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
    FROM tot
    """,
    doc="G56: Gini coefficient of per-customer revenue concentration — "
        "the single-number inequality summary whose full curve is "
        "W22's Lorenz and whose top-share cut is W32's Pareto "
        "concentration; the standard skew-risk indicator for 'is this "
        "key distribution salting-worthy'. Uses the exact rank identity "
        "G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over cents sorted "
        "ascending (ties broken by custkey — i·x is invariant within a "
        "tie's value anyway): Σ i·x fits int64 to ~1e5 customers × 1e9 "
        "cents; both Σ are exact integers, ONE final double expression, "
        "ROUND(6). Scale: one partial+final per-customer agg, one "
        "global sort (the rank), then a 3-int64 reduce; at 100 TB the "
        "sort is the designed cost and the binned/quantile "
        "approximation (W22's deciles) is the cheap sibling. One SQL "
        "text, both dialects.",
)


# ---------------------------------------------------------------------------
# g57: two-sample Kolmogorov-Smirnov statistic (exact integer ECDF)
# ---------------------------------------------------------------------------

sql_pair(
    "g57_ks_two_sample",
    """
    WITH pts AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END AS is_a
      FROM orders),
    tot AS (
      SELECT CAST(SUM(is_a) AS BIGINT) AS na,
             CAST(SUM(1 - is_a) AS BIGINT) AS nb
      FROM pts),
    steps AS (
      SELECT cents,
             CAST(SUM(is_a) AS BIGINT) AS a_here,
             CAST(SUM(1 - is_a) AS BIGINT) AS b_here
      FROM pts GROUP BY cents),
    ecdf AS (
      SELECT cents,
             CAST(SUM(a_here) OVER (ORDER BY cents) AS BIGINT) AS cum_a,
             CAST(SUM(b_here) OVER (ORDER BY cents) AS BIGINT) AS cum_b
      FROM steps),
    gaps AS (
      SELECT cents, ABS(nb * cum_a - na * cum_b) AS num
      FROM ecdf CROSS JOIN tot),
    best AS (
      SELECT CAST(MAX(num) AS BIGINT) AS max_num FROM gaps)
    SELECT na, nb,
           ROUND(CAST(max_num AS DOUBLE)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS ks_d,
           CAST((SELECT MIN(cents) FROM gaps WHERE num = best.max_num)
                AS BIGINT) AS argmax_cents,
           CASE WHEN CAST(max_num AS DOUBLE)
                     / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                     > 1.358 * SQRT((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                                    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                THEN 1 ELSE 0 END AS reject_95
    FROM tot CROSS JOIN best
    """,
    doc="G57: two-sample Kolmogorov-Smirnov test — the distribution-"
        "equality check (urgent-priority vs normal-priority order "
        "values) that G50's Welch t can't see (t compares MEANS; KS "
        "catches shape/variance/tail drift), and the statistic behind "
        "DQ03-style drift monitors. The ECDF gap is kept EXACT: D's "
        "numerator is the integer |n_b·cumA(v) − n_a·cumB(v)| maximized "
        "over the pooled step points (fits int64 to ~3e9×3e9 cell "
        "products), so max and argmax are integer comparisons; only the "
        "final D and the 95% Smirnov fence (1.358·sqrt((na+nb)/(na·nb))) "
        "are doubles, ROUND(6). Scale: one partial+final agg to the "
        "distinct-value step table, ONE ordered window over it (the "
        "designed cost — at 100 TB you bin the ECDF first, same "
        "downstream arithmetic), then a 2-int64 reduce. One SQL text, "
        "both dialects.",
)


# ---------------------------------------------------------------------------
# g58: permutation test for the group mean difference (exact, seeded)
# ---------------------------------------------------------------------------

sql_pair(
    "g58_permutation_test",
    """
    WITH base AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) AS BIGINT) AS i,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END AS is_a
      FROM orders),
    tot AS (
      SELECT CAST(SUM(is_a) AS BIGINT) AS na,
             CAST(SUM(1 - is_a) AS BIGINT) AS nb,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(SUM(is_a * cents) AS BIGINT) AS sa
      FROM base),
    reps AS (SELECT i AS b FROM base WHERE i <= 100),
    shuffled AS (
      SELECT r.b, t.cents,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY r.b
               ORDER BY (1103515245 * (r.b * 1000003 + t.i) + 12345)
                        % 2147483648, t.i) AS BIGINT) AS rnk
      FROM reps r CROSS JOIN base t),
    perm AS (
      SELECT sh.b,
             CAST(SUM(CASE WHEN sh.rnk <= tot.na THEN sh.cents ELSE 0 END)
                  AS BIGINT) AS sa_b
      FROM shuffled sh CROSS JOIN tot
      GROUP BY sh.b, tot.na),
    stats AS (
      SELECT CAST(SUM(CASE WHEN ABS(CAST(na + nb AS DECIMAL(38,0)) * sa_b
                                    - CAST(na AS DECIMAL(38,0)) * s)
                                >= ABS(CAST(na + nb AS DECIMAL(38,0)) * sa
                                       - CAST(na AS DECIMAL(38,0)) * s)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
             CAST(COUNT(*) AS BIGINT) AS n_perm
      FROM perm CROSS JOIN tot)
    SELECT na, nb, n_perm, n_extreme,
           ROUND((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
                  - CAST(s - sa AS DOUBLE) / CAST(nb AS DOUBLE)) / 100, 4)
             AS obs_mean_diff,
           ROUND(CAST(1 + n_extreme AS DOUBLE)
                 / CAST(1 + n_perm AS DOUBLE), 4) AS p_value
    FROM tot CROSS JOIN stats
    """,
    doc="G58: permutation (randomization) test for the urgent-vs-normal "
        "mean order value — the assumption-free significance check next "
        "to G50 (Welch), G53 (z) and G54 (bootstrap): under H0 labels "
        "are exchangeable, so B=100 GENUINE label permutations (group "
        "sizes preserved — each permutation ranks rows by the portable "
        "LCG hash and hands the first na ranks to group A, a bijection, "
        "not a resample) rebuild the null distribution. The test "
        "statistic is held EXACT: |(na+nb)·ΣA_b − na·S| is computed in "
        "DECIMAL(38,0) (n·Σcents crosses int64 between sf0.1 and sf1 — "
        "caught by the sf1 oracle sweep), so every >= comparison and the "
        "extreme-count are integer-exact; p = (1+extreme)/(1+B). Scale: "
        "the B×n frame "
        "carries (b, cents, rank) only, each permutation reduces to ONE "
        "int64 partial sum, and the per-b window sorts within B "
        "independent partitions — at 100 TB permute per-partition "
        "partials instead of rows (same exchangeability argument). One "
        "SQL text, both dialects.",
)


# ---------------------------------------------------------------------------
# g60: Cliff's delta ordinal effect size (exact rank arithmetic)
# ---------------------------------------------------------------------------

sql_pair(
    "g60_cliffs_delta",
    """
    WITH pts AS (
      SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority < '3' THEN 1 ELSE 0 END AS is_a
      FROM orders),
    tot AS (
      SELECT CAST(SUM(is_a) AS BIGINT) AS na,
             CAST(SUM(1 - is_a) AS BIGINT) AS nb
      FROM pts),
    vals AS (
      SELECT cents,
             CAST(SUM(is_a) AS BIGINT) AS a_here,
             CAST(SUM(1 - is_a) AS BIGINT) AS b_here
      FROM pts GROUP BY cents),
    cum AS (
      SELECT cents, a_here, b_here,
             CAST(COALESCE(SUM(b_here) OVER (
               ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS b_below,
             CAST(COALESCE(SUM(a_here) OVER (
               ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS a_below
      FROM vals),
    counts AS (
      SELECT CAST(SUM(a_here * b_below) AS BIGINT) AS gt_pairs,
             CAST(SUM(b_here * a_below) AS BIGINT) AS lt_pairs,
             CAST(SUM(a_here * b_here) AS BIGINT) AS tie_pairs
      FROM cum)
    SELECT na, nb, gt_pairs, lt_pairs, tie_pairs,
           ROUND(CAST(gt_pairs - lt_pairs AS DOUBLE)
                 / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
             AS cliffs_delta,
           CASE WHEN ABS(CAST(gt_pairs - lt_pairs AS DOUBLE)
                         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                     < 0.147 THEN 'negligible'
                WHEN ABS(CAST(gt_pairs - lt_pairs AS DOUBLE)
                         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                     < 0.33 THEN 'small'
                WHEN ABS(CAST(gt_pairs - lt_pairs AS DOUBLE)
                         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                     < 0.474 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM counts CROSS JOIN tot
    """,
    doc="G60: Cliff's delta — the ordinal, distribution-free EFFECT SIZE "
        "companion to the G57/G58 significance machinery (significant ≠ "
        "large: delta says HOW MUCH the urgent-priority distribution "
        "dominates): P(X>Y) − P(X<Y) computed exactly as pair counts. "
        "All n_a·n_b pairwise comparisons collapse to the value-level "
        "identity Σ a_v·B_<v (greater), Σ b_v·A_<v (less), Σ a_v·b_v "
        "(ties) via running sums over the distinct-value step table — "
        "pure int64 throughout, delta is ONE final divide ROUND(6), and "
        "the Romano magnitude bands compare that single double. Scale: "
        "G57's exact shape — one partial+final agg to distinct values, "
        "one ordered window over the step table, a 3-int64 reduce; bin "
        "first at 100 TB. One SQL text, both dialects.",
)


# G67: the R12 dialect divergence (pydatalake_gen2_spark/fuzz.py), found
# LIVE by the differential fuzzer and pinned here so the per-round driver
# sweep keeps certifying it. Spark emits ZERO rows for super-aggregates
# (ROLLUP / CUBE / GROUPING SETS grand-total sets) over an EMPTY input —
# its GROUPING SETS expansion aggregates over the synthetic grouping-id
# column, and a non-empty grouping-expression list over an empty input
# produces no groups — while the SQL standard, Postgres, and DuckDB emit
# the grand-total row with COUNT(*) = 0 (grouping by () over an empty
# table yields one group). The UNION ALL's second branch keeps the pair's
# result non-trivial (an empty-vs-empty match would certify nothing); the
# oracle applies the R12 fence (HAVING COUNT(*) > 0) ONLY to the empty
# branch, which drops exactly DuckDB's standard-mandated extra row.
sql_pair(
    "g67_super_agg_empty_input",
    """
    SELECT 'empty_input' AS src, r_name,
           CAST(GROUPING(r_name) AS INT) AS g,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM region WHERE r_regionkey < 0
    GROUP BY ROLLUP(r_name)
    UNION ALL
    SELECT 'full_input' AS src, r_name,
           CAST(GROUPING(r_name) AS INT) AS g,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM region
    GROUP BY ROLLUP(r_name)
    """,
    duck_sql="""
    SELECT 'empty_input' AS src, r_name,
           CAST(GROUPING(r_name) AS INT) AS g,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM region WHERE r_regionkey < 0
    GROUP BY ROLLUP(r_name)
    HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'full_input' AS src, r_name,
           CAST(GROUPING(r_name) AS INT) AS g,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM region
    GROUP BY ROLLUP(r_name)
    """,
    doc="G67: pins fuzz rule R12 — Spark's zero-row super-aggregate over "
        "an empty input vs the standard's grand-total row; oracle carries "
        "the documented HAVING COUNT(*) > 0 fence on the empty branch "
        "only. Scale: trivial (region dim); the pair exists for semantics "
        "evidence, not throughput.",
)
