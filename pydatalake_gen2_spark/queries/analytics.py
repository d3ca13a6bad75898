"""Statistical-audit / analytics operators — SURVEY.md §2B.19.

Data-profiling and statistics queries a warehouse owner runs ON the engine:
independence tests, autocorrelation, Benford digit audits, referential-
integrity sweeps, seasonal baselines, record detection, keyset pagination.
All are partial-agg / window shapes that hold at 100 TB (rationale per
query); float discipline follows the repo rules — exact DECIMAL moments,
ONE final IEEE expression, ROUND only on row-local scalar math.

Reference parity note: the reference client (client.py) has no analytics
surface; these extend the declared engine layer (SURVEY §0 consequence 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pydatalake_gen2_spark.queries.sqlexact import (
    dec2dbl as _dec2dbl,
    f6_half_away as _f6_half_away,
    idiv as _idiv,
    wide_mul as _wide_mul,
)
from pydatalake_gen2_spark.registry import register, sql_pair

# ---------------------------------------------------------------------------
# g38: chi-square test of independence (event_type x user-bucket)
# ---------------------------------------------------------------------------

sql_pair(
    "g38_chi_square",
    """
    WITH obs AS (
      SELECT event_type, CAST(user_id % 4 AS INT) AS ub,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY event_type, CAST(user_id % 4 AS INT)),
    rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY event_type),
    ct AS (SELECT ub, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY ub),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT obs.event_type) - 1)
                * (count(DISTINCT obs.ub) - 1) AS BIGINT) AS dof,
           CAST(SUM(CAST(ROUND(
                 ((o - (CAST(r AS DOUBLE) * c / n))
                  * (o - (CAST(r AS DOUBLE) * c / n)))
                 / (CAST(r AS DOUBLE) * c / n), 6) AS DECIMAL(18,6)))
             AS DOUBLE) AS chi2
    FROM obs
    JOIN rt ON obs.event_type = rt.event_type
    JOIN ct ON obs.ub = ct.ub
    CROSS JOIN tot
    """,
    doc="G38: chi-square independence statistic between event_type and a "
        "deterministic user bucket — the drift/association test a feature "
        "owner runs before trusting a categorical split. Contingency, row, "
        "and column totals are integer partial aggs (tallies cross the "
        "shuffle, never rows); each cell's (o-e)^2/e is one IEEE "
        "expression ROUND(6)ed row-locally, then summed EXACTLY as "
        "DECIMAL(18,6) so the 20-cell sum is order-independent across "
        "engines. At 100 TB: cost = one groupBy over the fact table; "
        "everything after is O(cells).",
)


# ---------------------------------------------------------------------------
# g39: lag-k autocorrelation of the daily revenue series
# ---------------------------------------------------------------------------

def _autocorr_sql(duck: bool) -> str:
    """Lag-1 and lag-7 Pearson autocorrelation from EXACT integer moments.

    corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)) with
    every S a DECIMAL sum of integer cents (order-independent, exact in
    both engines). Round-6 hardening: the wide-decimal moments (~5e22 at
    sf0.01) reach DOUBLE through sqlexact.dec2dbl's hi/lo int64 split —
    both engines run identical correctly-rounded int64 casts + the same
    IEEE mul/add — instead of the native decimal cast (DuckDB's
    int128 -> DOUBLE is not correctly rounded; observed 1-ulp drift on
    70-bit moments). hi = x DIV 1e15 fits BIGINT through |x| < 9.2e33,
    i.e. past sf100 for these n*cents^2 moments. The final expression
    stays ONE IEEE divide/sqrt, ROUND(6). Precisions are sized so no
    product exceeds width 38 in either engine (DuckDB errors past 38;
    Spark silently reduces scale).
    """
    num = _dec2dbl(duck, "n * sxy - sx * sy")
    den_a = _dec2dbl(duck, "n * sxx - sx * sx")
    den_b = _dec2dbl(duck, "n * syy - sy * sy")
    legs = []
    for lag in (1, 7):
        legs.append(f"""
    SELECT CAST({lag} AS INT) AS lag_days,
           CAST(n AS BIGINT) AS n_pairs,
           ROUND({num}
             / SQRT({den_a}
                    * {den_b}), 6) AS autocorr
    FROM (
      SELECT CAST(count(*) AS DECIMAL(6,0)) AS n,
             CAST(SUM(x) AS DECIMAL(19,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(19,0)) AS sy,
             CAST(SUM(x * y) AS DECIMAL(30,0)) AS sxy,
             CAST(SUM(x * x) AS DECIMAL(30,0)) AS sxx,
             CAST(SUM(y * y) AS DECIMAL(30,0)) AS syy
      FROM (
        -- width 19 (not 18): DuckDB runs width<=18 decimal multiplies in
        -- int64, which overflows on cents*cents; 19 forces hugeint
        SELECT CAST(cents AS DECIMAL(19,0)) AS x,
               CAST(lag(cents, {lag}) OVER (ORDER BY day) AS DECIMAL(19,0)) AS y
        FROM (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM orders GROUP BY CAST(o_orderdate AS DATE)) daily) lagged
      WHERE y IS NOT NULL) m""")
    return " UNION ALL ".join(legs) + " ORDER BY lag_days"


sql_pair(
    "g39_autocorrelation",
    _autocorr_sql(duck=False),
    duck_sql=_autocorr_sql(duck=True),
    doc="G39: lag-1 / lag-7 autocorrelation of the daily revenue series — "
        "the seasonality detector behind forecast-model choice. The fact "
        "table reduces to one row per day (partial agg), the lag window "
        "runs on the day-count-sized series, and the correlation is "
        "assembled from exact DECIMAL moments with a single final IEEE "
        "expression, so an inherently float statistic still hash-matches. "
        "At 100 TB the only data-sized cost is the daily rollup scan.",
)


# ---------------------------------------------------------------------------
# g40: Benford first-digit audit
# ---------------------------------------------------------------------------

sql_pair(
    "g40_benford_audit",
    """
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING),
                         1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice >= 1),
    counts AS (
      SELECT d, CAST(count(*) AS BIGINT) AS cnt FROM digits GROUP BY d),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM counts)
    SELECT d AS first_digit, cnt,
           ROUND(CAST(cnt AS DOUBLE) / n, 6) AS observed_share,
           ROUND(LOG10(1.0 + 1.0 / d), 6) AS benford_share,
           ROUND(ABS(ROUND(CAST(cnt AS DOUBLE) / n, 6)
                     - ROUND(LOG10(1.0 + 1.0 / d), 6)), 6) AS abs_dev
    FROM counts CROSS JOIN tot
    ORDER BY first_digit
    """,
    doc="G40: Benford's-law first-significant-digit audit of order totals "
        "— the classic fabricated-data / unit-mixing smell test for a "
        "financial column. One scan + a 9-row aggregate; shares and the "
        "log-law expectation are row-local ROUND(6) scalars. At 100 TB "
        "the digit extraction rides the scan (substr of an integer "
        "render) and only 9 tallies cross the wire.",
)


# ---------------------------------------------------------------------------
# j31: referential-integrity orphan audit over every FK edge
# ---------------------------------------------------------------------------

_FK_EDGES = [
    # (edge label, child table, child key, parent table, parent key)
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


def _j31_duck() -> str:
    legs = []
    for label, child, ck, parent, pk in _FK_EDGES:
        legs.append(f"""
    SELECT '{label}' AS edge,
           (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child,
           (SELECT CAST(count(*) AS BIGINT) FROM {child} c
            WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                              WHERE p.{pk} = c.{ck})) AS n_orphans""")
    return (
        "SELECT edge, n_child, n_orphans, n_orphans = 0 AS ok FROM ("
        + " UNION ALL ".join(legs)
        + ") t ORDER BY edge"
    )


@register("j31_referential_integrity", duck_sql=_j31_duck())
def j31_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J31: referential-integrity audit — orphan counts for every declared
    FK edge (FIXTURES.md §keys) in ONE report: the ingestion-trust sweep
    run before joins are believed (J30 audits id continuity; this audits
    cross-table reachability). Each edge is a LEFT ANTI join; parents are
    dims that broadcast, so at 100 TB only the child scans are data-sized
    and no fact table ever shuffles. A single dangling key flips its
    edge's ok flag and breaks the hash."""
    out = None
    for label, child, ck, parent, pk in _FK_EDGES:
        c = spark.table(child)
        p = spark.table(parent)
        orphans = c.join(p, c[ck] == p[pk], "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphans")
        )
        leg = (
            c.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
            .crossJoin(orphans)
            .select(
                F.lit(label).alias("edge"),
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
        out = leg if out is None else out.unionByName(leg)
    return out.orderBy("edge")


# ---------------------------------------------------------------------------
# o07: keyset (seek) pagination
# ---------------------------------------------------------------------------

_O07_PAGE = 100
_O07_SKIP = 200  # two pages of 100


@register(
    "o07_keyset_pagination",
    duck_sql=f"""
    SELECT o_orderkey, o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice
    FROM orders ORDER BY o_orderkey
    LIMIT {_O07_PAGE} OFFSET {_O07_SKIP}
    """,
)
def o07_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O07: keyset (seek) pagination — page 3 fetched as WHERE key >
    last-seen-key ORDER BY key LIMIT k, certified identical to the
    OFFSET form the oracle runs. OFFSET pagination is the 100 TB
    anti-pattern (every page re-sorts and discards `offset` rows, page n
    costs O(n)); the keyset predicate pushes to the parquet scan
    (PushedFilters: GreaterThan) and each page is a constant-cost
    TakeOrderedAndProject. The boundary key is the only driver-side
    value — one scalar, O05 holds the OFFSET form's registry row."""
    boundary = (
        spark.table("orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(_O07_SKIP)
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    return (
        spark.table("orders")
        .filter(F.col("o_orderkey") > F.lit(boundary))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,4)").cast("double").alias("o_totalprice"),
        )
        .orderBy("o_orderkey")
        .limit(_O07_PAGE)
    )


# ---------------------------------------------------------------------------
# w25: record-breaking events (running-max novelty detection)
# ---------------------------------------------------------------------------

sql_pair(
    "w25_record_breaks",
    """
    SELECT user_id, event_id, value
    FROM (
      SELECT user_id, event_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prior_max
      FROM events) t
    WHERE prior_max IS NULL OR value > prior_max
    ORDER BY user_id, event_id
    """,
    doc="W25: record-breaking events — rows whose value STRICTLY exceeds "
        "every prior value for the user (first event is a record by "
        "convention: empty frame -> NULL prior_max). The running-max-"
        "excluding-current frame is the change-point/novelty primitive "
        "under 'new high' alerting (W23 finds local peaks; this finds "
        "all-time highs). One window shuffle on user_id, O(1) frame "
        "state per row; raw-column doubles, comparisons only.",
)


# ---------------------------------------------------------------------------
# w26: weekday-seasonal baseline + residuals
# ---------------------------------------------------------------------------

def _w26_sql(weekday_expr: str, fmt_expr: str) -> str:
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    wd AS (SELECT day, cents, {weekday_expr} AS weekday FROM daily),
    fences AS (
      SELECT weekday, CAST(SUM(CAST(cents AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM wd GROUP BY weekday)
    SELECT {fmt_expr} AS day, wd.weekday, cents,
           ROUND(CAST(s AS DOUBLE) / n, 4) AS weekday_mean,
           ROUND(cents - ROUND(CAST(s AS DOUBLE) / n, 4), 4) AS residual
    FROM wd JOIN fences ON wd.weekday = fences.weekday
    ORDER BY wd.day
    """


sql_pair(
    "w26_seasonal_baseline",
    _w26_sql("dayofweek(day)", "date_format(day, 'yyyy-MM-dd')"),
    _w26_sql("dayofweek(day) + 1", "strftime(day, '%Y-%m-%d')"),
    doc="W26: weekday-seasonal baseline — per-day revenue vs the mean of "
        "its weekday cohort, residual = actual - baseline: the de-"
        "seasonalized series anomaly triage reads (G39 DETECTS the weekly "
        "cycle; this REMOVES it). Daily rollup is the only fact-sized "
        "pass; the 7-row fence table broadcast-joins back. Means are "
        "exact-DECIMAL sums with one IEEE divide (repo discipline); "
        "weekday numbering is a dialect pair (Spark dayofweek 1=Sun, "
        "DuckDB 0=Sun, F13 precedent).",
)


# ---------------------------------------------------------------------------
# g41: two-sample Kolmogorov-Smirnov statistic (distribution-shift test)
# ---------------------------------------------------------------------------

sql_pair(
    "g41_ks_test",
    """
    WITH s AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS g1,
             CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS g2
      FROM orders WHERE o_orderstatus IN ('F', 'O')),
    tot AS (SELECT CAST(sum(g1) AS BIGINT) AS n1, CAST(sum(g2) AS BIGINT) AS n2 FROM s),
    ecdf AS (
      SELECT x,
             CAST(sum(sum(g1)) OVER (ORDER BY x) AS BIGINT) AS c1,
             CAST(sum(sum(g2)) OVER (ORDER BY x) AS BIGINT) AS c2
      FROM s GROUP BY x)
    SELECT n1, n2,
           CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_numerator,
           ROUND(CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE) / (n1 * n2), 6) AS d_stat
    FROM ecdf CROSS JOIN tot GROUP BY n1, n2
    """,
    doc="G41: two-sample Kolmogorov-Smirnov statistic between the finished "
        "('F') and open ('O') order-price distributions — THE "
        "distribution-shift test run between corpus generations / data "
        "drops before trusting a retrain. D = max |F1(x) - F2(x)| is "
        "computed over the deduplicated value spine with PURE INTEGER "
        "arithmetic (|c1*n2 - c2*n1| — the max of exact integers), so an "
        "inherently order-statistic test hash-matches bit-exactly; the "
        "only float op is the final single divide. The cumulative window "
        "runs on the distinct-value spine, not raw rows; at 100 TB "
        "evaluate on percentile fences (G32's ladder) instead of the "
        "full spine — same integer form.",
)


# ---------------------------------------------------------------------------
# g42: cohort retention matrix
# ---------------------------------------------------------------------------

sql_pair(
    "g42_cohort_retention",
    """
    WITH firsts AS (
      SELECT o_custkey,
             CAST(MIN(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS INT)
               AS cohort_month
      FROM orders GROUP BY o_custkey),
    acts AS (
      SELECT DISTINCT o.o_custkey, f.cohort_month,
             CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                  - f.cohort_month AS INT) AS month_offset
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey),
    cells AS (
      SELECT cohort_month, month_offset,
             CAST(count(*) AS BIGINT) AS n_customers
      FROM acts GROUP BY cohort_month, month_offset),
    base AS (
      SELECT cohort_month, n_customers AS cohort_size
      FROM cells WHERE month_offset = 0)
    SELECT c.cohort_month, c.month_offset, c.n_customers,
           ROUND(CAST(c.n_customers AS DOUBLE) / b.cohort_size, 4) AS retention
    FROM cells c JOIN base b ON c.cohort_month = b.cohort_month
    ORDER BY c.cohort_month, c.month_offset
    """,
    doc="G42: cohort retention matrix — customers grouped by first-order "
        "month, each later month's active share reported against the "
        "cohort's size (the warehouse-classic engagement decay table; for "
        "a corpus it answers 'do sources keep contributing after "
        "onboarding'). Month keys are pure integer arithmetic "
        "(y*12+m-1, portable), activity is a DISTINCT per (customer, "
        "month) — two partial-agg shuffles on the fact table, the "
        "offset-0 diagonal broadcast back for the rate. Retention is one "
        "IEEE divide ROUND(4).",
)


# ---------------------------------------------------------------------------
# g43: time-to-convert distribution (first click -> first later purchase)
# ---------------------------------------------------------------------------

def _g43_sql(epoch_us: str) -> str:
    return f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'click' THEN {epoch_us} END) AS c_us
      FROM events GROUP BY user_id),
    conv AS (
      SELECT f.user_id,
             MIN(CASE WHEN e.event_type = 'purchase'
                       AND {epoch_us.replace('ts', 'e.ts')} > f.c_us
                      THEN {epoch_us.replace('ts', 'e.ts')} END) - f.c_us AS gap_us
      FROM firsts f JOIN events e ON e.user_id = f.user_id
      WHERE f.c_us IS NOT NULL
      GROUP BY f.user_id, f.c_us),
    g AS (SELECT user_id, gap_us FROM conv)
    SELECT CAST(count(*) AS BIGINT) AS n_clickers,
           CAST(count(gap_us) AS BIGINT) AS n_converted,
           ROUND(CAST(count(gap_us) AS DOUBLE) / count(*), 4) AS conversion_rate,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us) AS BIGINT)
             AS median_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM g
    """


sql_pair(
    "g43_time_to_convert",
    _g43_sql("unix_micros(ts)"),
    _g43_sql("epoch_us(ts)"),
    doc="G43: time-to-convert distribution — per user, the gap from the "
        "FIRST click to the first purchase strictly after it; corpus-level "
        "conversion rate plus exact integer-microsecond min/median/max "
        "(percentile_disc picks an actual observed gap, no interpolation "
        "float). The funnel-latency report behind SLA and campaign "
        "analysis (W12 counts step completion; this measures its speed). "
        "Two partial-agg passes over events keyed by user; epoch "
        "extraction is the unix_micros/epoch_us dialect pair.",
)


# ---------------------------------------------------------------------------
# dq01: data-quality expectation suite (Deequ-style) — SURVEY §2B.21
# ---------------------------------------------------------------------------


@register(
    "dq01_expectation_suite",
    duck_sql="""
    WITH j AS (
      SELECT o.*, c.c_custkey AS ck
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_null_status,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
               AS v_dup_key,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0
                           ELSE 1 END) AS BIGINT) AS v_status_domain,
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS v_price_range,
             CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                           THEN 0 ELSE 1 END) AS BIGINT) AS v_priority_format,
             CAST(SUM(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS v_orphan_fk,
             CAST(CASE WHEN max(o_orderdate) >= TIMESTAMP '2000-01-01'
                       THEN 0 ELSE 1 END AS BIGINT) AS v_freshness
      FROM j)
    SELECT check_name, checked, violations, violations = 0 AS passed
    FROM (
      SELECT 'not_null_status' AS check_name, n_rows AS checked,
             v_null_status AS violations FROM m
      UNION ALL SELECT 'unique_orderkey', n_rows, v_dup_key FROM m
      UNION ALL SELECT 'domain_orderstatus', n_rows, v_status_domain FROM m
      UNION ALL SELECT 'range_totalprice_pos', n_rows, v_price_range FROM m
      UNION ALL SELECT 'format_orderpriority', n_rows, v_priority_format FROM m
      UNION ALL SELECT 'fk_custkey_in_customer', n_rows, v_orphan_fk FROM m
      UNION ALL SELECT 'freshness_orderdate', n_rows, v_freshness FROM m)
    ORDER BY check_name
    """,
)
def dq01_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ01: Deequ-style data-quality expectation suite — seven constraint
    classes (completeness, uniqueness, value domain, numeric range, regex
    format, cross-table referential integrity, freshness) evaluated in ONE
    pass over the fact table and rendered as a (check, checked,
    violations, passed) report. The scale argument IS the single pass:
    every per-row predicate folds into one partial+final aggregate over
    one scan of orders, the FK check rides a broadcast left join (parent
    keys are the small side), and the report is a stack() unpivot of the
    1-row metrics frame — adding a constraint adds a column to the agg,
    never another scan. The plan gate (tests/test_plans.py) pins exactly
    one orders scan + BroadcastHashJoin. At 100 TB this is the
    write-audit-publish gate run before committing a snapshot version
    (S16), same shape Deequ/Great-Expectations compile to on Spark."""
    o = spark.table("orders")
    ck = spark.table("customer").select(F.col("c_custkey").alias("ck"))
    j = o.join(F.broadcast(ck), F.col("o_custkey") == F.col("ck"), "left")

    def viol(cond):
        return F.sum((~F.coalesce(cond, F.lit(False))).cast("long"))

    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        viol(F.col("o_orderstatus").isNotNull()).alias("v_null_status"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("bigint")
        .alias("v_dup_key"),
        viol(F.col("o_orderstatus").isin("O", "F", "P")).alias(
            "v_status_domain"
        ),
        viol(F.col("o_totalprice") > 0).alias("v_price_range"),
        viol(F.col("o_orderpriority").rlike("^[1-5]-")).alias(
            "v_priority_format"
        ),
        viol(F.col("ck").isNotNull()).alias("v_orphan_fk"),
        F.max("o_orderdate").alias("_newest"),
    )
    long = m.select(
        F.expr(
            """stack(7,
            'not_null_status', v_null_status,
            'unique_orderkey', v_dup_key,
            'domain_orderstatus', v_status_domain,
            'range_totalprice_pos', v_price_range,
            'format_orderpriority', v_priority_format,
            'fk_custkey_in_customer', v_orphan_fk,
            'freshness_orderdate',
            CAST(_newest < TIMESTAMP '2000-01-01' AS BIGINT)
            ) AS (check_name, violations)"""
        ),
        F.col("n_rows").alias("checked"),
    )
    return long.select(
        "check_name",
        "checked",
        F.col("violations").cast("bigint").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("check_name")


# ---------------------------------------------------------------------------
# g48: Kaplan-Meier survival estimate of customer lifetime
# ---------------------------------------------------------------------------

_G48_BODY = """
    WITH per AS (
      SELECT o_custkey AS cust, min(o_orderdate) AS first_o,
             max(o_orderdate) AS last_o
      FROM orders GROUP BY o_custkey),
    d AS (
      SELECT {dur} AS t,
             CAST(CASE WHEN last_o < TIMESTAMP '2001-02-01'
                       THEN 1 ELSE 0 END AS INT) AS observed
      FROM per),
    g AS (
      SELECT t, CAST(SUM(observed) AS BIGINT) AS d_t,
             CAST(COUNT(*) AS BIGINT) AS all_t
      FROM d GROUP BY t),
    w AS (
      SELECT t, d_t, all_t,
             CAST((SELECT COUNT(*) FROM d) AS BIGINT)
               - (SUM(all_t) OVER (ORDER BY t) - all_t) AS n_risk
      FROM g)
    SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
           d_t AS n_deaths,
           CASE WHEN SUM(CASE WHEN d_t >= n_risk THEN 1 ELSE 0 END)
                     OVER (ORDER BY t) > 0
                THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND(EXP(CAST(SUM(CAST(ROUND(
                       LN((CAST(n_risk AS DOUBLE) - d_t) / n_risk), 8)
                       AS DECIMAL(20,8))) OVER (ORDER BY t) AS DOUBLE)), 6)
           END AS survival
    FROM w WHERE d_t > 0 ORDER BY t
"""

sql_pair(
    "g48_kaplan_meier",
    _G48_BODY.format(dur="datediff(last_o, first_o)"),
    _G48_BODY.format(dur="datediff('day', first_o, last_o)"),
    doc="G48: Kaplan-Meier survival curve of customer LIFETIME (days from "
        "first to last order), right-censored at the observation fence "
        "(customers still ordering near corpus end are censored, not "
        "deaths — the correctness detail a naive lifetime histogram "
        "misses). Classic KM: at each death time t, factor "
        "(n_risk-d)/n_risk; survival = cumulative product over death "
        "times, computed as EXP of an exact DECIMAL(20,8) sum of ROUND(8) "
        "log terms (the L58/G46 order-independence discipline), one "
        "ROUND(6) at the end; the d=n_risk terminal case short-circuits "
        "to exact 0. Shapes: one partial-agg groupBy per customer, one "
        "tiny per-duration tally, windows over |distinct durations| rows "
        "— the curve costs two shuffles regardless of order count. "
        "Dialect pair: datediff argument orders differ.",
)


# ---------------------------------------------------------------------------
# g49: mergeable HLL sketch rollup (partials union == direct sketch)
# ---------------------------------------------------------------------------


@register(
    "g49_hll_mergeable",
    duck_sql="""
    SELECT CAST(count(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT)
             AS n_months,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_total,
           TRUE AS merged_within_5pct,
           TRUE AS direct_within_5pct
    FROM orders
    """,
)
def g49_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G49: MERGEABLE distinct-count sketches — per-month HyperLogLog
    sketches of distinct customers (hll_sketch_agg), merged with
    hll_union_agg and compared against (a) the sketch built directly over
    the whole table and (b) the exact distinct count. Both estimates are
    certified within 5% of exact via folded booleans (the G04 pattern —
    approximate values never cross the hash, booleans do). The merged and
    direct estimates are NOT asserted equal: DataSketches HLL keeps a HIP
    (historical inverse probability) estimator on streamed sketches that
    merging necessarily discards, so a union lands on the composite
    estimator — slightly different, still within the error bound; the
    audit certifies exactly what merging guarantees and no more. This is
    the 100 TB distinct-count
    architecture: daily partitions keep 1.5 KB sketches, any date-range
    rollup is a register merge — no rescan, no shuffle of raw keys; the
    exact leg here exists only to anchor the audit at test scale."""
    o = spark.table("orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = monthly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est_merged"),
    )
    direct = o.agg(
        F.count_distinct("o_custkey").cast("bigint").alias("exact_total"),
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias(
            "_est_direct"
        ),
    )
    def within(est):
        return F.abs(est - F.col("exact_total")) <= 0.05 * F.col("exact_total")

    return merged.crossJoin(direct).select(
        "n_months",
        "exact_total",
        within(F.col("_est_merged")).alias("merged_within_5pct"),
        within(F.col("_est_direct")).alias("direct_within_5pct"),
    )


# ---------------------------------------------------------------------------
# dq02: k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

sql_pair(
    "dq02_k_anonymity",
    """
    WITH cls AS (
      SELECT c.c_nationkey AS nationkey, c.c_mktsegment AS segment,
             CAST(floor(CAST(round(c.c_acctbal * 100) AS BIGINT) / 200000.0)
                  AS BIGINT) AS bal_band,
             CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS k,
             CAST(count(DISTINCT COALESCE(o.o_orderpriority, 'NONE'))
                  AS BIGINT) AS l
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3)
    SELECT CAST(sum(k) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           ROUND(CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
                 / sum(k), 6) AS pct_at_risk,
           CAST(min(l) AS BIGINT) AS min_l,
           CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_l1
    FROM cls
    """,
    doc="DQ02: k-anonymity / l-diversity audit over the quasi-identifier "
        "(nation, market segment, $2000 balance band) with the customer's "
        "order-priority mix as the sensitive attribute — the privacy "
        "measurement a data owner runs BEFORE releasing or sharing a "
        "table, and the quantitative counterpart to S36's "
        "right-to-be-forgotten erasure: min_k is the re-identification "
        "floor (a class of size 1 IS an identified person), rows_at_risk "
        "counts records in classes under k=5, and min_l/classes_l1 "
        "catch classes whose sensitive value is constant (k-anonymous "
        "yet fully disclosed — the homogeneity attack l-diversity "
        "exists to name). One join to attach the sensitive attribute, "
        "then one partial+final aggregate; "
        "the equivalence-class frame is |QI-combinations| regardless of "
        "row count, so the audit costs a groupBy at 100 TB. Balance "
        "bands floor over EXACT integer cents (round-to-cents first, "
        "the house money idiom), and floor of a correctly-rounded "
        "double division is engine-identical: band boundaries are "
        "exact-integer ratios, everything else is far from a boundary. "
        "Identical SQL text runs in both dialects.",
)


# ---------------------------------------------------------------------------
# dq03: PSI distribution-drift monitor (baseline vs current period)
# ---------------------------------------------------------------------------

sql_pair(
    "dq03_psi_drift",
    """
    WITH b AS (
      SELECT CAST(floor(CAST(round(o_totalprice * 100) AS BIGINT)
                        / 5000000.0) AS BIGINT) AS band,
             CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 0 ELSE 1 END AS per
      FROM orders),
    t AS (
      SELECT band,
             CAST(sum(CASE WHEN per = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN per = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM b GROUP BY band),
    tot AS (
      SELECT CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1,
             CAST(count(*) AS BIGINT) AS nb
      FROM t),
    terms AS (
      SELECT band,
             (CAST(n0 AS DOUBLE) + 0.5)
               / (CAST(t0 AS DOUBLE) + 0.5 * nb) AS p,
             (CAST(n1 AS DOUBLE) + 0.5)
               / (CAST(t1 AS DOUBLE) + 0.5 * nb) AS q
      FROM t, tot)
    SELECT (SELECT nb FROM tot) AS n_bands,
           (SELECT t0 FROM tot) AS n_baseline,
           (SELECT t1 FROM tot) AS n_current,
           ROUND(CAST(SUM(CAST(ROUND((p - q) * LN(p / q), 8)
                 AS DECIMAL(20,8))) AS DOUBLE), 6) AS psi,
           ROUND(CAST(MAX(CAST(ROUND((p - q) * LN(p / q), 8)
                 AS DECIMAL(20,8))) AS DOUBLE), 6) AS max_band_term,
           CAST(SUM(CAST(ROUND((p - q) * LN(p / q), 8)
                 AS DECIMAL(20,8))) AS DOUBLE) > 0.2 AS drifted
    FROM terms
    """,
    doc="DQ03: population-stability-index (PSI) drift monitor between a "
        "baseline and a current period of the order-value distribution — "
        "the production-ML monitoring audit (PSI > 0.2 = investigate, the "
        "industry fence) that tells a feature owner the serving "
        "distribution no longer matches training. Values band into fixed "
        "$50k buckets over EXACT integer cents; shares are "
        "Laplace-smoothed ((n+0.5)/(N+0.5B), exact rationals in IEEE "
        "until one LN per band) so empty bands stay defined and the term "
        "set is total; each (p-q)*ln(p/q) term is non-negative, "
        "ROUND(8)-fenced and summed as DECIMAL(20,8) in any order (the "
        "G48/L58 discipline). Scale: one scan + one |bands| tally — the "
        "drift report costs a groupBy at 100 TB, and per-band partials "
        "merge, so it runs per-partition then combines. One SQL text in "
        "both dialects.",
)


# ---------------------------------------------------------------------------
# dq04: ingest volume-anomaly audit (rolling z-score on daily row counts)
# ---------------------------------------------------------------------------

sql_pair(
    "dq04_volume_anomaly",
    """
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    w AS (
      SELECT day, n,
             CAST(sum(n) OVER (ORDER BY day
               ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s1,
             CAST(sum(n * n) OVER (ORDER BY day
               ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS BIGINT) AS s2,
             CAST(count(*) OVER (ORDER BY day
               ROWS BETWEEN 14 PRECEDING AND 1 PRECEDING) AS BIGINT) AS m
      FROM d)
    SELECT day, n,
           ROUND(CAST(s1 AS DOUBLE) / m, 4) AS mean14,
           ROUND((n - CAST(s1 AS DOUBLE) / m)
                 / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / m)
                        / (m - 1)), 4) AS z
    FROM w
    WHERE m >= 14
      AND (s2 - CAST(s1 AS DOUBLE) * s1 / m) > 0
      AND abs((n - CAST(s1 AS DOUBLE) / m)
              / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / m) / (m - 1))) > 2.5
    ORDER BY day
    """,
    doc="DQ04: ingest-volume anomaly audit — daily row counts scored "
        "against a trailing 14-day window (current day EXCLUDED from its "
        "own baseline, the leakage detail naive monitors get wrong); "
        "days with |z| > 2.5 surface as anomalies. The freshness/volume "
        "leg of the DQ01 expectation suite as a time-series: a silent "
        "upstream outage (missing partition) or a double-ingest both "
        "jump the z. Numerics: window sums s1/s2 are EXACT integers "
        "(counts and squared counts), the mean/variance/z is ONE final "
        "IEEE expression per row — sqrt is correctly rounded, so both "
        "engines see bit-identical doubles and the 2.5 fence cannot "
        "disagree. Scale: the window runs over the DAY-reduced frame "
        "(|days| rows regardless of table size) after one partial+final "
        "count — 100 TB costs one groupBy plus a window over a few "
        "thousand rows. One SQL text in both dialects.",
)


# ---------------------------------------------------------------------------
# g50: Welch two-sample t-test (unequal variances)
# ---------------------------------------------------------------------------

def _g50_sql(duck: bool) -> str:
    return f"""
    WITH s AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1 END AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    m AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents)
                  AS DECIMAL(38,0)) AS s2
      FROM s GROUP BY grp),
    -- round-6 hardening: the cents^2 moments (s2 ~ 1.5e18 at sf0.01,
    -- past 2^53) reach DOUBLE via sqlexact.dec2dbl's deterministic
    -- hi/lo split, not the native decimal cast; s1 is < 2^53 but takes
    -- the same path (dec2dbl is exact there: hi = 0 or tiny).
    sel AS (
      SELECT
        max(CASE WHEN grp = 0 THEN n END) AS n1,
        max(CASE WHEN grp = 1 THEN n END) AS n2,
        {_dec2dbl(duck, "max(CASE WHEN grp = 0 THEN s1 END)")} AS a1,
        {_dec2dbl(duck, "max(CASE WHEN grp = 1 THEN s1 END)")} AS b1,
        {_dec2dbl(duck, "max(CASE WHEN grp = 0 THEN s2 END)")} AS a2,
        {_dec2dbl(duck, "max(CASE WHEN grp = 1 THEN s2 END)")} AS b2
      FROM m),
    v AS (
      SELECT n1, n2,
             a1 / n1 AS m1, b1 / n2 AS m2,
             (a2 - a1 * a1 / n1) / (n1 - 1) AS v1,
             (b2 - b1 * b1 / n2) / (n2 - 1) AS v2
      FROM sel)
    SELECT n1, n2,
           ROUND(m1 / 100, 4) AS mean_urgent,
           ROUND(m2 / 100, 4) AS mean_low,
           ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 4) AS welch_df,
           abs((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) > 1.96 AS significant
    FROM v
    """


sql_pair(
    "g50_welch_ttest",
    _g50_sql(duck=False),
    duck_sql=_g50_sql(duck=True),
    doc="G50: Welch two-sample t-test (unequal variances) of order value "
        "between URGENT and LOW priorities — the A/B-test readout "
        "(Welch, not pooled Student: the robust default when group "
        "variances differ) next to G44's rank-based Mann-Whitney; "
        "welch_df is the Welch-Satterthwaite effective df. Group "
        "moments (n, sum cents, sum cents^2) accumulate as EXACT "
        "DECIMAL(38,0) — the cents^2 product is forced through "
        "DECIMAL(19,0) so DuckDB runs it in hugeint, not overflowing "
        "int64 — and reach DOUBLE via sqlexact.dec2dbl's deterministic "
        "hi/lo split (round-6: the native DECIMAL->DOUBLE cast is gone "
        "— DuckDB's int128->double is not correctly rounded); the t/df "
        "are ONE final IEEE expression each with a terminal ROUND. "
        "Scale: a partial+final 2-group aggregate over one scan; the "
        "test is O(1) memory at any table size.",
)


# ---------------------------------------------------------------------------
# g51: one-way ANOVA F-test across order priorities
# ---------------------------------------------------------------------------
#
# Exact-integer render discipline (round-6, after the driver-side r5 red
# row): NO rendered column may be a DECIMAL with precision > 15, and NO
# rendered DOUBLE may be computed by casting such a decimal. The ~2^61
# cents^2 sums are past float64's exact range, so (a) DuckDB's
# int128->double cast is not correctly rounded (1-ulp drift), and (b) an
# external canonicalizer that coerces decimals to float64 renders the two
# engines differently even when the values are EQUAL. Fix: SS columns are
# rendered as STRING (digit-exact in both engines), ratios go through
# exact integer division in the engines' native wide-integer types
# (Spark DECIMAL(38,0) DIV -> BIGINT quotient; DuckDB HUGEINT // — both
# truncate toward zero, verified including negatives), and boolean fences
# are exact cross-multiplications. tests/test_correctness.py enforces the
# schema fence registry-wide.


# (sqlexact helpers are imported at module top; this block intentionally
# documents the discipline where the first hardened pairs live.)


def _g51_sql(duck: bool) -> str:
    # F = (ssb/(k-1)) / (ssw/(nn-k)) = ssb*(nn-k) / (ssw*(k-1)).
    # Magnitudes: ss ~ 3e18 cents^2 at sf0.01 and ~ N*var overall; the
    # f6 numerator 2*ssb*(nn-k)*1e6 stays < 1e37 through ~sf100 (doc'd
    # in the pair's docstring); the quotient f6 = F*1e6 is ~1e6-1e10,
    # comfortably BIGINT. significant: F > 2.37 <=> 100*ssb*(nn-k) >
    # 237*ssw*(k-1), exact in wide ints (< 1e33).
    num = _wide_mul(duck, "ssb_c2", "nn - k")
    den = _wide_mul(duck, "ssw_c2", "k - 1")
    f6 = _f6_half_away(duck, num, den)
    sig_l = _wide_mul(duck, "100", "ssb_c2", "nn - k")
    sig_r = _wide_mul(duck, "237", "ssw_c2", "k - 1")
    return f"""
    WITH s AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    m AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents)
                  AS DECIMAL(38,0)) AS s2
      FROM s GROUP BY grp),
    md AS (
      -- exact half-up integer s1^2/n via quotient/remainder:
      --   s1 = q*n + r  =>  s1^2/n = q*s1 + q*r + r^2/n
      -- q from IEEE division of EXACT int64 inputs (s1 <= 2^53) is the
      -- same double in both engines, so FLOOR is deterministic; q*s1 and
      -- q*r are exact DECIMAL products; the residual (2r^2+n) DIV (2n)
      -- is half-up in exact int64 range. No 1e13-magnitude double is
      -- ever rounded.
      SELECT n, s1, s2,
             CAST(FLOOR(CAST(CAST(s1 AS BIGINT) AS DOUBLE) / n) AS BIGINT) AS q
      FROM m),
    mu AS (
      SELECT n, s1, s2, q, CAST(s1 AS BIGINT) - q * n AS r
      FROM md),
    parts AS (
      SELECT
        SUM(CAST(q AS DECIMAL(19,0)) * s1 + CAST(q AS DECIMAL(19,0)) * r
            + CAST(FLOOR(CAST(2 * r * r + n AS DOUBLE) / (2 * n)) AS BIGINT)
           ) AS sum_sq_over_n_c2,
        CAST(SUM(s2) AS DECIMAL(38,0)) AS g2_c2,
        CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(n) AS BIGINT) AS nn,
        CAST(SUM(s1) AS BIGINT) AS g1
      FROM mu),
    gq AS (
      SELECT k, nn, g2_c2, sum_sq_over_n_c2, g1,
             CAST(FLOOR(CAST(g1 AS DOUBLE) / nn) AS BIGINT) AS qg
      FROM parts),
    ss AS (
      SELECT k, nn,
             CAST(sum_sq_over_n_c2
                  - (CAST(qg AS DECIMAL(19,0)) * g1
                     + CAST(qg AS DECIMAL(19,0)) * (g1 - qg * nn)
                     + CAST(FLOOR(CAST(2 * (g1 - qg * nn) * (g1 - qg * nn)
                                        + nn AS DOUBLE) / (2 * nn)) AS BIGINT))
                  AS DECIMAL(38,0)) AS ssb_c2,
             CAST(g2_c2 - sum_sq_over_n_c2 AS DECIMAL(38,0)) AS ssw_c2
      FROM gq)
    SELECT k, nn AS n_total,
           CAST(ssb_c2 AS STRING) AS ss_between_cents2,
           CAST(ssw_c2 AS STRING) AS ss_within_cents2,
           CAST({f6} AS DOUBLE) / CAST(1000000 AS DOUBLE) AS f_stat,
           {sig_l} > {sig_r} AS significant
    FROM ss
    """


sql_pair(
    "g51_anova_f",
    _g51_sql(duck=False),
    duck_sql=_g51_sql(duck=True),
    doc="G51: one-way ANOVA F-test of order value across the five order "
        "priorities — the k-group generalization of G50's two-sample "
        "test (does ANY priority differ?), read against the F(4, inf) "
        "5% critical value 2.37. Decomposition from per-group exact "
        "moments: SSB = sum(s1_i^2/n_i) - G^2/N, SSW = sum(s2_i) - "
        "sum(s1_i^2/n_i). The SS columns are EXACT integer cents^2 "
        "end-to-end: each s1^2/n splits as q*s1 + q*r + r^2/n with "
        "q = s1 DIV n taken from IEEE division of exact-in-double "
        "int64 inputs (deterministic across engines for sum(cents) "
        "<= 2^53, i.e. well past sf100; beyond that swap the FLOOR "
        "for decimal long division), the products exact DECIMAL, and "
        "the residual half-up via (2r^2+n) DIV (2n) in int64 — no "
        "ROUND ever touches a >2^53 double (the round-4 1-ulp "
        "ss-render bug class). Round-6 hardening: the RENDERED row is "
        "integer-pure — the ~2^61 SS columns are emitted as STRING "
        "(digit-exact; a float64-coercing canonicalizer can no longer "
        "diverge per engine), f_stat is micro-units exact integer "
        "division f6 = round_half_up(ssb*(nn-k)*1e6 / (ssw*(k-1))) "
        "via Spark DECIMAL(38,0) DIV / DuckDB HUGEINT `//` (numerator "
        "< 1e37 through ~sf100) rendered as the exact double f6/1e6, "
        "and significant is the exact cross-multiplication "
        "100*ssb*(nn-k) > 237*ssw*(k-1). No DECIMAL->DOUBLE cast "
        "survives anywhere in the output. Scale: partial+final "
        "5-group aggregate over one scan, O(1) state — the same shape "
        "as G02 at 100 TB. One template, two dialect spellings of "
        "exact integer division.",
)


# ---------------------------------------------------------------------------
# dq05: schema drift audit between table versions
# ---------------------------------------------------------------------------


@register(
    "dq05_schema_drift",
    duck_sql="""
    SELECT * FROM (VALUES
      ('o_orderdate',     'unchanged',    'timestamp',       'timestamp'),
      ('o_orderkey',      'unchanged',    'bigint',          'bigint'),
      ('o_orderpriority', 'added',        CAST(NULL AS VARCHAR), 'string'),
      ('o_orderstatus',   'removed',      'string',          CAST(NULL AS VARCHAR)),
      ('o_totalprice',    'type_changed', 'double',          'decimal(12,2)')
    ) AS t(column_name, status, type_v1, type_v2)
    ORDER BY column_name
    """,
)
def dq05_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ05: schema-drift audit between two physical table generations —
    the contract check a pipeline runs BEFORE reading a producer's new
    drop: per column, added / removed / type_changed / unchanged, from
    parquet FOOTERS only (spark.read schema inference touches metadata,
    never data — the 100 TB cost is one footer fetch per file, and with
    a manifest a single read). The fixture writes two real parquet
    generations of orders (v2 adds o_orderpriority, drops o_orderstatus,
    narrows o_totalprice double → decimal(12,2)); the oracle states the
    expected report, certifying the footer read AND the diff logic.
    Complements s15 (mergeSchema tolerates additive drift) and dq01
    (row-level expectations): this is the column-level gate that
    decides whether merge is safe at all."""
    from pydatalake_gen2_spark.queries.scans import _tmp, _write_once

    pa = _tmp("dq05_v1", sf_dir)
    pb = _tmp("dq05_v2", sf_dir)
    orders = spark.table("orders")
    _write_once(
        pa,
        lambda: orders.select(
            "o_orderkey", "o_orderdate", "o_orderstatus", "o_totalprice"
        )
        .write.mode("overwrite")
        .parquet(pa),
    )
    _write_once(
        pb,
        lambda: orders.select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
        )
        .write.mode("overwrite")
        .parquet(pb),
    )
    sa = {f.name: f.dataType.simpleString() for f in spark.read.parquet(pa).schema}
    sb = {f.name: f.dataType.simpleString() for f in spark.read.parquet(pb).schema}
    rows = []
    for col in sorted(set(sa) | set(sb)):
        ta, tb = sa.get(col), sb.get(col)
        status = (
            "added" if ta is None
            else "removed" if tb is None
            else "unchanged" if ta == tb
            else "type_changed"
        )
        rows.append((col, status, ta, tb))
    return spark.createDataFrame(
        rows, "column_name string, status string, type_v1 string, type_v2 string"
    ).orderBy("column_name")


# ---------------------------------------------------------------------------
# g52: mutual information / normalized MI between two categorical columns
# ---------------------------------------------------------------------------

sql_pair(
    "g52_mutual_information",
    """
    WITH cell AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS nxy
      FROM documents GROUP BY lang, source),
    mx AS (SELECT lang, CAST(sum(nxy) AS BIGINT) AS nx FROM cell GROUP BY lang),
    my AS (SELECT source, CAST(sum(nxy) AS BIGINT) AS ny
           FROM cell GROUP BY source),
    tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cell),
    terms AS (
      SELECT CAST(ROUND((CAST(c.nxy AS DOUBLE) / t.n)
                 * LN((CAST(c.nxy AS DOUBLE) * t.n)
                      / (CAST(m1.nx AS DOUBLE) * m2.ny)), 8)
                  AS DECIMAL(20,8)) AS mi_term
      FROM cell c
      JOIN mx m1 ON c.lang = m1.lang
      JOIN my m2 ON c.source = m2.source
      CROSS JOIN tot t),
    hx AS (SELECT sum(CAST(ROUND(-(CAST(nx AS DOUBLE) / t.n)
                                 * LN(CAST(nx AS DOUBLE) / t.n), 8)
                           AS DECIMAL(20,8))) AS h
           FROM mx CROSS JOIN tot t),
    hy AS (SELECT sum(CAST(ROUND(-(CAST(ny AS DOUBLE) / t.n)
                                 * LN(CAST(ny AS DOUBLE) / t.n), 8)
                           AS DECIMAL(20,8))) AS h
           FROM my CROSS JOIN tot t),
    mi AS (SELECT sum(mi_term) AS v FROM terms)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM cell) AS n_cells,
           ROUND(CAST(mi.v AS DOUBLE), 6) AS mi_nats,
           ROUND(CAST(hx.h AS DOUBLE), 6) AS h_lang,
           ROUND(CAST(hy.h AS DOUBLE), 6) AS h_source,
           ROUND(CAST(mi.v AS DOUBLE)
                 / sqrt(CAST(hx.h AS DOUBLE) * CAST(hy.h AS DOUBLE)), 6) AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy
    """,
    doc="G52: mutual information + normalized MI between lang and source "
    "over documents — the information-theoretic dependence measure "
    "feature selection and leakage detection run on categorical pairs "
    "(g38's chi-square asks IF dependent; MI says HOW MUCH, in nats; "
    "NMI = MI/sqrt(H_x·H_y) normalizes to [0,1] for cross-pair "
    "comparison). All probabilities are exact integer-count ratios; "
    "each p·ln term is ROUND(8)-fenced and summed as DECIMAL(20,8) so "
    "the sum is order-free (the g48/l70 log-term discipline — a raw "
    "float Σ would drift by partial-agg order), and every final value "
    "is ROUND(6) after the wide-decimal→double cast. Scale: one "
    "partial+final count over the scan, then all math on the "
    "|lang|x|source| cell table — O(cells), not O(rows). One SQL text, "
    "both dialects.",
)


# ---------------------------------------------------------------------------
# c32: Holt's linear (double exponential) smoothing forecast
# ---------------------------------------------------------------------------

def _holt_factory():
    """Build the per-group Holt recursion worker (module-level classes pickle
    by reference — the cloudpickle gotcha — so the fn is built in a closure)."""
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("m").reset_index(drop=True)
        y = pdf["cents"].astype("float64")
        l = y[0]
        b = 0.0
        for t in range(1, len(y)):
            l_new = 0.3 * y[t] + 0.7 * (l + b)
            b = 0.2 * (l_new - l) + 0.8 * b
            l = l_new
        return pd.DataFrame(
            {
                "pri": [pdf["pri"].iloc[0]],
                "n_months": [len(y)],
                "level": [round(l / 100.0, 4)],
                "trend": [round(b / 100.0, 4)],
                "forecast_3m": [round((l + 3.0 * b) / 100.0, 4)],
            }
        )

    return fit


@register(
    "c32_holt_linear",
    duck_sql="""
    WITH RECURSIVE m AS (
      SELECT o_orderpriority AS pri,
             date_trunc('month', o_orderdate) AS mon,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY date_trunc('month', o_orderdate)) AS BIGINT) AS rn
      FROM orders
      GROUP BY o_orderpriority, date_trunc('month', o_orderdate)),
    h AS (
      SELECT pri, rn, y AS l, CAST(0 AS DOUBLE) AS b
      FROM m WHERE rn = 1
      UNION ALL
      SELECT m.pri, m.rn,
             0.3 * m.y + 0.7 * (h.l + h.b),
             0.2 * ((0.3 * m.y + 0.7 * (h.l + h.b)) - h.l) + 0.8 * h.b
      FROM h JOIN m ON m.pri = h.pri AND m.rn = h.rn + 1),
    last AS (
      SELECT pri, MAX(rn) AS t FROM h GROUP BY pri)
    SELECT h.pri,
           CAST(last.t AS BIGINT) AS n_months,
           ROUND(h.l / 100, 4) AS level,
           ROUND(h.b / 100, 4) AS trend,
           ROUND((h.l + 3.0 * h.b) / 100, 4) AS forecast_3m
    FROM h JOIN last ON h.pri = last.pri AND h.rn = last.t
    ORDER BY h.pri
    """,
    doc="C32: Holt's linear-trend (double exponential) smoothing over the "
        "monthly revenue series per order priority, plus the 3-month-"
        "ahead forecast l_T + 3·b_T — the classic ops-forecasting "
        "recursion (level α=0.3, trend β=0.2, init l₁=y₁, b₁=0) that no "
        "window function expresses (each state feeds the next). Spark "
        "side: the monthly rollup is the ONLY corpus pass (partial+final "
        "agg to exact integer cents), then applyInPandas runs the O(T) "
        "recursion per key — thousands of independent tiny series at "
        "100 TB, each a few dozen floats, the textbook 'aggregate down, "
        "then iterate on the profile' shape. Oracle: a DuckDB RECURSIVE "
        "CTE stepping rn→rn+1 with the IDENTICAL IEEE expression order "
        "(0.3·y + 0.7·(l+b); 0.2·(l_new−l) + 0.8·b), so both engines "
        "walk the same float sequence bit-for-bit; outputs ROUND(4). "
        "Worker fn built in a factory (cloudpickle by-value).",
)
def c32_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    monthly = (
        spark.table("orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("double")
            .alias("cents")
        )
    )
    schema = T.StructType(
        [
            T.StructField("pri", T.StringType()),
            T.StructField("n_months", T.LongType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast_3m", T.DoubleType()),
        ]
    )
    return (
        monthly.groupBy("pri")
        .applyInPandas(_holt_factory(), schema=schema)
        .orderBy("pri")
    )


# ---------------------------------------------------------------------------
# dq06: order-independent reconciliation checksum (cross-engine parity)
# ---------------------------------------------------------------------------

_DQ06_NIB = (
    "(CAST(instr('0123456789abcdef', substring(md5(rowstr), {p}, 1))"
    " AS BIGINT) - 1)"
)

_DQ06_H32 = " + ".join(
    f"({_DQ06_NIB.format(p=i + 1)} * {16 ** (7 - i)})" for i in range(8)
)

sql_pair(
    "dq06_reconciliation_checksum",
    f"""
    WITH canon AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
             CAST(o_orderkey AS STRING) || '|' ||
             CAST(o_custkey AS STRING) || '|' ||
             o_orderstatus || '|' ||
             CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS STRING)
               || '|' ||
             CAST(CAST(o_orderdate AS DATE) AS STRING) || '|' ||
             o_orderpriority AS rowstr
      FROM orders),
    hashed AS (
      SELECT mon, CAST({_DQ06_H32} AS BIGINT) AS h32 FROM canon)
    SELECT mon,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(h32) AS BIGINT) AS checksum,
           CAST(MIN(h32) AS BIGINT) AS min_h,
           CAST(MAX(h32) AS BIGINT) AS max_h
    FROM hashed GROUP BY mon ORDER BY mon
    """,
    doc="DQ06: order-independent reconciliation checksum — the "
        "migration/replication parity audit: every row serializes to a "
        "canonical string (exact integer cents, ISO date, '|' field "
        "separators — no engine-specific float or timestamp rendering "
        "can leak in), hashes through the portable instr-on-hex md5 "
        "decode to a 32-bit integer, and each month partition reports "
        "COUNT + SUM + MIN/MAX of those hashes. SUM is commutative, so "
        "the checksum is independent of row order, partitioning, and "
        "engine — two copies of the table match iff their per-partition "
        "(n_rows, checksum) vectors match, without ever co-locating or "
        "sorting the copies. THIS pair is itself the reconciliation: "
        "the oracle recomputes the fingerprint in a different engine "
        "from the same parquet and the driver asserts byte equality. "
        "Scale: one scan, one partial+final agg; each partition ships "
        "four int64s — the O(partitions) table-diff that replaces the "
        "O(rows) full-compare at 100 TB. One SQL text, both dialects.",
)


# ---------------------------------------------------------------------------
# dq07: observed metrics — audit stats piggybacked on the job (df.observe)
# ---------------------------------------------------------------------------

@register(
    "dq07_observed_metrics",
    duck_sql="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nonpositive,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    doc="DQ07: observed metrics — Spark's Observation/observe() API: the "
        "audit counters (row count, nonpositive-price violations, total "
        "cents, status cardinality) are attached to a REAL filtered scan "
        "job and collected from its accumulators, so the quality gate "
        "costs ZERO extra passes — the exact mechanism behind "
        "Delta-style WAP audits and streaming QueryProgress metrics "
        "(DQ01 folds checks into a dedicated aggregate; observe rides a "
        "job that was running anyway). The observed values return as a "
        "pandas-path literal frame; the oracle recomputes the same "
        "aggregates from the table directly, so the hash certifies the "
        "accumulator path reports EXACTLY what a dedicated aggregate "
        "would. All counters are mergeable int64 accumulators — the "
        "shape holds on any cluster.",
)
def dq07_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import Observation

    obs = Observation("dq07")
    df = (
        spark.table("orders")
        .where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .observe(
            obs,
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonpositive"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
            # countDistinct is rejected by the CollectMetrics analyzer
            # (AGGREGATE_EXPRESSION_WITH_DISTINCT_UNSUPPORTED); collect_set
            # is observe-legal and exact at this 3-value cardinality.
            F.size(F.collect_set("o_orderstatus")).cast("bigint").alias("n_statuses"),
        )
    )
    df.write.format("noop").mode("overwrite").save()  # the job the audit rides
    m = obs.get
    return spark.createDataFrame(
        pd.DataFrame([m]),
        schema="n_rows long, n_nonpositive long, total_cents long, n_statuses long",
    ).select("n_rows", "n_nonpositive", "total_cents", "n_statuses")


# ---------------------------------------------------------------------------
# dq08: SimHash band-cap audit — observability for the capped near-dup default
# ---------------------------------------------------------------------------

@register(
    "dq08_simhash_cap_audit",
    duck_sql="""
    WITH base AS (
      SELECT doc_id AS id, lower(coalesce(text, '')) AS lt FROM documents),
    wtok AS (
      SELECT id, unnest(list_distinct(string_split(lt, ' '))) AS tok
      FROM base),
    th AS (
      SELECT id,
             list_sum(list_transform(generate_series(1, 15), j ->
               CAST(strpos('0123456789abcdef',
                           substring(md5(tok), j, 1)) - 1 AS BIGINT)
               << (4 * (15 - j)))) AS th
      FROM wtok),
    tallies AS (
      SELECT id, i,
             sum(CASE WHEN (th >> i) & 1 = 1 THEN 1 ELSE -1 END) AS tally
      FROM th, unnest(generate_series(0, 47)) u(i) GROUP BY id, i),
    fp AS (
      -- CAST back to BIGINT: DuckDB's sum(BIGINT) widens to HUGEINT, and
      -- without the cast the derived output column `val` reaches the
      -- driver as DECIMAL128(38,0) while Spark emits int64 — values
      -- identical, rendering-hash red (round-10 driver finding).
      SELECT id,
             CAST(sum(CASE WHEN tally > 0 THEN 1::BIGINT << i ELSE 0 END)
                  AS BIGINT) AS sh
      FROM tallies GROUP BY id),
    bands AS (
      SELECT CAST(i AS INT) AS band,
             CASE i WHEN 0 THEN (sh >> 0)  & 511
                    WHEN 1 THEN (sh >> 9)  & 511
                    WHEN 2 THEN (sh >> 18) & 511
                    WHEN 3 THEN (sh >> 27) & 511
                    ELSE        (sh >> 36) & 4095 END AS val
      FROM fp, unnest(generate_series(0, 4)) u(i))
    SELECT band, val, CAST(count(*) AS BIGINT) AS occupancy
    FROM bands GROUP BY 1, 2 HAVING count(*) > 100
    ORDER BY band, val
    """,
    doc="DQ08: SimHash band-cap audit (r9 ADVICE observability): the band "
        "buckets a band_max_df=100 cap would drop from the banded near-dup "
        "join — i.e. exactly where simhash_neardup_pairs' scale-safe "
        "default trades recall, quantified per bucket. One fingerprint "
        "pass + one partial-agg groupBy + a HAVING filter: no join, no "
        "candidate materialization, so the audit costs O(n) regardless of "
        "how hot the buckets are — runnable BEFORE committing to a dedup "
        "pass over 100 TB. The oracle replicates the md5 fingerprint "
        "recurrence and banding bit-for-bit (the l42-leg discipline); an "
        "empty result at the production cap certifies capped == exact on "
        "that corpus (tests/test_properties.py::"
        "test_simhash_dropped_bands_audit proves the loss accounting).",
)
def dq08_simhash_cap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pydatalake_gen2_spark.operators import dedup

    # cap=100: low enough that the fixtures' 31-word vocabulary (which
    # clusters fingerprints hard) yields a non-empty, scale-stable audit
    # at every oracle scale — the non-vacuous form of the check.
    return dedup.simhash_dropped_bands(
        spark.table("documents"), r=4, band_max_df=100
    ).orderBy("band", "val")


# ---------------------------------------------------------------------------
# g60: Brown-Forsythe (Levene-at-median) variance-homogeneity test
# ---------------------------------------------------------------------------

def _g62_sql(duck: bool) -> str:
    # Same integer-pure final render as g51 (see the round-6 note above
    # g51): SS as STRING, W-stat via exact micro-unit integer division,
    # fence by exact cross-multiplication. z = |cents - median| keeps
    # magnitudes below g51's, so g51's overflow bounds dominate.
    num = _wide_mul(duck, "ssb_c2", "nn - k")
    den = _wide_mul(duck, "ssw_c2", "k - 1")
    f6 = _f6_half_away(duck, num, den)
    sig_l = _wide_mul(duck, "100", "ssb_c2", "nn - k")
    sig_r = _wide_mul(duck, "237", "ssw_c2", "k - 1")
    return f"""
    WITH s AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    med AS (
      SELECT grp,
             CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY cents)
                  AS BIGINT) AS med
      FROM s GROUP BY grp),
    z AS (
      SELECT s.grp, ABS(s.cents - med.med) AS zv
      FROM s JOIN med ON s.grp = med.grp),
    m AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(zv) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(zv AS DECIMAL(19,0)) * zv) AS DECIMAL(38,0)) AS s2
      FROM z GROUP BY grp),
    md AS (
      SELECT n, s1, s2,
             CAST(FLOOR(CAST(CAST(s1 AS BIGINT) AS DOUBLE) / n) AS BIGINT) AS q
      FROM m),
    mu AS (
      SELECT n, s1, s2, q, CAST(s1 AS BIGINT) - q * n AS r
      FROM md),
    parts AS (
      SELECT
        SUM(CAST(q AS DECIMAL(19,0)) * s1 + CAST(q AS DECIMAL(19,0)) * r
            + CAST(FLOOR(CAST(2 * r * r + n AS DOUBLE) / (2 * n)) AS BIGINT)
           ) AS sum_sq_over_n_c2,
        CAST(SUM(s2) AS DECIMAL(38,0)) AS g2_c2,
        CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(n) AS BIGINT) AS nn,
        CAST(SUM(s1) AS BIGINT) AS g1
      FROM mu),
    gq AS (
      SELECT k, nn, g2_c2, sum_sq_over_n_c2, g1,
             CAST(FLOOR(CAST(g1 AS DOUBLE) / nn) AS BIGINT) AS qg
      FROM parts),
    ss AS (
      SELECT k, nn,
             CAST(sum_sq_over_n_c2
                  - (CAST(qg AS DECIMAL(19,0)) * g1
                     + CAST(qg AS DECIMAL(19,0)) * (g1 - qg * nn)
                     + CAST(FLOOR(CAST(2 * (g1 - qg * nn) * (g1 - qg * nn)
                                        + nn AS DOUBLE) / (2 * nn)) AS BIGINT))
                  AS DECIMAL(38,0)) AS ssb_c2,
             CAST(g2_c2 - sum_sq_over_n_c2 AS DECIMAL(38,0)) AS ssw_c2
      FROM gq)
    SELECT k, nn AS n_total,
           CAST(ssb_c2 AS STRING) AS ss_between_cents2,
           CAST(ssw_c2 AS STRING) AS ss_within_cents2,
           CAST({f6} AS DOUBLE) / CAST(1000000 AS DOUBLE) AS w_stat,
           {sig_l} > {sig_r} AS significant
    FROM ss
    """


sql_pair(
    "g62_brown_forsythe",
    _g62_sql(duck=False),
    duck_sql=_g62_sql(duck=True),
    doc="G62: Brown-Forsythe test (Levene centered at the MEDIAN) for "
        "variance homogeneity of order value across the five priorities "
        "— the precondition audit for G51's ANOVA (pooled-variance "
        "F-tests assume equal group variances; when this test fires, "
        "reach for G50's Welch instead). Transform-then-ANOVA: "
        "z = |cents − group median| where the median is PERCENTILE_DISC "
        "(an actual data value, so z is an EXACT integer), then the "
        "one-way ANOVA F on z via g51's exact-SS machinery — "
        "quotient/remainder split per group, every SS column exact "
        "integer cents^2 rendered as STRING, the W-stat exact "
        "micro-unit integer division rendered as f6/1e6, and the "
        "fence an exact cross-multiplication (g51's round-6 "
        "integer-pure render — no DECIMAL->DOUBLE cast in the output), "
        "read against the same F(4, inf) 5% fence 2.37. Scale: the "
        "per-group median is the only rank step (a fixed-k "
        "PERCENTILE_DISC over the group — at 100 TB use the partial-agg "
        "approx_percentile with a documented tolerance or a two-pass "
        "exact selection); everything after is the same partial+final "
        "5-group aggregate as G02. One SQL text in both dialects.",
)


# ---------------------------------------------------------------------------
# g61: Cramer's V effect size for the g38 contingency table
# ---------------------------------------------------------------------------

sql_pair(
    "g61_cramers_v",
    """
    WITH obs AS (
      SELECT event_type, CAST(user_id % 4 AS INT) AS ub,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY event_type, CAST(user_id % 4 AS INT)),
    rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY event_type),
    ct AS (SELECT ub, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY ub),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
    chi AS (
      SELECT CAST(count(*) AS BIGINT) AS n_cells,
             CAST(count(DISTINCT obs.event_type) AS BIGINT) AS nr,
             CAST(count(DISTINCT obs.ub) AS BIGINT) AS nc,
             CAST(SUM(CAST(ROUND(
                   ((o - (CAST(r AS DOUBLE) * c / n))
                    * (o - (CAST(r AS DOUBLE) * c / n)))
                   / (CAST(r AS DOUBLE) * c / n), 6) AS DECIMAL(18,6)))
               AS DOUBLE) AS chi2
      FROM obs
      JOIN rt ON obs.event_type = rt.event_type
      JOIN ct ON obs.ub = ct.ub
      CROSS JOIN tot)
    SELECT n_cells, (nr - 1) * (nc - 1) AS dof,
           ROUND(chi2, 6) AS chi2,
           ROUND(SQRT(chi2 / (n * LEAST(nr - 1, nc - 1))), 6) AS cramers_v,
           SQRT(chi2 / (n * LEAST(nr - 1, nc - 1))) < 0.1 AS negligible
    FROM chi CROSS JOIN tot
    """,
    doc="G61: Cramer's V effect size on G38's event_type x user-bucket "
        "contingency table — the magnitude read the chi-square lacks "
        "(at 100 TB row counts, chi2 'significance' fires on trivially "
        "small associations; V = sqrt(chi2 / (n*min(r-1,c-1))) in [0,1] "
        "is sample-size-free, fenced here at the conventional 0.1 "
        "'negligible' threshold). Same integer-tally contingency "
        "machinery as G38 (tallies cross the shuffle, never rows), "
        "chi2's per-cell terms ROUND(6)-then-DECIMAL-summed, V one "
        "final IEEE expression ROUND(6). One SQL text in both "
        "dialects.",
)


# ---------------------------------------------------------------------------
# g63: Tukey-Kramer HSD post-hoc pairwise comparison (after g51's ANOVA)
# ---------------------------------------------------------------------------

def _g63_sql(duck: bool) -> str:
    # Round-6 hardening: ms_within used to be CAST(DECIMAL(38,0) AS
    # DOUBLE)/(nn-k) — a ~2^61 int128->double cast DuckDB does not
    # correctly round. Now msw_c2 = round_half_up(ssw/(nn-k)) via exact
    # wide-integer division: the quotient is the per-row z-variance in
    # cents^2 (~1e13-1e15, < 2^53 at ANY table size since it is
    # row-count-free), so CAST(msw_c2 AS DOUBLE) is exact and every
    # later IEEE step is deterministic across engines. The +-0.5 cents^2
    # truncation is ~1e-15 relative — invisible at ROUND(6).
    msw = _idiv(
        duck,
        f"2 * {_wide_mul(duck, 'g2_c2 - sum_sq_over_n_c2')} + (nn - k)",
        "2 * (nn - k)",
    )
    return f"""
    WITH s AS (
      SELECT o_orderpriority AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    m AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS DECIMAL(38,0)) AS s1,
             CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents)
                  AS DECIMAL(38,0)) AS s2
      FROM s GROUP BY grp),
    mu AS (
      SELECT grp, n, s1, s2, q,
             CAST(s1 AS BIGINT) - q * n AS r
      FROM (SELECT grp, n, s1, s2,
                   CAST(FLOOR(CAST(CAST(s1 AS BIGINT) AS DOUBLE) / n)
                        AS BIGINT) AS q
            FROM m) t),
    parts AS (
      SELECT
        SUM(CAST(q AS DECIMAL(19,0)) * s1 + CAST(q AS DECIMAL(19,0)) * r
            + CAST(FLOOR(CAST(2 * r * r + n AS DOUBLE) / (2 * n)) AS BIGINT)
           ) AS sum_sq_over_n_c2,
        CAST(SUM(s2) AS DECIMAL(38,0)) AS g2_c2,
        CAST(COUNT(*) AS BIGINT) AS k,
        CAST(SUM(n) AS BIGINT) AS nn
      FROM mu),
    msw AS (
      SELECT k, nn,
             CAST(CAST({msw} AS BIGINT) AS DOUBLE) AS ms_within
      FROM parts)
    SELECT a.grp AS grp_a, b.grp AS grp_b,
           a.q AS mean_a_cents, b.q AS mean_b_cents,
           ROUND(ABS(CAST(CAST(a.s1 AS BIGINT) AS DOUBLE) / a.n
                     - CAST(CAST(b.s1 AS BIGINT) AS DOUBLE) / b.n)
                 / SQRT(ms_within / 2
                        * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat,
           ABS(CAST(CAST(a.s1 AS BIGINT) AS DOUBLE) / a.n
               - CAST(CAST(b.s1 AS BIGINT) AS DOUBLE) / b.n)
             / SQRT(ms_within / 2
                    * (1.0 / a.n + 1.0 / b.n)) > 3.858 AS significant
    FROM mu a JOIN mu b ON a.grp < b.grp
    CROSS JOIN msw
    ORDER BY grp_a, grp_b
    """


sql_pair(
    "g63_tukey_hsd",
    _g63_sql(duck=False),
    duck_sql=_g63_sql(duck=True),
    doc="G63: Tukey-Kramer HSD — the post-hoc step after G51's ANOVA "
        "says 'SOME priority differs': all 10 pairwise priority "
        "comparisons with the studentized-range statistic "
        "q = |mean_a - mean_b| / sqrt(MSW/2 * (1/n_a + 1/n_b)), read "
        "against q(0.05, k=5, df=inf) = 3.858 — the family-wise-error "
        "control a naive 10x t-test loop lacks. MSW comes from g51's "
        "exact integer cents^2 SSW via exact wide-integer division to "
        "a <2^53 BIGINT (round-6: the DECIMAL(38,0)->DOUBLE cast is "
        "gone — DuckDB's int128->double is not correctly rounded); "
        "reported group means are exact floor-cents "
        "(q from the same split), and each q_stat is ONE IEEE "
        "expression over exact integer moments, ROUND(6). Scale: the "
        "same one-scan 5-group aggregate as G51 — the pairwise stage "
        "is k^2/2 rows of post-agg metadata. One SQL text in both "
        "dialects.",
)


# ---------------------------------------------------------------------------
# g64: two-way ANOVA (priority x status) from exact integer moments
# ---------------------------------------------------------------------------

def _g64_ssq_block(nm: str, grp: str) -> str:
    """Exact half-up SUM over groups of s1^2/n in integer cents^2 — the
    g51 quotient/remainder machinery as a reusable text block; groups by
    `grp` over the shared `s` (grp_a, grp_b, cents) CTE."""
    group_by = f"GROUP BY {grp.rstrip(', ')}" if grp else ""
    return f"""
    m_{nm} AS (
      SELECT {grp} CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS DECIMAL(38,0)) AS s1
      FROM s {group_by}),
    u_{nm} AS (
      SELECT CAST(SUM(CAST(q AS DECIMAL(19,0)) * s1
                 + CAST(q AS DECIMAL(19,0)) * (CAST(s1 AS BIGINT) - q * n)
                 + CAST(FLOOR(CAST(2 * (CAST(s1 AS BIGINT) - q * n)
                                     * (CAST(s1 AS BIGINT) - q * n)
                                     + n AS DOUBLE) / (2 * n)) AS BIGINT))
               AS DECIMAL(38,0)) AS ssq,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM (SELECT n, s1,
                   CAST(FLOOR(CAST(CAST(s1 AS BIGINT) AS DOUBLE) / n)
                        AS BIGINT) AS q
            FROM m_{nm}) t)"""


def _g64_sql(duck: bool) -> str:
    # Round-6 integer-pure render (see g51): SS columns as STRING, the
    # three F ratios as exact micro-unit integer division f6/1e6.
    # SS_AB can go slightly NEGATIVE under imbalance (Type-I-style
    # decomposition) — _f6_half_away is sign-correct (half away from
    # zero in both engines; both DIV spellings truncate toward zero).
    f_a = _f6_half_away(
        duck,
        _wide_mul(duck, "ss_a_c2", "n_total - k_cells"),
        _wide_mul(duck, "ss_within_c2", "k_a - 1"),
    )
    f_b = _f6_half_away(
        duck,
        _wide_mul(duck, "ss_b_c2", "n_total - k_cells"),
        _wide_mul(duck, "ss_within_c2", "k_b - 1"),
    )
    f_ab = _f6_half_away(
        duck,
        _wide_mul(duck, "ss_ab_c2", "n_total - k_cells"),
        _wide_mul(duck, "ss_within_c2", "(k_a - 1) * (k_b - 1)"),
    )
    return (
        """
    WITH s AS (
      SELECT o_orderpriority AS grp_a, o_orderstatus AS grp_b,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),"""
        + _g64_ssq_block("a", "grp_a, ") + ","
        + _g64_ssq_block("b", "grp_b, ") + ","
        + _g64_ssq_block("ab", "grp_a, grp_b, ") + ","
        + _g64_ssq_block("g", "") + ","
        + f"""
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS nn,
             CAST(sum(CAST(cents AS DECIMAL(19,0)) * cents)
                  AS DECIMAL(38,0)) AS g2
      FROM s),
    ss AS (
      SELECT u_a.k AS k_a, u_b.k AS k_b, u_ab.k AS k_cells, tot.nn AS n_total,
             CAST(u_a.ssq - u_g.ssq AS DECIMAL(38,0)) AS ss_a_c2,
             CAST(u_b.ssq - u_g.ssq AS DECIMAL(38,0)) AS ss_b_c2,
             CAST(u_ab.ssq - u_a.ssq - u_b.ssq + u_g.ssq
                  AS DECIMAL(38,0)) AS ss_ab_c2,
             CAST(tot.g2 - u_ab.ssq AS DECIMAL(38,0)) AS ss_within_c2
      FROM u_a CROSS JOIN u_b CROSS JOIN u_ab CROSS JOIN u_g CROSS JOIN tot)
    SELECT k_a, k_b, k_cells, n_total,
           CAST(ss_a_c2 AS STRING) AS ss_a_cents2,
           CAST(ss_b_c2 AS STRING) AS ss_b_cents2,
           CAST(ss_ab_c2 AS STRING) AS ss_ab_cents2,
           CAST(ss_within_c2 AS STRING) AS ss_within_cents2,
           CAST({f_a} AS DOUBLE) / CAST(1000000 AS DOUBLE) AS f_a,
           CAST({f_b} AS DOUBLE) / CAST(1000000 AS DOUBLE) AS f_b,
           CAST({f_ab} AS DOUBLE) / CAST(1000000 AS DOUBLE) AS f_interaction
    FROM ss
    """
    )


sql_pair(
    "g64_two_way_anova",
    _g64_sql(duck=False),
    duck_sql=_g64_sql(duck=True),
    doc="G64: two-way ANOVA of order value on priority (5 levels) x "
        "status (3 levels) — the factorial readout after G51/G62: main "
        "effects AND whether the factors INTERACT (does priority's "
        "effect differ by status?). Sums of squares via the sequential "
        "decomposition SS_A = sum_a s1_a^2/n_a - G^2/N (and likewise B, "
        "cells), SS_AB = SS_cells - SS_A - SS_B, SS_within = sum s2 - "
        "sum_cells s1^2/n — every term an EXACT integer cents^2 through "
        "g51's quotient/remainder machinery (the _g64_ssq_block text "
        "block reuses it verbatim per grouping), so the SS columns are "
        "hash-stable at any scale — rendered as STRING with the three "
        "F ratios as exact micro-unit integer divisions (g51's round-6 "
        "integer-pure render; sign-correct for the negative-SS_AB "
        "case). Caveat stated, not hidden: with unbalanced cells "
        "this is the Type-I-style decomposition (SS_AB can go slightly "
        "negative under strong imbalance; TPC-H's near-uniform factors "
        "keep it well-posed). Scale: ONE scan, 15-cell partial+final "
        "aggregate — the same shape as G02 at 100 TB. One SQL text in "
        "both dialects.",
)


# ---------------------------------------------------------------------------
# g65: Kendall tau-b rank correlation (monthly volume vs avg order value)
# ---------------------------------------------------------------------------

sql_pair(
    "g65_kendall_tau",
    """
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mk,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DECIMAL(19,0)) AS cents
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT a.n AS xa, b.n AS xb,
             a.cents * b.n AS ya_cross, b.cents * a.n AS yb_cross
      FROM monthly a JOIN monthly b ON a.mk < b.mk),
    tallies AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN (xa < xb AND ya_cross < yb_cross)
                            OR (xa > xb AND ya_cross > yb_cross)
                      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
             CAST(SUM(CASE WHEN (xa < xb AND ya_cross > yb_cross)
                            OR (xa > xb AND ya_cross < yb_cross)
                      THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
             CAST(SUM(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
             CAST(SUM(CASE WHEN ya_cross = yb_cross THEN 1 ELSE 0 END)
                  AS BIGINT) AS ties_y
      FROM pairs),
    nm AS (SELECT CAST(count(*) AS BIGINT) AS n_months FROM monthly)
    SELECT n_months, n_pairs, concordant, discordant, ties_x, ties_y,
           ROUND(CAST(concordant - discordant AS DOUBLE)
                 / SQRT(CAST(n_pairs - ties_x AS DOUBLE)
                        * CAST(n_pairs - ties_y AS DOUBLE)), 6) AS tau_b
    FROM tallies CROSS JOIN nm
    """,
    doc="G65: Kendall tau-b rank correlation between monthly order VOLUME "
        "and monthly AVERAGE order value — do busy months run cheaper "
        "orders? The robust, outlier-proof companion to G45's Pearson "
        "and G59's Theil-Sen: tau depends only on pair ORDERINGS. The "
        "average (a rational cents/n) is never materialized: pair "
        "comparisons cross-multiply a.cents*b.n vs b.cents*a.n in exact "
        "DECIMAL — concordant/discordant/tie tallies are pure integer "
        "facts, and tau_b is ONE final IEEE expression ROUND(6). Scale: "
        "'aggregate down, iterate on the profile' (G59's discipline) — "
        "one scan reduces to ~80 month rows, the O(months^2) pair join "
        "is post-agg metadata. One SQL text in both dialects.",
)


# ---------------------------------------------------------------------------
# g66: Mann-Kendall trend test on monthly revenue
# ---------------------------------------------------------------------------

sql_pair(
    "g66_mann_kendall",
    """
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mk,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DECIMAL(19,0)) AS y
      FROM orders GROUP BY 1),
    pairs AS (
      SELECT CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
      FROM monthly a JOIN monthly b ON a.mk < b.mk),
    stat AS (
      SELECT CAST(SUM(sgn) AS BIGINT) AS s,
             CAST(SUM(CASE WHEN sgn = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS tied_pairs
      FROM pairs),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM monthly)
    SELECT n AS n_months, s AS mk_s, tied_pairs,
           ROUND(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1)
                      WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1)
                      ELSE 0.0 END
                 / SQRT(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) / 18),
                 6) AS z_stat,
           ABS(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1)
                    WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1)
                    ELSE 0.0 END
               / SQRT(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) / 18))
             > 1.959963985 AS significant
    FROM stat CROSS JOIN nn
    """,
    doc="G66: Mann-Kendall monotone-trend test on monthly revenue — the "
        "SIGNIFICANCE companion to G59's Theil-Sen slope (the pair every "
        "environmental/ops time-series methodology ships together): "
        "S = sum of sign(y_j - y_i) over all month pairs is a pure "
        "integer tally from exact-cents comparisons (no ranks "
        "materialized, no floats), the no-ties normal approximation "
        "var = n(n-1)(2n+5)/18 and the continuity-corrected z are ONE "
        "final IEEE expression ROUND(6), read against |z| > 1.96 "
        "(tied_pairs reported so a reader can see the no-ties "
        "assumption hold — exact-cents monthly sums virtually never "
        "tie). Scale: G59's 'aggregate down, iterate on the profile' — "
        "one scan to ~80 month rows, O(months^2) pairs post-agg. One "
        "SQL text in both dialects.",
)


# ---------------------------------------------------------------------------
# c33: Holt-Winters additive seasonal smoothing (period 12) forecast
# ---------------------------------------------------------------------------

def _hw_factory():
    """Per-group Holt-Winters worker, built in a closure (cloudpickle
    pickles module-level functions by reference)."""
    import pandas as pd

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("m").reset_index(drop=True)
        y = pdf["cents"].astype("float64").tolist()
        if len(y) < 13:
            return pd.DataFrame(
                columns=["pri", "n_months", "level", "trend",
                         "season_3", "forecast_3m"]
            )
        l = sum(y[:12]) / 12.0  # exact-int partials -> one IEEE divide
        seas = [v - l for v in y[:12]]
        b = 0.0
        for t in range(12, len(y)):
            s_old = seas[0]
            l_new = 0.3 * (y[t] - s_old) + 0.7 * (l + b)
            b = 0.2 * (l_new - l) + 0.8 * b
            s_new = 0.1 * (y[t] - l_new) + 0.9 * s_old
            seas = seas[1:] + [s_new]
            l = l_new
        import math

        def r4(x: float) -> float:
            # SQL ROUND is half-away-from-zero; python round() is
            # half-even (a real tie fired once at sf0.01 — ud05).
            return math.copysign(
                math.floor(abs(x) * 1e4 + 0.5), x
            ) / 1e4

        return pd.DataFrame({
            "pri": [pdf["pri"].iloc[0]],
            "n_months": [len(y)],
            "level": [r4(l / 100.0)],
            "trend": [r4(b / 100.0)],
            "season_3": [r4(seas[2] / 100.0)],
            "forecast_3m": [r4((l + 3.0 * b + seas[2]) / 100.0)],
        })

    return fit


@register(
    "c33_holt_winters",
    duck_sql="""
    WITH RECURSIVE m AS (
      SELECT o_orderpriority AS pri,
             date_trunc('month', o_orderdate) AS mon,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS DOUBLE) AS y,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
               ORDER BY date_trunc('month', o_orderdate)) AS BIGINT) AS rn
      FROM orders
      GROUP BY o_orderpriority, date_trunc('month', o_orderdate)),
    b0 AS (
      SELECT pri, list(y ORDER BY rn) AS ys, sum(y) AS sy
      FROM m WHERE rn <= 12 GROUP BY pri HAVING count(*) = 12),
    h AS (
      SELECT pri, CAST(12 AS BIGINT) AS rn, sy/12.0 AS l,
             CAST(0 AS DOUBLE) AS b,
             list_transform(ys, v -> v - sy/12.0) AS seas
      FROM b0
      UNION ALL
      SELECT m.pri, m.rn,
             0.3 * (m.y - h.seas[1]) + 0.7 * (h.l + h.b),
             0.2 * ((0.3 * (m.y - h.seas[1]) + 0.7 * (h.l + h.b)) - h.l)
               + 0.8 * h.b,
             list_concat(h.seas[2:],
               [0.1 * (m.y - (0.3 * (m.y - h.seas[1]) + 0.7 * (h.l + h.b)))
                + 0.9 * h.seas[1]])
      FROM h JOIN m ON m.pri = h.pri AND m.rn = h.rn + 1),
    last AS (SELECT pri, MAX(rn) AS t FROM h GROUP BY pri
             HAVING MAX(rn) >= 13)
    SELECT h.pri, CAST(last.t AS BIGINT) AS n_months,
           ROUND(h.l / 100, 4) AS level,
           ROUND(h.b / 100, 4) AS trend,
           ROUND(h.seas[3] / 100, 4) AS season_3,
           ROUND((h.l + 3.0 * h.b + h.seas[3]) / 100, 4) AS forecast_3m
    FROM h JOIN last ON h.pri = last.pri AND h.rn = last.t
    ORDER BY h.pri
    """,
    doc="C33: Holt-Winters ADDITIVE-SEASONAL (triple exponential)"
        " smoothing over the monthly revenue series per order priority,"
        " period 12 (alpha=0.3, beta=0.2, gamma=0.1; init l = mean of the"
        " first year, s_i = y_i - l, b = 0), plus the 3-month-ahead"
        " forecast l + 3b + s_{T+3-12} — c32's linear-trend recursion"
        " completed with the seasonal state no window function can carry."
        " Spark side: ONE corpus pass to exact integer monthly cents,"
        " then applyInPandas runs the O(T) recursion per key (aggregate"
        " down, iterate on the profile). Oracle: a DuckDB RECURSIVE CTE"
        " whose rows CARRY THE 12-SLOT SEASONAL WINDOW AS A LIST"
        " (seas[2:] || [s_new] each step) and step the IDENTICAL IEEE"
        " expression order, so both engines walk the same float sequence"
        " bit-for-bit; outputs ROUND(4). The init mean is an exact-int"
        " sum (order-free, < 2^53) through one IEEE divide in both"
        " engines. Worker built in a factory (cloudpickle by-value)."
        " Boundary guard (r7 advice): a series of EXACTLY 12 months is"
        " emitted by neither side — Python requires len(y) >= 13 and the"
        " oracle's last CTE requires MAX(rn) >= 13, so the b0 anchor row"
        " alone never surfaces on sparse fixtures.",
)
def c33_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    monthly = (
        spark.table("orders")
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("double")
            .alias("cents")
        )
    )
    schema = T.StructType([
        T.StructField("pri", T.StringType()),
        T.StructField("n_months", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("season_3", T.DoubleType()),
        T.StructField("forecast_3m", T.DoubleType()),
    ])
    return (
        monthly.groupBy("pri")
        .applyInPandas(_hw_factory(), schema=schema)
        .orderBy("pri")
    )
