"""Window functions — SURVEY.md §2B.5 (W01-W09).

Determinism rules:
- ROW_NUMBER / NTILE / ROWS-frame aggregates need a TOTAL order inside the
  partition → ORDER BY always ends with a unique key (o_orderkey /
  (l_orderkey, l_linenumber)).
- RANGE frames and RANK aggregate peers together, so ties are safe.
- Running sums use exact DECIMAL accumulation, cast to DOUBLE at the end.

Scale note: one shuffle per distinct partitionBy key set; all these reuse
o_custkey so Catalyst shares the exchange when composed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_gen2_spark.queries.sqlexact import dec2dbl as _dec2dbl
from pydatalake_gen2_spark.registry import register, sql_pair

sql_pair(
    "w01_row_number",
    """
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
    FROM orders
    """,
)

sql_pair(
    "w02_rank_dense_rank",
    """
    SELECT o_custkey, o_orderkey,
           CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS BIGINT)
               AS drnk
    FROM orders
    """,
)

sql_pair(
    "w03_ntile",
    """
    SELECT o_orderkey,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
    FROM orders
    """,
)

sql_pair(
    "w04_percent_rank_cume_dist",
    """
    SELECT o_orderkey,
           ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey), 6) AS pr,
           ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey), 6) AS cd
    FROM orders
    """,
)

sql_pair(
    "w05_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           CAST(LAG(o_totalprice, 1, 0.0) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice, 1, -1.0) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next_price
    FROM orders
    """,
)

# last_value trap: default frame stops at CURRENT ROW → explicit unbounded frame.
sql_pair(
    "w06_first_last_nth",
    """
    SELECT o_custkey, o_orderkey,
           CAST(FIRST_VALUE(o_totalprice) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS first_p,
           CAST(LAST_VALUE(o_totalprice) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_p,
           CAST(NTH_VALUE(o_totalprice, 2) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS second_p
    FROM orders
    """,
)

sql_pair(
    "w07_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
)

sql_pair(
    "w08_moving_avg",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) /
               COUNT(*) OVER w AS mov_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)

sql_pair(
    "w09_range_frame",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_within_10k,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_within_10k
    FROM orders
    """,
)


sql_pair(
    "w11_latest_per_key",
    """
    SELECT user_id, event_id, event_type, ROUND(value, 4) AS value
    FROM (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
    doc="""Latest-event-per-key compaction (CDC-style upsert resolution):
    one window shuffle on the key; at scale this is the standard
    pre-aggregation that replaces a full dedup sort of the log.""",
)


sql_pair(
    "w12_funnel_steps",
    """
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS viewed,
           CAST(sum(CASE WHEN t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
             AS clicked_after_view,
           CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
    FROM firsts
    """,
    doc="""Ordered-funnel analysis (view -> click -> purchase): first-touch
    per step via conditional MIN in ONE groupBy pass (no self-joins,
    no window sort) — the per-user state is 3 timestamps regardless of
    event volume.""",
)


sql_pair(
    "w13_gap_fill_ffill",
    """
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events WHERE user_id < 20 GROUP BY user_id, date_trunc('hour', ts)),
    bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id),
    spine AS (
      SELECT user_id, explode(sequence(h0, h1, interval 1 hour)) AS h FROM bounds),
    joined AS (
      SELECT s.user_id, s.h, o.v
      FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h)
    SELECT user_id, date_format(h, 'yyyy-MM-dd HH:mm:ss') AS hour,
           (v IS NOT NULL) AS observed,
           last(v) IGNORE NULLS
             OVER (PARTITION BY user_id ORDER BY h) AS v_ffill
    FROM joined
    """,
    duck_sql="""
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events WHERE user_id < 20 GROUP BY user_id, date_trunc('hour', ts)),
    bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id),
    spine AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM bounds),
    joined AS (
      SELECT s.user_id, s.h, o.v
      FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h)
    SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           (v IS NOT NULL) AS observed,
           last_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY h) AS v_ffill
    FROM joined
    """,
    doc="""Time-series resample + gap-fill + forward-fill (the hypertable
    rollup shape): hourly spine per key via sequence/explode (distributed,
    no driver loop), left join of observed buckets, last-IGNORE-NULLS
    carry-forward. One join shuffle + one window shuffle, both on the
    series key.""",
)


@register(
    "w14_cumulative_distinct",
    duck_sql="""
    WITH firsts AS (
      SELECT user_id, strftime(min(CAST(ts AS DATE)), '%Y-%m-%d') AS first_day
      FROM events GROUP BY user_id),
    daily AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_day)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM daily
    """,
)
def w14_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time WITHOUT a quadratic
    distinct-per-window: each user collapses to a first-seen day
    (partial-agg groupBy), days aggregate, and a running sum over the
    tiny day spine gives the cumulative distinct count — the standard
    rewrite that turns an O(days × users) windowed COUNT(DISTINCT) into
    two linear aggs + an output-sized window."""
    from pyspark.sql.window import Window

    firsts = (
        spark.table("events")
        .groupBy("user_id")
        .agg(F.date_format(F.min(F.col("ts").cast("date")), "yyyy-MM-dd").alias("first_day"))
    )
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


sql_pair(
    "w15_rolling_stddev",
    """
    WITH s AS (
      SELECT o_custkey, o_orderkey,
             COUNT(*) OVER w AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))
                      * CAST(o_totalprice AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s2
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
    SELECT o_custkey, o_orderkey,
           CASE WHEN n > 1
                THEN ROUND(sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))), 4)
           END AS rolling_std
    FROM s ORDER BY o_custkey, o_orderkey
    """,
    """
    WITH s AS (
      SELECT o_custkey, o_orderkey,
             COUNT(*) OVER w AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,8))
                      * CAST(o_totalprice AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s2
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
    SELECT o_custkey, o_orderkey,
           CASE WHEN n > 1
                THEN ROUND(sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))), 4)
           END AS rolling_std
    FROM s ORDER BY o_custkey, o_orderkey
    """,
    doc="Rolling per-key sample stddev over a 6-row frame, composed from "
        "DECIMAL-exact frame sums (n, Σx, Σx²) so both engines feed "
        "bit-identical doubles into one final sqrt — no streaming-variance "
        "float drift. One window shuffle on the key.",
)


sql_pair(
    "w16_streaks",
    """
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('DAY', ts) AS DATE) AS day
               FROM events),
    r AS (SELECT user_id, day,
                 row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
          FROM d),
    g AS (SELECT user_id, day, date_sub(day, rn) AS grp FROM r)
    SELECT user_id,
           date_format(MIN(day), 'yyyy-MM-dd') AS start_day,
           CAST(COUNT(*) AS BIGINT) AS streak_len
    FROM g GROUP BY user_id, grp
    HAVING COUNT(*) >= 2
    ORDER BY user_id, start_day
    """,
    """
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
    r AS (SELECT user_id, day,
                 row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
          FROM d),
    g AS (SELECT user_id, day, day - CAST(rn AS INTEGER) AS grp FROM r)
    SELECT user_id,
           strftime(MIN(day), '%Y-%m-%d') AS start_day,
           CAST(COUNT(*) AS BIGINT) AS streak_len
    FROM g GROUP BY user_id, grp
    HAVING COUNT(*) >= 2
    ORDER BY user_id, start_day
    """,
    doc="Consecutive-active-day streaks per user — the canonical "
        "gaps-and-islands rewrite (day minus dense row_number is "
        "constant within a run). Two shuffles total (distinct + window "
        "share the user_id key); no self-join, no recursion.",
)


@register(
    "w17_ohlc_resample",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS bucket,
           event_type,
           arg_min(value, ts) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ts) AS close,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="W17: time-series OHLC resample — downsample the event stream to "
        "per-(hour, event_type) open/high/low/close bars in ONE partial-agg "
        "pass (min_by/max_by carry the endpoint values; no window, no "
        "self-join). Event ts is unique at fixture scale (asserted in "
        "tests/test_operators.py) so min_by(value, ts) is deterministic; at "
        "100 TB use min_by(value, struct(ts, event_id)) for tie-safety. "
        "Scale: map-side partial aggregation collapses each input split to "
        "one row per (hour, type) before the single shuffle; bar count is "
        "bounded by hours x types, so the reduce side is tiny regardless of "
        "input volume.",
)
def w17_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.table("events")
    bucket = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00")
    return (
        ev.groupBy(bucket.alias("bucket"), "event_type")
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("volume"),
        )
        .orderBy("bucket", "event_type")
    )


sql_pair(
    "w18_time_range_frame",
    """
    SELECT user_id,
           date_format(ts2, 'yyyy-MM-dd HH:mm:ss') AS ts_s,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY ts2
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts2
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS STRING) AS sum_last_hour
    FROM (SELECT user_id, date_trunc('second', ts) AS ts2, value FROM events)
    ORDER BY user_id, ts_s
    """,
    """
    SELECT user_id,
           strftime(ts2, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY ts2
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,4))) OVER (
               PARTITION BY user_id ORDER BY ts2
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
           ) AS STRING) AS sum_last_hour
    FROM (SELECT user_id, date_trunc('second', ts) AS ts2, value FROM events)
    ORDER BY user_id, ts_s
    """,
    doc="W18: event-time RANGE frame with an INTERVAL boundary — the "
        "trailing-hour sliding aggregate per user (count + exact-decimal "
        "sum). Complements w09's numeric RANGE frame: the boundary here is "
        "calendar-typed, evaluated against the ORDER BY timestamp, so "
        "every row gets its own look-back window without self-joins or "
        "explode-per-bucket blowup. ts truncated to seconds in both "
        "dialects (events.ts is ns in the footer; Spark reads µs). "
        "Scale: one shuffle on user_id; frame evaluation is a per-key "
        "sliding two-pointer over the sorted run, O(n) per key.",
)


sql_pair(
    "w19_ratio_to_report",
    """
    SELECT n_name,
           revenue,
           ROUND(revenue * 100.0 / total, 4) AS pct_of_total,
           CAST(rev_rank AS BIGINT) AS rev_rank
    FROM (
      SELECT n.n_name,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
             CAST(sum(sum(CAST(o.o_totalprice AS DECIMAL(18,4))))
                  OVER () AS DOUBLE) AS total,
             RANK() OVER (ORDER BY sum(CAST(o.o_totalprice AS DECIMAL(18,4)))
                          DESC) AS rev_rank
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    ORDER BY n_name
    """,
    """
    SELECT n_name,
           revenue,
           ROUND(revenue * 100.0 / total, 4) AS pct_of_total,
           CAST(rev_rank AS BIGINT) AS rev_rank
    FROM (
      SELECT n.n_name,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS revenue,
             CAST(sum(sum(CAST(o.o_totalprice AS DECIMAL(18,4))))
                  OVER () AS DOUBLE) AS total,
             RANK() OVER (ORDER BY sum(CAST(o.o_totalprice AS DECIMAL(18,4)))
                          DESC) AS rev_rank
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name)
    ORDER BY n_name
    """,
    doc="W19: ratio-to-report — each nation's share of total revenue "
        "(windows OVER aggregates, the share-of-total reporting "
        "shape; the share itself is one IEEE double divide on "
        "decimal-exact sums, rounded). The empty "
        "OVER () runs on the ALREADY-AGGREGATED 25-row frame, not the "
        "fact table — the only safe place for a global window at "
        "100 TB.",
)


_W20_SQL = """
    WITH s AS (
      SELECT user_id, event_id,
             CAST(value AS DOUBLE) AS v,
             COUNT(*) OVER w AS n,
             CAST(SUM(CAST(value AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(28,8))
                      * CAST(value AS DECIMAL(28,8))) OVER w AS DOUBLE) AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
    z AS (
      SELECT user_id, event_id, n,
             CASE WHEN n > 1 AND (n * s2 - s1 * s1) > 0
                  THEN ROUND((v - s1 / n)
                             / sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))), 4)
             END AS zscore
      FROM s)
    SELECT user_id, event_id, zscore,
           CASE WHEN abs(zscore) > 2.0 THEN TRUE ELSE FALSE END AS anomaly
    FROM z WHERE n >= 4 ORDER BY user_id, event_id
"""

sql_pair(
    "w20_rolling_zscore",
    _W20_SQL,
    _W20_SQL,
    doc="W20: rolling z-score anomaly flags — each event's value scored "
        "against the TRAILING 7-event window of the same user (frame "
        "excludes the current row, so the point under test never "
        "contaminates its own baseline). Mean and variance come from "
        "DECIMAL-exact frame sums (w15's trick), so both engines feed "
        "bit-identical doubles into the single final sqrt/divide; "
        "degenerate frames (n<4 or zero variance) are suppressed/NULL. "
        "One window shuffle on user_id; at 100 TB this is the same "
        "partition profile as any per-user session analysis — no global "
        "window anywhere.",
)


_W21_CORE = """
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events WHERE user_id < 20 GROUP BY user_id, date_trunc('hour', ts)),
    bounds AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY user_id),
    spine AS ({spine}),
    joined AS (
      SELECT s.user_id, s.h, {epoch} AS e, o.v
      FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h),
    ctx AS (
      SELECT user_id, h, e, v,
             {last_v}  OVER (PARTITION BY user_id ORDER BY h
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             {last_e}  OVER (PARTITION BY user_id ORDER BY h
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe,
             {first_v} OVER (PARTITION BY user_id ORDER BY h
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             {first_e} OVER (PARTITION BY user_id ORDER BY h
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ne
      FROM joined)
    SELECT user_id, {fmt} AS hour, (v IS NOT NULL) AS observed,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN pv + (nv - pv)
                       * (CAST(e - pe AS DOUBLE) / CAST(ne - pe AS DOUBLE))
                WHEN pv IS NOT NULL THEN pv
                ELSE nv END AS v_interp
    FROM ctx ORDER BY user_id, hour
"""

_W21_SPARK = _W21_CORE.format(
    spine="SELECT user_id, explode(sequence(h0, h1, interval 1 hour)) AS h FROM bounds",
    epoch="unix_timestamp(s.h)",
    last_v="last(v) IGNORE NULLS",
    last_e="last(CASE WHEN v IS NOT NULL THEN e END) IGNORE NULLS",
    first_v="first(v) IGNORE NULLS",
    first_e="first(CASE WHEN v IS NOT NULL THEN e END) IGNORE NULLS",
    fmt="date_format(h, 'yyyy-MM-dd HH:mm:ss')",
)

_W21_DUCK = _W21_CORE.format(
    spine="SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h"
          " FROM bounds",
    epoch="CAST(epoch(s.h) AS BIGINT)",
    last_v="last_value(v IGNORE NULLS)",
    last_e="last_value(CASE WHEN v IS NOT NULL THEN e END IGNORE NULLS)",
    first_v="first_value(v IGNORE NULLS)",
    first_e="first_value(CASE WHEN v IS NOT NULL THEN e END IGNORE NULLS)",
    fmt="strftime(h, '%Y-%m-%d %H:%M:%S')",
)

sql_pair(
    "w21_linear_interpolate",
    _W21_SPARK,
    _W21_DUCK,
    doc="W21: time-series LINEAR interpolation over the gap-filled hourly "
        "spine (w13's shape, upgraded from carry-forward): missing "
        "buckets get pv + (nv-pv)*(e-pe)/(ne-pe) from the nearest "
        "observed neighbors on each side via IGNORE NULLS frame scans; "
        "edges fall back to nearest-value. Identical IEEE expression "
        "order in both engines makes the doubles bit-equal with no "
        "rounding. Two window passes + one join, all partitioned by the "
        "series key — nothing global.",
)


sql_pair(
    "w22_lorenz_curve",
    """
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS r
      FROM orders GROUP BY o_custkey),
    ranked AS (
      SELECT o_custkey, r,
             ROW_NUMBER() OVER (ORDER BY r DESC, o_custkey) AS rk,
             SUM(r) OVER (ORDER BY r DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum_r,
             SUM(r) OVER () AS total_r,
             COUNT(*) OVER () AS n
      FROM rev)
    SELECT CAST(rk AS BIGINT) AS rk, o_custkey,
           CAST(r AS DOUBLE) AS revenue,
           CAST(CAST(cum_r AS DOUBLE) / CAST(total_r AS DOUBLE) AS DOUBLE)
             AS cum_share,
           CAST(ceil(rk * 10.0 / n) AS BIGINT) AS decile
    FROM ranked
    """,
    doc="W22: Lorenz/Pareto concentration curve — per-customer revenue "
        "ranked descending with DECIMAL-exact cumulative share and decile "
        "buckets (the 'top 10% of customers drive X% of revenue' table, "
        "and the data-mix concentration diagnostic for corpus sources). "
        "All sums stay DECIMAL until one final IEEE division per row. The "
        "global rank/cumsum window is a single-partition sort of the "
        "CUSTOMER-level aggregate (already reduced by the partial-agg "
        "groupBy), not of the fact table — the same defense G32 uses "
        "against the global-ntile trap.",
)


sql_pair(
    "w23_peak_detection",
    """
    WITH s AS (
      SELECT user_id, event_id, ts, value,
             LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
             LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_v
      FROM events)
    SELECT user_id, event_id, CAST(value AS DOUBLE) AS value,
           (prev_v IS NOT NULL AND next_v IS NOT NULL
            AND value > prev_v AND value > next_v) AS is_peak,
           (prev_v IS NOT NULL AND next_v IS NOT NULL
            AND value < prev_v AND value < next_v) AS is_trough
    FROM s
    """,
    doc="W23: local peak/trough detection — an event is a peak when it "
        "strictly exceeds both time-ordered neighbours in its user's "
        "series (sequence endpoints are neither): the change-point "
        "primitive under alerting and trend segmentation. One window "
        "shuffle on the series key; strict inequalities + deterministic "
        "(ts, event_id) ordering keep the booleans exact.",
)


sql_pair(
    "w24_drawdown",
    """
    WITH r AS (
      SELECT user_id, event_id, ts, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_peak
      FROM events)
    SELECT user_id,
           CAST(MAX(run_peak - value) AS DOUBLE) AS max_drawdown,
           CAST(MAX(value) AS DOUBLE) AS peak,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM r GROUP BY user_id
    """,
    doc="W24: maximum drawdown — the largest peak-to-trough decline of "
        "each user's value series (running max via an unbounded "
        "preceding frame, then the max gap below it): the risk metric "
        "for any cumulative series (portfolio value, quality score over "
        "a pipeline's history). One window shuffle on the series key + "
        "one partial-agg pass; values are raw column doubles, so "
        "subtraction/max are exact cross-engine with no rounding.",
)


sql_pair(
    "w27_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    pairs AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE dst IS NOT NULL GROUP BY src, dst),
    tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS ns FROM pairs GROUP BY src)
    SELECT p.src, p.dst, p.n,
           ROUND(CAST(p.n AS DOUBLE) / t.ns, 6) AS p_transition
    FROM pairs p JOIN tot t ON p.src = t.src
    ORDER BY p.src, p.dst
    """,
    doc="W27: event-type Markov transition matrix — per user, each event's "
        "successor (LEAD over the session timeline) tallied into "
        "(src, dst) counts and row-normalized transition probabilities: "
        "the path-analysis primitive behind next-action prediction and "
        "funnel-leak triage (W12 counts a FIXED funnel; this measures "
        "every observed transition). One window shuffle on user_id, then "
        "tallies only — at 100 TB the matrix is |types|^2 rows regardless "
        "of data size. Probabilities are one IEEE divide ROUND(6).",
)


def _w28_sql(epoch_us: str, duck: bool) -> str:
    # swv (cents x microsecond-gap sums, ~1e17+ per user) passes 2^53:
    # it reaches DOUBLE via sqlexact.dec2dbl's deterministic hi/lo
    # split, not the native wide-decimal cast (round-6 discipline).
    return f"""
    WITH seq AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS vc,
             {epoch_us} AS t_us,
             lead({epoch_us}) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_us
      FROM events),
    seg AS (
      SELECT user_id, CAST(vc AS DECIMAL(19,0)) * (next_us - t_us) AS wv,
             next_us - t_us AS dt_us
      FROM seq WHERE next_us IS NOT NULL),
    agg AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_segments,
             CAST(SUM(wv) AS DECIMAL(28,0)) AS swv,
             CAST(SUM(dt_us) AS BIGINT) AS span_us
      FROM seg GROUP BY user_id)
    SELECT user_id, n_segments, span_us,
           ROUND({_dec2dbl(duck, "swv")} / span_us, 4) AS twap_cents
    FROM agg ORDER BY user_id
    """


sql_pair(
    "w28_time_weighted_avg",
    _w28_sql("unix_micros(ts)", duck=False),
    _w28_sql("epoch_us(ts)", duck=True),
    doc="W28: time-weighted average (TWAP) per user — each observation "
        "weighted by how long it REMAINED the current value (until the "
        "next event), the correct mean for irregularly-sampled series "
        "where the plain AVG over-weights bursty periods. Weights are "
        "exact integer microsecond gaps x integer cents summed as "
        "DECIMAL (order-independent); the only float op is the final "
        "divide over a dec2dbl-split exact double (round-6: DuckDB's "
        "int128->double cast is not correctly rounded, so the native "
        "cast is banned), ROUND(4). One window shuffle on user_id; "
        "epoch extraction is the unix_micros/epoch_us dialect pair.",
)


def _w30_sql(fmt: str) -> str:
    return f"""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS INT) AS m,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS INT)),
    seq AS (
      SELECT m, cents,
             lag(cents, 1) OVER (ORDER BY m) AS prev_m,
             lag(cents, 12) OVER (ORDER BY m) AS prev_y,
             lag(m, 1) OVER (ORDER BY m) AS m_minus_1,
             lag(m, 12) OVER (ORDER BY m) AS m_minus_12
      FROM monthly)
    SELECT {fmt} AS month, cents,
           -- CAST the delta to DOUBLE before the divide so BOTH engines
           -- compute ROUND(double, 4) → float64: Spark's decimal literal
           -- arithmetic otherwise yields DECIMAL(s=4) while DuckDB's
           -- decimal/BIGINT divide yields DOUBLE — equal values, divergent
           -- driver rendering (the dq08 class).  The delta is exact in
           -- float64 (monthly cents ≪ 2^53 at every oracle scale).
           CASE WHEN m_minus_1 = m - 1
                THEN ROUND(CAST(cents - prev_m AS DOUBLE) * 100 / prev_m, 4)
           END AS mom_pct,
           CASE WHEN m_minus_12 = m - 12
                THEN ROUND(CAST(cents - prev_y AS DOUBLE) * 100 / prev_y, 4)
           END AS yoy_pct
    FROM seq ORDER BY m
    """


_W30_RENDER = (
    "concat(CAST(m // 12 AS STRING), '-', lpad(CAST(m % 12 + 1 AS STRING), 2, '0'))"
)

sql_pair(
    "w30_growth_report",
    _w30_sql(
        "concat(CAST(m div 12 AS STRING), '-', lpad(CAST(m % 12 + 1 AS STRING), 2, '0'))"
    ),
    _w30_sql(_W30_RENDER),
    doc="W30: month-over-month / year-over-year growth report — monthly "
        "exact-cents rollup, LAG(1)/LAG(12) deltas as percentages, with "
        "CALENDAR-GAP GUARDS: the lagged month id must actually be the "
        "adjacent month (m-1) / same month last year (m-12), else the "
        "delta is NULL rather than silently comparing across a gap — the "
        "reporting-correctness detail naive lag-based growth queries get "
        "wrong. Integer month keys (g42's arithmetic); the window runs "
        "on the month-count-sized series; integer div is the div vs // "
        "dialect pair.",
)


def _w31_sql(duck: bool) -> str:
    # a = |n*run - k*t| is a wide-decimal integer (~5e14 at sf0.01,
    # past 2^53 by sf100): rendered and normalized via dec2dbl's
    # deterministic split, never the native decimal->double cast.
    a_dbl = _dec2dbl(duck, "a")
    return f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS t
            FROM daily),
    cum AS (
      SELECT d,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS k,
             CAST(SUM(cents) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS run
      FROM daily),
    dev AS (
      SELECT d, k, run, n, t,
             ABS(CAST(n AS DECIMAL(19,0)) * run
                 - CAST(k AS DECIMAL(19,0)) * t) AS a
      FROM cum CROSS JOIN tot)
    SELECT d AS changepoint_date, k AS day_idx, n AS n_days,
           {a_dbl} AS dev_scaled,
           ROUND({a_dbl} / (CAST(n AS DOUBLE) * t), 8)
             AS dev_normalized,
           ROUND(CAST(run AS DOUBLE) / k / 100, 4) AS pre_mean,
           CASE WHEN k < n
                THEN ROUND(CAST(t - run AS DOUBLE) / (n - k) / 100, 4)
           END AS post_mean
    FROM dev ORDER BY a DESC, k LIMIT 1
    """


sql_pair(
    "w31_cusum_changepoint",
    _w31_sql(duck=False),
    duck_sql=_w31_sql(duck=True),
    doc="W31: CUSUM changepoint detection on the daily-revenue series — "
        "argmax_k |n*cumsum_k - k*total| locates the day where the mean "
        "level shifts (the mean-centered cumulative sum scaled by n to "
        "stay INTEGER: no float accumulates across the series, so the "
        "argmax is exact and tie-broken by earliest day). Pre/post means "
        "quantify the shift; dev_normalized in [0, ~0.25] is the "
        "comparable magnitude. One partial-agg shuffle to days + a "
        "window over the day-count-sized series; the monitoring "
        "primitive behind 'did ingest volume/revenue change character "
        "on a given day' (G39 finds cycles, W26 removes them, this "
        "finds LEVEL SHIFTS).",
)


sql_pair(
    "w32_pareto_concentration",
    """
    WITH s AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM lineitem GROUP BY l_suppkey),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS t FROM s),
    r AS (
      SELECT l_suppkey, cents,
             CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, l_suppkey) AS BIGINT)
               AS k,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, l_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM s)
    SELECT tot.n AS n_suppliers,
           MIN(CASE WHEN cum * 5 >= t * 4 THEN k END) AS k_for_80pct,
           ROUND(CAST(MIN(CASE WHEN cum * 5 >= t * 4 THEN k END) AS DOUBLE)
                 / tot.n, 6) AS frac_suppliers_for_80pct,
           ROUND(CAST(MAX(CASE WHEN k <= CAST(CEIL(tot.n / 10.0) AS BIGINT)
                              THEN cum END) AS DOUBLE) / tot.t, 6)
             AS top_decile_revenue_share
    FROM r CROSS JOIN tot GROUP BY tot.n, tot.t
    """,
    doc="W32: Pareto (80/20) concentration report over supplier revenue — "
        "the smallest k suppliers covering 80% of revenue, that k as a "
        "fraction of the supplier base, and the revenue share of the top "
        "decile. W22 draws the whole Lorenz curve; this answers the two "
        "numbers operators actually quote. The 80% fence is EXACT "
        "rational arithmetic (cum*5 >= total*4 on integer cents — no "
        "float decides a boundary row), the cumulative window runs on "
        "the REDUCED per-supplier aggregate, and only ratios are "
        "ROUND(6) floats. The skew triage for 'how few keys dominate "
        "this table' before picking G33/JX mitigations.",
)


# ---------------------------------------------------------------------------
# w33: merge overlapping intervals (gaps-and-islands)
# ---------------------------------------------------------------------------

_W33_BODY = """
    WITH iv AS (
      SELECT l_suppkey AS supp,
             CAST({startday} AS BIGINT) AS s,
             CAST({startday} + (l_orderkey % 20) + 3 AS BIGINT) AS e
      FROM lineitem),
    flagged AS (
      SELECT supp, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY supp
                    ORDER BY s, e, l_rowno
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -9223372036854775808)
                  THEN 1 ELSE 0 END AS new_island
      FROM (SELECT supp, s, e,
                   ROW_NUMBER() OVER (PARTITION BY supp ORDER BY s, e)
                     AS l_rowno
            FROM iv) t),
    islands AS (
      SELECT supp, s, e,
             CAST(SUM(new_island) OVER (PARTITION BY supp
               ORDER BY s, e, new_island DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS island_id
      FROM flagged),
    merged AS (
      SELECT supp, island_id,
             CAST(MIN(s) AS BIGINT) AS island_start,
             CAST(MAX(e) AS BIGINT) AS island_end,
             CAST(COUNT(*) AS BIGINT) AS n_intervals
      FROM islands GROUP BY supp, island_id)
    SELECT supp AS l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_end - island_start) AS BIGINT) AS covered_days,
           CAST(MAX(island_end - island_start) AS BIGINT) AS longest_island,
           CAST(MAX(n_intervals) AS BIGINT) AS max_merged
    FROM merged GROUP BY supp ORDER BY supp
"""

sql_pair(
    "w33_interval_merge",
    _W33_BODY.format(startday="datediff(l_shipdate, DATE '1995-01-01')"),
    _W33_BODY.format(startday="datediff('day', DATE '1995-01-01', l_shipdate)"),
    doc="W33: merge overlapping intervals (gaps-and-islands) — per "
        "supplier, shipment activity windows [shipdate, shipdate+k] "
        "coalesce into maximal disjoint islands; report island count, "
        "covered days, longest island, and the deepest merge. THE "
        "calendar primitive under SLA uptime, coverage, and utilization "
        "reports that W16's value-streaks can't express (intervals "
        "OVERLAP, they don't abut). Classic two-window shape: an island "
        "opens exactly when a start exceeds the running MAX(end) of all "
        "EARLIER intervals (sorted by start — one window), and a "
        "running SUM of those flags numbers the islands (second window, "
        "same sort, so ONE sort per partition serves both; the flag "
        "joins its own cumulative sum via new_island DESC tie-break so "
        "an opener counts itself). All arithmetic is integer epoch-days "
        "(datediff from a fixed origin — the only dialect split), so "
        "island boundaries are exact. Scale: both windows partition BY "
        "SUPPLIER — the per-key series sorts locally after one hash "
        "shuffle, no global sort, the same shape as W07 at 100 TB; "
        "output is one row per supplier.",
)


# ---------------------------------------------------------------------------
# w34: time-weighted average (TWAP) per event type
# ---------------------------------------------------------------------------

sql_pair(
    "w34_time_weighted_avg",
    """
    WITH seq AS (
      SELECT event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             unix_micros(ts) AS us,
             LEAD(unix_micros(ts)) OVER (
               PARTITION BY event_type
               ORDER BY ts, event_id) AS next_us
      FROM events),
    weighted AS (
      SELECT event_type, cents,
             (next_us - us) DIV 1000000 AS hold_s
      FROM seq WHERE next_us IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(hold_s) AS BIGINT) AS total_hold_s,
           ROUND(CAST(SUM(cents * hold_s) AS DOUBLE)
                 / CAST(SUM(hold_s) AS DOUBLE) / 100, 6) AS twap,
           ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 6) AS plain_avg
    FROM weighted
    GROUP BY event_type ORDER BY event_type
    """,
    duck_sql="""
    WITH seq AS (
      SELECT event_type,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             epoch_us(ts) AS us,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY event_type
               ORDER BY ts, event_id) AS next_us
      FROM events),
    weighted AS (
      SELECT event_type, cents,
             (next_us - us) // 1000000 AS hold_s
      FROM seq WHERE next_us IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(hold_s) AS BIGINT) AS total_hold_s,
           ROUND(CAST(SUM(cents * hold_s) AS DOUBLE)
                 / CAST(SUM(hold_s) AS DOUBLE) / 100, 6) AS twap,
           ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 6) AS plain_avg
    FROM weighted
    GROUP BY event_type ORDER BY event_type
    """,
    doc="W34: time-weighted average price (TWAP) per event type — each "
        "observation is weighted by how long it HELD (lead(ts) - ts, the "
        "last value per series carries no weight), the finance/metering "
        "standard that a plain AVG (also reported, for the contrast) "
        "gets wrong whenever sampling is irregular. Weights are exact "
        "integer seconds from µs epochs (unix_micros vs epoch_us + "
        "integer division — the dialect split), values exact integer "
        "cents, so SUM(cents·hold_s) is exact int64 and only the final "
        "TWAP divides, ROUND(6). Scale: one window (partition by type, "
        "local sort after one hash shuffle) + one partial+final agg — "
        "the W07 shape; at 100 TB the series per key sort locally and "
        "only (type, two int64 partials) cross the second shuffle.",
)


# ---------------------------------------------------------------------------
# w35: Hampel filter — rolling-median/MAD outlier detection
# ---------------------------------------------------------------------------

_W35_BODY = """
    WITH series AS (
      SELECT l_suppkey AS supp, l_orderkey AS ok, l_linenumber AS ln,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
             l_shipdate AS sd
      FROM lineitem WHERE l_suppkey <= 40),
    med AS (
      SELECT supp, ok, ln, cents, sd,
             {med_cents} OVER (
               PARTITION BY supp ORDER BY sd, ok, ln
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS rm
      FROM series),
    dev AS (
      SELECT supp, ok, ln, cents, rm, sd,
             ABS(CAST(cents AS DOUBLE) - rm) AS d
      FROM med),
    mad AS (
      SELECT supp, ok, ln, cents, rm, d,
             {med_d} OVER (
               PARTITION BY supp ORDER BY sd, ok, ln
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS m
      FROM dev)
    SELECT supp,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN d > 3 * 1.4826 * m THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           ROUND(MAX(CASE WHEN m > 0 THEN d / (1.4826 * m) END), 4)
             AS max_robust_z
    FROM mad GROUP BY supp ORDER BY supp
"""

sql_pair(
    "w35_hampel_filter",
    _W35_BODY.format(med_cents="percentile(cents, 0.5)",
                     med_d="percentile(d, 0.5)"),
    _W35_BODY.format(med_cents="median(cents)", med_d="median(d)"),
    doc="W35: Hampel filter — the robust rolling-outlier detector "
        "(rolling median ± 3·1.4826·rolling MAD over a ±3-point frame, "
        "per supplier price series) that survives the exact spikes that "
        "blow up W-family z-scores built on rolling MEAN/STDDEV. Two "
        "stacked windows over the SAME (supp, sd, ok, ln) sort — Spark "
        "plans one Sort + two Window nodes, no re-shuffle — using the "
        "standard SQL decomposition (deviations taken against each "
        "row's own frame median, then the MAD is the frame median of "
        "those deviations; both engines run the identical decomposition "
        "so results match bit-for-bit). Median inputs are exact integer "
        "cents; interpolated halves are exactly representable doubles; "
        "the dialect split is only the spelling (percentile(x,0.5) vs "
        "median(x)). Certified output: per-supplier point/outlier "
        "counts and the max robust z, ROUND(4). Scale: per-key local "
        "sorts after one hash shuffle (W07 shape); the frame is O(1) "
        "per row, so 100 TB streams through without ballooning state.",
)


# ---------------------------------------------------------------------------
# w36: additive seasonal decomposition (centered-MA detrend, exact integers)
# ---------------------------------------------------------------------------

sql_pair(
    "w36_seasonal_decomposition",
    """
    WITH monthly AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             month(o_orderdate) AS moy,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY date_trunc('month', o_orderdate),
                           month(o_orderdate)),
    trended AS (
      SELECT mon, moy, cents,
             CAST(SUM(cents) OVER (
               ORDER BY mon ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
               AS BIGINT) AS win_sum,
             CAST(COUNT(*) OVER (
               ORDER BY mon ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)
               AS BIGINT) AS win_n
      FROM monthly),
    detrended AS (
      SELECT moy, 12 * cents - win_sum AS det12
      FROM trended WHERE win_n = 12),
    seasonal AS (
      SELECT moy,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(det12) AS BIGINT) AS s12
      FROM detrended GROUP BY moy)
    SELECT moy, n_obs,
           ROUND(CAST(s12 AS DOUBLE) / CAST(12 * n_obs AS DOUBLE) / 100, 4)
             AS raw_seasonal,
           ROUND((CAST(s12 AS DOUBLE) / CAST(12 * n_obs AS DOUBLE)
                  - CAST(SUM(CAST(s12 AS DOUBLE) / CAST(12 * n_obs AS DOUBLE))
                         OVER () AS DOUBLE) / 12) / 100, 4)
             AS seasonal_index
    FROM seasonal ORDER BY moy
    """,
    doc="W36: additive seasonal decomposition — classical "
        "decompose-by-centered-moving-average: monthly revenue, a "
        "12-month centered MA trend, per-month-of-year mean deviation, "
        "re-centered so indices sum to zero (the STL-lite every demand/"
        "capacity dashboard runs). Exactness trick: the detrended "
        "series is kept as the INTEGER 12·y − window_sum (multiplying "
        "through by the MA denominator), so the window sum, the "
        "deviation, and the per-month sums are ALL exact int64 — no "
        "double is summed in any order-dependent way; the only float "
        "ops are 12 identical per-month divides plus the 12-term "
        "re-centering window (deterministic: one row per month, ORDER "
        "BY-free OVER () sums 12 values both engines produce "
        "identically... ordered identically by the single-partition "
        "window). ROUND(4). Scale: the corpus pass is the monthly "
        "partial+final agg; everything after runs on ~80 rows. One SQL "
        "text, both dialects.",
)


# ---------------------------------------------------------------------------
# w37: maximum drawdown over the cumulative value series
# ---------------------------------------------------------------------------

sql_pair(
    "w37_max_drawdown",
    """
    WITH series AS (
      SELECT event_type, ts, event_id,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS BIGINT)
               AS cum
      FROM events),
    peaks AS (
      SELECT event_type, cum,
             CAST(MAX(cum) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS BIGINT)
               AS peak
      FROM series)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(CAST(MAX(peak - cum) AS DOUBLE) / 100, 4) AS max_drawdown,
           ROUND(CAST(MAX(peak) AS DOUBLE) / 100, 4) AS max_peak,
           ROUND(CAST(MAX(CASE WHEN peak > 0
                                THEN CAST(10000 * (peak - cum) AS DOUBLE)
                                     / CAST(peak AS DOUBLE)
                                ELSE 0.0 END) AS DOUBLE) / 100, 4)
             AS max_drawdown_pct
    FROM peaks GROUP BY event_type ORDER BY event_type
    """,
    doc="W37: maximum drawdown — the largest peak-to-trough fall of the "
        "cumulative value series per event type (running SUM, running "
        "MAX of that sum, max gap): the risk summary every trading/"
        "capacity dashboard pairs with W34's TWAP, and a W-family shape "
        "no other query exercises (two STACKED cumulative windows over "
        "one sort). All series arithmetic is exact integer cents — "
        "running sum, running peak, gap, and their maxima are int64; "
        "the percent form divides once per row inside MAX (identical "
        "IEEE operands both engines), final ROUND(4). Scale: per-key "
        "local sort after one hash shuffle (W07's shape), one partial+"
        "final agg on top; nothing global.",
)


# ---------------------------------------------------------------------------
# g59: Theil-Sen robust trend (median of pairwise slopes)
# ---------------------------------------------------------------------------

sql_pair(
    "g59_theil_sen",
    """
    WITH monthly AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY date_trunc('month', o_orderdate))
                  AS BIGINT) AS t,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY date_trunc('month', o_orderdate)),
    slopes AS (
      SELECT CAST(b.cents - a.cents AS DOUBLE)
             / CAST(b.t - a.t AS DOUBLE) AS slope
      FROM monthly a JOIN monthly b ON a.t < b.t)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY slope)
                      AS DOUBLE) / 100, 4) AS theil_sen_slope,
           ROUND(CAST(MIN(slope) AS DOUBLE) / 100, 4) AS min_slope,
           ROUND(CAST(MAX(slope) AS DOUBLE) / 100, 4) AS max_slope
    FROM slopes
    """,
    doc="G59: Theil-Sen estimator — the median of all pairwise slopes of "
        "the monthly revenue series: the robust trend line (29.3% "
        "breakdown point) that OLS (G20's regr_slope) loses to a single "
        "outlier month, and the sibling C32's Holt forecast consults "
        "for trend sanity. Slopes are single IEEE divisions of exact "
        "integer cent deltas by integer month gaps (identical operands "
        "both engines); the median is PERCENTILE_DISC — an ACTUAL slope "
        "value, no interpolation float (G43/G47 discipline). The O(T²) "
        "pair lattice is over the ~80-row monthly PROFILE, never the "
        "corpus: the monthly rollup is the one 100 TB pass ('aggregate "
        "down, then iterate on the profile', C32's shape). ROUND(4). "
        "One SQL text, both dialects.",
)


# ---------------------------------------------------------------------------
# w38: rolling 12-month volume-revenue correlation (regime-change monitor)
# ---------------------------------------------------------------------------

def _w38_sql(duck: bool) -> str:
    # Round-6 hardening (g45's discipline): the covariance terms
    # n*S - S*S are computed as EXACT wide integers, then reach DOUBLE
    # once through dec2dbl's deterministic hi/lo split — the native
    # wide-decimal cast (not correctly rounded in DuckDB) is gone.
    from pydatalake_gen2_spark.queries.sqlexact import wide_mul as _wm

    num = _dec2dbl(duck, f"{_wm(duck, 'n', 'sxy')} - {_wm(duck, 'sx', 'sy')}")
    den_x = _dec2dbl(duck, f"{_wm(duck, 'n', 'sxx')} - {_wm(duck, 'sx', 'sx')}")
    den_y = _dec2dbl(duck, f"{_wm(duck, 'n', 'syy')} - {_wm(duck, 'sy', 'sy')}")
    return f"""
    WITH monthly AS (
      SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mk,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS DECIMAL(38,0)) AS y
      FROM orders GROUP BY 1),
    win AS (
      SELECT mk, x, y,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(x) OVER w AS BIGINT) AS sx,
             CAST(SUM(y) OVER w AS DECIMAL(38,0)) AS sy,
             CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) OVER w
                  AS DECIMAL(38,0)) AS syy,
             CAST(SUM(x * y) OVER w AS DECIMAL(38,0)) AS sxy
      FROM monthly
      WINDOW w AS (ORDER BY mk ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
    SELECT mk AS month_key, x AS n_orders,
           ROUND({num}
                 / SQRT({den_x}
                        * {den_y}), 6)
             AS rolling_corr_12m
    FROM win
    WHERE n = 12
      AND (n * sxx - sx * sx) > 0
      AND (n * syy - sy * sy) > 0
    ORDER BY month_key
    """


sql_pair(
    "w38_rolling_correlation",
    _w38_sql(duck=False),
    duck_sql=_w38_sql(duck=True),
    doc="W38: rolling 12-month Pearson correlation between monthly order "
        "VOLUME and monthly REVENUE — the regime-change monitor (a stable "
        "business holds corr near 1; a drop flags a mix shift: more "
        "orders, less money). G45 is the static matrix, G39 the static "
        "lag autocorrelation; this is the windowed time-local view. All "
        "five window moments (Sx, Sy, Sxx, Syy, Sxy) are EXACT integer/"
        "DECIMAL(38,0) frame sums (y^2 forced through DECIMAL(19) so "
        "DuckDB runs hugeint, g50's overflow discipline; widths sized "
        "so n*Syy and Sy^2 stay under 38 digits through ~sf100), and "
        "each month's corr is ONE final IEEE expression over "
        "dec2dbl-split exact covariances, ROUND(6) (round-6: no native "
        "wide-decimal->double cast survives; g39/g45's discipline). "
        "Scale: one partial+final monthly rollup, then a window over "
        "the ~80-row profile. One SQL text in both dialects.",
)
