"""Extended scalar/aggregate surface (round-1 widening pass).

Bitwise ops, trig, binary encodings, boolean/bit aggregates, LISTAGG,
PIVOT/UNPIVOT, IGNORE NULLS windows, LATERAL subqueries, inline VALUES.
All tier-H dialect pairs; JVM-side whole-stage codegen on the Spark side
(no Python in any of these plans).

The reference has no function surface at all (it is a storage REST client,
client.py:1-631); these extend SURVEY.md §2B.8/2B.4 per the declared
engine contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_gen2_spark.registry import register, sql_pair

# Spark: `^` is bitwise xor, shiftleft/shiftright builtins.
# DuckDB: xor(), `<<` / `>>` operators.
sql_pair(
    "f26_bitwise",
    """
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS band,
           l_orderkey | 7 AS bor,
           l_orderkey ^ CAST(l_linenumber AS BIGINT) AS bxor,
           CAST(shiftleft(l_linenumber, 3) AS BIGINT) AS shl,
           shiftright(l_orderkey, 2) AS shr
    FROM lineitem
    """,
    duck_sql="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS band,
           l_orderkey | 7 AS bor,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS bxor,
           CAST(l_linenumber AS BIGINT) << 3 AS shl,
           l_orderkey >> 2 AS shr
    FROM lineitem
    """,
)

# ROUND(…,4): sin/cos/atan2 go through each engine's libm; the last ulp is
# not contractual, 1e-4 is.
sql_pair(
    "f27_trig",
    """
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 4) AS sin_d,
           round(cos(l_tax), 4) AS cos_t,
           round(tan(l_discount), 4) AS tan_d,
           round(atan2(l_discount, 0.5), 4) AS at2,
           round(degrees(l_discount), 4) AS deg,
           round(radians(l_quantity), 4) AS rad,
           round(pi(), 6) AS pi_c
    FROM lineitem
    """,
)

sql_pair(
    "f29_encode",
    """
    SELECT doc_id,
           base64(lang) AS b64,
           lower(hex(lang)) AS hx,
           ascii(lang) AS a0,
           char(ascii(lang) + 1) AS nxt,
           left(text, 8) AS l8,
           right(text, 8) AS r8,
           CAST(instr(text, 'a') AS BIGINT) AS pos_a
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           to_base64(lang::BLOB) AS b64,
           lower(hex(lang)) AS hx,
           ascii(lang) AS a0,
           chr(ascii(lang) + 1) AS nxt,
           left(text, 8) AS l8,
           right(text, 8) AS r8,
           CAST(position('a' in text) AS BIGINT) AS pos_a
    FROM documents
    """,
)

sql_pair(
    "g14_bool_bit_aggs",
    """
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_pos,
           bool_or(l_discount > 0.05) AS any_disc,
           bit_and(CAST(l_linenumber AS BIGINT)) AS nband,
           bit_or(CAST(l_linenumber AS BIGINT)) AS nbor,
           bit_xor(l_orderkey) AS kxor
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)

# Spark 4 LISTAGG ↔ DuckDB string_agg(… ORDER BY …).
sql_pair(
    "g15_listagg",
    """
    SELECT n_regionkey,
           listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    duck_sql="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)

# Spark SQL PIVOT ↔ portable FILTERed aggregation (the relational meaning).
sql_pair(
    "g16_pivot",
    """
    SELECT * FROM (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity AS DECIMAL(18,4)) AS q
      FROM lineitem
    )
    PIVOT (CAST(sum(q) AS DOUBLE) FOR l_linestatus IN ('O' AS qty_o, 'F' AS qty_f, 'P' AS qty_p))
    ORDER BY l_returnflag
    """,
    duck_sql="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_linestatus = 'P') AS DOUBLE) AS qty_p
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)

# Spark stack() generator (UNPIVOT) ↔ UNION ALL expansion.
sql_pair(
    "g17_unpivot_stack",
    """
    SELECT l_orderkey, l_linenumber, kind, ROUND(val, 4) AS val FROM (
      SELECT l_orderkey, l_linenumber,
             stack(2, 'price', l_extendedprice, 'disc', l_discount) AS (kind, val)
      FROM lineitem
    )
    """,
    duck_sql="""
    SELECT l_orderkey, l_linenumber, 'price' AS kind, ROUND(l_extendedprice, 4) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc' AS kind, ROUND(l_discount, 4) AS val FROM lineitem
    """,
)

# GROUP BY ALL (Spark 3.4+ / DuckDB shared spelling): groups by every
# non-aggregate SELECT expression — the "stop repeating the key list"
# surface users reach for first in ad-hoc work. One text, both dialects.
sql_pair(
    "g68_group_by_all",
    """
    SELECT l_returnflag, l_linestatus, year(l_shipdate) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    """,
)

# Native UNPIVOT clause (Spark 3.4+) ↔ UNION ALL expansion — the stock
# SQL spelling of what g17 expresses via stack(). INCLUDE NULLS pins the
# semantics to the oracle's row-preserving expansion (the default
# EXCLUDE NULLS drops rows whose measure is NULL — a real trap, but not
# one these non-null fixture columns can exercise).
sql_pair(
    "g69_unpivot_native",
    """
    SELECT l_orderkey, l_linenumber, kind, ROUND(val, 4) AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             l_extendedprice AS price, l_discount AS disc
      FROM lineitem
    )
    UNPIVOT INCLUDE NULLS (val FOR kind IN (price, disc))
    """,
    duck_sql="""
    SELECT l_orderkey, l_linenumber, 'price' AS kind, ROUND(l_extendedprice, 4) AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc' AS kind, ROUND(l_discount, 4) AS val FROM lineitem
    """,
)

# Ordered string aggregation (r9): Spark 4.0's ANSI `listagg(x, sep)
# WITHIN GROUP (ORDER BY ...)` == DuckDB's `string_agg(x, sep ORDER BY
# ...)`. The ORDER BY key is the table's verified-unique o_orderkey
# (fuzz rule R11: a non-unique order would make the concatenation
# engine-dependent). Scale: an ordered aggregate cannot partial-combine
# freely — Spark sorts within each group post-shuffle, so the cost is
# one groupBy shuffle + per-group sort, same envelope as F58's ordered
# collect_list; output strings stay bounded because the group keys
# (status) are low-cardinality and the payload is a short code.
sql_pair(
    "g70_listagg_within_group",
    """
    SELECT o_orderstatus AS k,
           listagg(o_orderpriority, '|') WITHIN GROUP (ORDER BY o_orderkey)
             AS prio_seq,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey <= 400
    GROUP BY o_orderstatus
    """,
    duck_sql="""
    SELECT o_orderstatus AS k,
           string_agg(o_orderpriority, '|' ORDER BY o_orderkey) AS prio_seq,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey <= 400
    GROUP BY o_orderstatus
    """,
)

# Lateral column alias (Spark 3.4+): a SELECT-list alias is referencable
# by LATER expressions in the same SELECT — the ad-hoc "stop repeating
# the formula" surface. DuckDB supports the same reuse, but the oracle
# spells the expression out so the pair certifies Spark's RESOLUTION
# (x binds to the alias) against ground truth rather than two engines'
# possibly-matching shortcuts. NOTE (documented, not tested here): when
# an alias SHADOWS a real column, Spark resolves the REAL column first
# — lateral aliases have lower precedence — so the pair uses fresh
# names only; shadowing is a dialect trap, not a portable surface.
sql_pair(
    "p24_lateral_column_alias",
    """
    SELECT o_orderkey AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           cents % 97 AS bucket,
           CASE WHEN bucket < 32 THEN 'lo' WHEN bucket < 65 THEN 'mid'
                ELSE 'hi' END AS band
    FROM orders
    """,
    duck_sql="""
    SELECT o_orderkey AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(round(o_totalprice * 100) AS BIGINT) % 97 AS bucket,
           CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) % 97 < 32
                  THEN 'lo'
                WHEN CAST(round(o_totalprice * 100) AS BIGINT) % 97 < 65
                  THEN 'mid'
                ELSE 'hi' END AS band
    FROM orders
    """,
)

# IGNORE NULLS placement differs: Spark `lag(x) IGNORE NULLS OVER …`,
# DuckDB `lag(x IGNORE NULLS) OVER …`.
sql_pair(
    "w10_ignore_nulls",
    """
    WITH e AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN ROUND(value, 4) END AS v
      FROM events
    )
    SELECT event_id, user_id,
           lag(v) IGNORE NULLS
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_click_v,
           first_value(v) IGNORE NULLS
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_click_v
    FROM e
    """,
    duck_sql="""
    WITH e AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'click' THEN ROUND(value, 4) END AS v
      FROM events
    )
    SELECT event_id, user_id,
           lag(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_click_v,
           first_value(v IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_click_v
    FROM e
    """,
)

# Correlated LATERAL subquery (decorrelated to a join by both planners).
sql_pair(
    "j13_lateral",
    """
    SELECT o.o_orderkey, l.big_items
    FROM orders o,
         LATERAL (SELECT CAST(count(*) AS BIGINT) AS big_items
                  FROM lineitem li
                  WHERE li.l_orderkey = o.o_orderkey AND li.l_quantity > 30) l
    """,
)

sql_pair(
    "u06_values_inline",
    """
    SELECT v.id, v.tag, r.r_name
    FROM VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma') AS v(id, tag)
    JOIN region r ON r.r_regionkey = v.id
    ORDER BY v.id
    """,
    duck_sql="""
    SELECT v.id, v.tag, r.r_name
    FROM (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma')) v(id, tag)
    JOIN region r ON r.r_regionkey = v.id
    ORDER BY v.id
    """,
)


# Higher-order array functions (lambda expressions on both engines).
# DuckDB list_reduce seeds with the first element, Spark aggregate() takes
# an explicit zero — pair sum-of-lengths via transform+list_sum instead.
# Array results are rendered via array_join/array_to_string: the driver's
# canonicalizer hashes scalar cells only (VERDICT.md round 1: unhashable
# list), so every gate-facing column must be scalar.
sql_pair(
    "f30_higher_order",
    """
    WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           array_join(transform(slice(toks, 1, 5), x -> upper(x)), '|') AS up5,
           array_join(filter(toks, x -> length(x) > 4), '|') AS long_toks,
           CAST(aggregate(toks, 0L, (a, x) -> a + length(x)) AS BIGINT) AS total_len,
           exists(toks, x -> x = 'the') AS has_the,
           forall(toks, x -> length(x) < 40) AS all_short
    FROM t
    """,
    duck_sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           COALESCE(array_to_string(list_transform(toks[1:5], x -> upper(x)), '|'), '') AS up5,
           COALESCE(array_to_string(list_filter(toks, x -> length(x) > 4), '|'), '') AS long_toks,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_len,
           list_has_any(toks, ['the']) AS has_the,
           length(list_filter(toks, x -> length(x) >= 40)) = 0 AS all_short
    FROM t
    """,
)

# Array set algebra; list_intersect is unordered in DuckDB → sort both.
sql_pair(
    "f31_array_setops",
    """
    SELECT l_orderkey, l_linenumber,
           array_join(transform(sort_array(array_intersect(sequence(1, l_linenumber + 2),
                                                           sequence(2, 5))),
                                x -> CAST(x AS STRING)), '|') AS inter,
           array_join(transform(sort_array(array_union(sequence(1, l_linenumber),
                                                       sequence(4, 5))),
                                x -> CAST(x AS STRING)), '|') AS uni,
           array_join(transform(sort_array(array_except(sequence(1, 5),
                                                        sequence(1, l_linenumber))),
                                x -> CAST(x AS STRING)), '|') AS diff,
           arrays_overlap(sequence(1, l_linenumber), sequence(3, 4)) AS ovl
    FROM lineitem
    """,
    duck_sql="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(array_to_string(list_transform(list_sort(list_intersect(generate_series(1, l_linenumber + 2),
                                                                   generate_series(2, 5))),
                                          x -> CAST(x AS VARCHAR)), '|'), '') AS inter,
           COALESCE(array_to_string(list_transform(list_sort(list_distinct(list_concat(generate_series(1, l_linenumber),
                                                                              generate_series(4, 5)))),
                                          x -> CAST(x AS VARCHAR)), '|'), '') AS uni,
           COALESCE(array_to_string(list_transform(list_sort(list_filter(generate_series(1, 5),
                                 x -> NOT list_contains(generate_series(1, l_linenumber), x))),
                                          x -> CAST(x AS VARCHAR)), '|'), '') AS diff,
           list_has_any(generate_series(1, l_linenumber), generate_series(3, 4)) AS ovl
    FROM lineitem
    """,
)

sql_pair(
    "f32_regexp_extract_all",
    """
    SELECT doc_id, array_join(regexp_extract_all(text, '(th[a-z]+)', 1), '|') AS th_words,
           CAST(size(regexp_extract_all(text, '([a-z]{7,})', 1)) AS BIGINT) AS n_long
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id, COALESCE(array_to_string(regexp_extract_all(text, 'th[a-z]+'), '|'), '') AS th_words,
           CAST(length(regexp_extract_all(text, '[a-z]{7,}')) AS BIGINT) AS n_long
    FROM documents
    """,
)


# GROUP BY ALL / ORDER BY ALL (identical modern-SQL sugar on both engines).
sql_pair(
    "f33_group_order_all",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
    """,
)

# Error-safe casts/division: TRY_CAST identical; try_divide ↔ NULLIF guard.
sql_pair(
    "f34_try_cast",
    """
    SELECT doc_id,
           TRY_CAST(lang AS INT) AS lang_as_int,
           TRY_CAST(CAST(n_chars AS STRING) AS INT) AS n_rt,
           try_divide(CAST(n_chars AS DOUBLE), CAST(doc_id AS DOUBLE)) AS per_id
    FROM documents
    """,
    duck_sql="""
    SELECT doc_id,
           TRY_CAST(lang AS INT) AS lang_as_int,
           TRY_CAST(CAST(n_chars AS VARCHAR) AS INT) AS n_rt,
           CAST(n_chars AS DOUBLE) / NULLIF(CAST(doc_id AS DOUBLE), 0.0) AS per_id
    FROM documents
    """,
)

# Datetime constructors and epoch round-trips.
sql_pair(
    "f35_datetime_construct",
    """
    SELECT event_id,
           make_date(year(ts), month(ts), day(ts)) AS d,
           unix_timestamp(ts) AS epoch_s,
           date_format(timestamp_seconds(unix_timestamp(ts)), 'yyyy-MM-dd HH:mm:ss') AS rt,
           last_day(CAST(ts AS DATE)) AS eom,
           add_months(CAST(ts AS DATE), 2) AS plus2m
    FROM events
    """,
    duck_sql="""
    SELECT event_id,
           make_date(CAST(year(ts) AS BIGINT), CAST(month(ts) AS BIGINT),
                     CAST(day(ts) AS BIGINT)) AS d,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           strftime(to_timestamp(epoch(ts)), '%Y-%m-%d %H:%M:%S') AS rt,
           last_day(CAST(ts AS DATE)) AS eom,
           CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
    FROM events
    """,
)


# URL parsing: Spark's parse_url (Hive-compatible) vs a DuckDB regexp
# decomposition of the same synthesized URL. A data-cleaning staple
# (host-level dedup, query-param stripping).
sql_pair(
    "f37_url_parse",
    """
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/docs/', CAST(doc_id AS STRING),
                    '?lang=', lang, '&v=2') AS url
      FROM documents)
    SELECT doc_id, url,
           parse_url(url, 'HOST') AS host,
           parse_url(url, 'PATH') AS path,
           parse_url(url, 'QUERY') AS query,
           parse_url(url, 'QUERY', 'lang') AS lang_param
    FROM u
    """,
    duck_sql="""
    WITH u AS (
      SELECT doc_id,
             concat('https://', source, '.example.com/docs/', CAST(doc_id AS VARCHAR),
                    '?lang=', lang, '&v=2') AS url
      FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
)


@register(
    "f38_bitwise",
    duck_sql="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS b_and,
           CAST(o_orderkey | 4096 AS BIGINT) AS b_or,
           CAST(xor(o_orderkey, 170) AS BIGINT) AS b_xor,
           CAST(o_orderkey << 3 AS BIGINT) AS b_shl,
           CAST(o_orderkey >> 2 AS BIGINT) AS b_shr,
           CAST(bit_count(o_orderkey) AS BIGINT) AS b_pop
    FROM orders WHERE o_orderkey < 1000
    """,
)
def f38_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: and/or/xor/shifts/popcount (JVM-side)."""
    k = F.col("o_orderkey")
    return (
        spark.table("orders")
        .filter(k < 1000)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).cast("bigint").alias("b_and"),
            k.bitwiseOR(F.lit(4096)).cast("bigint").alias("b_or"),
            k.bitwiseXOR(F.lit(170)).cast("bigint").alias("b_xor"),
            F.shiftleft(k, 3).cast("bigint").alias("b_shl"),
            F.shiftright(k, 2).cast("bigint").alias("b_shr"),
            F.bit_count(k).cast("bigint").alias("b_pop"),
        )
    )


@register(
    "f39_higher_order_arrays",
    duck_sql="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(list_filter(toks, w -> len(w) > 4)) AS BIGINT) AS n_long,
           len(list_filter(toks, w -> w = 'data')) > 0 AS has_data,
           CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS total_chars,
           array_to_string(list_transform(toks[1:3], w -> upper(w)), ' ') AS head_upper
    FROM t
    """,
)
def f39_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as declared surface: filter / exists
    / aggregate / transform + slice (all JVM lambda expressions)."""
    toks = F.split(F.lower(F.col("text")), " ")
    return spark.table("documents").select(
        "doc_id",
        F.size(F.filter(toks, lambda w: F.length(w) > 4)).cast("bigint").alias("n_long"),
        F.exists(toks, lambda w: w == F.lit("data")).alias("has_data"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda s, w: s + F.length(w)
        ).alias("total_chars"),
        F.array_join(
            F.transform(F.slice(toks, 1, 3), lambda w: F.upper(w)), " "
        ).alias("head_upper"),
    )


@register(
    "f40_string_distance",
    duck_sql="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev_name_type,
           CAST(levenshtein(substring(p_name, 1, 8), substring(p_type, 1, 8)) AS BIGINT)
               AS lev_prefix8
    FROM part WHERE p_partkey < 500
    """,
)
def f40_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance scalar surface (levenshtein — identical DP
    definition on both engines)."""
    return (
        spark.table("part")
        .filter(F.col("p_partkey") < 500)
        .select(
            "p_partkey",
            F.levenshtein("p_name", "p_type").cast("bigint").alias("lev_name_type"),
            F.levenshtein(
                F.substring("p_name", 1, 8), F.substring("p_type", 1, 8)
            ).cast("bigint").alias("lev_prefix8"),
        )
    )


sql_pair(
    "f41_map_functions",
    """
    SELECT n_nationkey,
           array_join(map_keys(m), ',') AS ks,
           array_join(transform(map_values(m), v -> CAST(v AS STRING)), ',') AS vs,
           CAST(element_at(m, 'nat') AS BIGINT) AS v_nat,
           CAST(cardinality(m) AS BIGINT) AS n_entries
    FROM (SELECT n_nationkey, map('nat', n_nationkey, 'reg', n_regionkey) AS m
          FROM nation)
    ORDER BY n_nationkey
    """,
    """
    SELECT n_nationkey,
           array_to_string(map_keys(m), ',') AS ks,
           array_to_string(list_transform(map_values(m), v -> CAST(v AS VARCHAR)), ',') AS vs,
           CAST(map_extract(m, 'nat')[1] AS BIGINT) AS v_nat,
           CAST(cardinality(m) AS BIGINT) AS n_entries
    FROM (SELECT n_nationkey, map(['nat','reg'], [n_nationkey, n_regionkey]) AS m
          FROM nation)
    ORDER BY n_nationkey
    """,
    doc="MAP column surface: construct / map_keys / map_values / element "
        "access / cardinality (Spark map() ↔ DuckDB map(list,list); both "
        "preserve insertion order). Feeds the events.props-style "
        "semi-structured columns at scale — maps stay JVM-columnar, no "
        "Python touches them.",
)


sql_pair(
    "f42_struct_json",
    """
    SELECT n_nationkey,
           s.name AS s_name,
           CAST(s.region AS BIGINT) AS s_region,
           to_json(s) AS js
    FROM (SELECT n_nationkey,
                 named_struct('name', n_name, 'region', n_regionkey) AS s
          FROM nation)
    ORDER BY n_nationkey
    """,
    """
    SELECT n_nationkey,
           s.name AS s_name,
           CAST(s.region AS BIGINT) AS s_region,
           to_json(s) AS js
    FROM (SELECT n_nationkey,
                 struct_pack(name := n_name, region := n_regionkey) AS s
          FROM nation)
    ORDER BY n_nationkey
    """,
    doc="STRUCT column surface: named construction, dotted field access, "
        "JSON serialization (field order = declaration order in both "
        "engines; compact JSON rendering agrees byte-for-byte).",
)


sql_pair(
    "f43_format_split_index",
    """
    SELECT p_partkey,
           format_string('%s#%05d', p_brand, p_partkey) AS tag,
           substring_index(p_name, ' ', 2) AS first2,
           substring_index(p_name, ' ', -1) AS last1
    FROM part WHERE p_partkey < 300 ORDER BY p_partkey
    """,
    """
    SELECT p_partkey,
           printf('%s#%05d', p_brand, p_partkey) AS tag,
           array_to_string(string_split(p_name, ' ')[1:2], ' ') AS first2,
           string_split(p_name, ' ')[-1] AS last1
    FROM part WHERE p_partkey < 300 ORDER BY p_partkey
    """,
    doc="printf-style formatting (format_string ↔ printf) and delimited "
        "field extraction (substring_index ↔ list-slice composition, "
        "incl. negative index = from the end).",
)


sql_pair(
    "f44_timestamp_shift",
    """
    SELECT event_id,
           date_format(timestampadd(MINUTE, CAST(floor(value) AS INT), ts),
                       'yyyy-MM-dd HH:mm:ss') AS plus_val_min,
           date_format(timestampadd(HOUR, -2, ts),
                       'yyyy-MM-dd HH:mm:ss') AS minus_2h,
           CAST(floor((unix_micros(ts) - unix_micros(date_trunc('DAY', ts)))
                      / 3600000000.0) AS BIGINT) AS hours_into_day
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
    """
    SELECT event_id,
           strftime(ts + to_minutes(CAST(floor(value) AS INT)),
                    '%Y-%m-%d %H:%M:%S') AS plus_val_min,
           strftime(ts - to_hours(2), '%Y-%m-%d %H:%M:%S') AS minus_2h,
           CAST(floor((epoch_us(ts) - epoch_us(date_trunc('day', ts)))
                      / 3600000000.0) AS BIGINT) AS hours_into_day
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
    doc="Variable-amount timestamp shifting (timestampadd ↔ to_minutes/"
        "to_hours interval builders) and epoch-exact sub-day bucketing — "
        "second-granularity render per SURVEY determinism rule 3.",
)


sql_pair(
    "f45_map_hof",
    """
    SELECT n_nationkey,
           array_join(transform(map_entries(transform_keys(m, (k, v) -> upper(k))),
                                e -> concat(e.key, '=', CAST(e.value AS STRING))),
                      ',') AS upper_entries,
           array_join(transform(map_entries(transform_values(m, (k, v) -> v * 10)),
                                e -> concat(e.key, '=', CAST(e.value AS STRING))),
                      ',') AS scaled_entries,
           array_join(transform(map_entries(map_zip_with(m, m, (k, v1, v2) -> v1 + v2)),
                                e -> concat(e.key, '=', CAST(e.value AS STRING))),
                      ',') AS doubled_entries
    FROM (SELECT n_nationkey,
                 map('nat', n_nationkey, 'reg', n_regionkey) AS m
          FROM nation)
    ORDER BY n_nationkey
    """,
    """
    SELECT n_nationkey,
           concat('NAT=', n_nationkey, ',REG=', n_regionkey) AS upper_entries,
           concat('nat=', n_nationkey * 10, ',reg=', n_regionkey * 10) AS scaled_entries,
           concat('nat=', n_nationkey * 2, ',reg=', n_regionkey * 2) AS doubled_entries
    FROM nation ORDER BY n_nationkey
    """,
    doc="MAP higher-order functions: transform_keys / transform_values / "
        "map_zip_with, rendered as insertion-ordered 'k=v' strings. The "
        "oracle recomputes the expected rendering independently from the "
        "base columns (DuckDB has no map HOFs) — same-semantics, different "
        "derivation. All three HOFs run inside whole-stage codegen; no "
        "Python, no shuffle.",
)


sql_pair(
    "f46_regexp_extract_all",
    """
    SELECT p_partkey,
           array_join(regexp_extract_all(p_name, '([a-z]+)', 1), ',') AS words,
           CAST(size(regexp_extract_all(p_name, '([aeiou])', 1)) AS BIGINT) AS n_vowels,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head
    FROM part WHERE p_partkey < 400 ORDER BY p_partkey
    """,
    """
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '([a-z]+)', 1), ',') AS words,
           CAST(len(regexp_extract_all(p_name, '([aeiou])', 1)) AS BIGINT) AS n_vowels,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head
    FROM part WHERE p_partkey < 400 ORDER BY p_partkey
    """,
    doc="regexp_extract_all / regexp_extract scalar surface — identical "
        "RE2-class pattern semantics on both engines; array output "
        "stringified per the round-1 hash-stability rule.",
)


sql_pair(
    "f47_str_to_map",
    """
    SELECT p_partkey,
           CAST(element_at(m, 'size') AS BIGINT) AS v_size,
           element_at(m, 'brand') AS v_brand,
           array_join(map_keys(m), ',') AS ks
    FROM (SELECT p_partkey,
                 str_to_map(concat('brand:', p_brand, ',size:', p_size,
                                   ',type:', p_type),
                            ',', ':') AS m
          FROM part)
    WHERE p_partkey < 400 ORDER BY p_partkey
    """,
    """
    SELECT p_partkey,
           CAST(p_size AS BIGINT) AS v_size,
           p_brand AS v_brand,
           'brand,size,type' AS ks
    FROM part WHERE p_partkey < 400 ORDER BY p_partkey
    """,
    doc="str_to_map: delimited-KV string -> MAP (the events.props-style "
        "config-string decoder). Oracle recomputes expected values from the "
        "base columns the string was built from — independent derivation of "
        "the same contract. Insertion order preserved, pure codegen.",
)


sql_pair(
    "f48_posexplode",
    """
    SELECT p_partkey, pos, word
    FROM part
    LATERAL VIEW posexplode(split(p_name, ' ')) t AS pos, word
    WHERE p_partkey < 400
    ORDER BY p_partkey, pos
    """,
    """
    SELECT p_partkey,
           unnest(range(0, len(string_split(p_name, ' ')))) AS pos,
           unnest(string_split(p_name, ' ')) AS word
    FROM part WHERE p_partkey < 400
    ORDER BY p_partkey, pos
    """,
    doc="posexplode (ordinal-preserving UNNEST) ↔ DuckDB zipped parallel "
        "unnest. Generator runs inside the scan stage (no shuffle); ordinal "
        "lets downstream ops reconstruct token order without a window.",
)


sql_pair(
    "f49_nested_roundtrip",
    """
    WITH nested AS (
      SELECT l_orderkey,
             sort_array(collect_list(named_struct(
               'ln', l_linenumber, 'qty', CAST(l_quantity AS DOUBLE)))) AS items
      FROM lineitem GROUP BY l_orderkey)
    SELECT l_orderkey,
           item.ln AS l_linenumber,
           item.qty AS l_quantity,
           CAST(size(items) AS INT) AS n_items
    FROM nested LATERAL VIEW explode(items) t AS item
    ORDER BY l_orderkey, l_linenumber
    """,
    """
    WITH nested AS (
      SELECT l_orderkey,
             list_sort(list(struct_pack(
               ln := l_linenumber, qty := CAST(l_quantity AS DOUBLE)))) AS items
      FROM lineitem GROUP BY l_orderkey)
    SELECT l_orderkey, ln AS l_linenumber, qty AS l_quantity, n_items
    FROM (
      SELECT l_orderkey,
             unnest(items, recursive := true),
             CAST(len(items) AS INT) AS n_items
      FROM nested)
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="F49: nest-then-flatten round-trip — collect lineitems into a "
        "sorted ARRAY<STRUCT> per order (the document/denormalized data "
        "model), then explode back to rows carrying the per-order array "
        "size. Exercises named_struct construction, struct-aware "
        "sort_array ordering, and LATERAL VIEW explode ↔ DuckDB's "
        "recursive unnest. Scale: one shuffle on the order key; array "
        "size is bounded by lines-per-order, so no skew blowup. The "
        "pattern behind writing nested parquet for point-lookup serving "
        "layers.",
)


sql_pair(
    "f50_split_part_overlay",
    """
    SELECT doc_id,
           split_part(text, ' ', 2)          AS second_word,
           split_part(text, ' ', -1)         AS last_word,
           overlay(text PLACING '###' FROM 5 FOR 3) AS patched,
           locate('a', text)                 AS first_a
    FROM documents ORDER BY doc_id
    """,
    """
    SELECT doc_id,
           split_part(text, ' ', 2)          AS second_word,
           split_part(text, ' ', -1)         AS last_word,
           substr(text, 1, 4) || '###' || substr(text, 8) AS patched,
           strpos(text, 'a')                 AS first_a
    FROM documents ORDER BY doc_id
    """,
    doc="F50: positional string surgery — split_part (incl. negative "
        "index, identical in both engines), ANSI OVERLAY (DuckDB lacks "
        "it; oracle composes substr||replacement||substr), and "
        "locate<->strpos. Row-local, codegen'd, zero shuffle.",
)


sql_pair(
    "f51_try_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           try_divide(l_extendedprice, l_discount)            AS div_maybe_null,
           try_add(CAST(l_quantity AS BIGINT), 9223372036854775807) AS add_overflow,
           try_element_at(split(l_returnflag, ','), 5)        AS oob_elem,
           try_to_number(l_returnflag, '999')                 AS not_a_number
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0.0 THEN NULL
                ELSE l_extendedprice / l_discount END         AS div_maybe_null,
           CAST(NULL AS BIGINT)                               AS add_overflow,
           CAST(NULL AS VARCHAR)                              AS oob_elem,
           CAST(NULL AS DECIMAL(3,0))                         AS not_a_number
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="F51: error-safe arithmetic (ANSI mode without the blast radius) "
        "— try_divide(x, 0)->NULL, try_add on guaranteed bigint overflow"
        "->NULL, try_element_at past the end->NULL, try_to_number on "
        "unparseable input->NULL. The oracle states the expected "
        "NULL/value outcomes directly (quantities are integral, every "
        "flag is non-numeric, so outcomes are total functions of the "
        "data). At 100 TB this surface is what keeps ONE malformed row "
        "from killing a 6-hour job while still surfacing as a NULL "
        "tally in the G28/G31 audit metrics.",
)


sql_pair(
    "f52_mask",
    """
    SELECT c_custkey,
           mask(c_name)                      AS masked_default,
           mask(c_name, 'Q', 'q', '9', '_') AS masked_custom
    FROM customer ORDER BY c_custkey
    """,
    """
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked_default,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             c_name, '[A-Z]', 'Q', 'g'), '[a-z]', 'q', 'g'), '[0-9]', '9', 'g'),
             '[^Qq9]', '_', 'g')
             AS masked_custom
    FROM customer ORDER BY c_custkey
    """,
    doc="F52: PII masking scalar (mask(): upper->X, lower->x, digit->n, "
        "other kept; custom replacement set incl. the other-char class) — "
        "the column-masking primitive for serving de-identified copies of "
        "a table. The oracle composes it from global regexp passes. "
        "Row-local, codegen'd; at 100 TB masking rides the scan like any "
        "projection.",
)


@register(
    "f54_utf8_validation",
    duck_sql="""
    WITH b AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
               + strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1 AS b1,
             128 | ((
               (strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 16
               + strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1) & 63)
               AS b2
      FROM documents),
    v AS (
      SELECT doc_id, b1, b2,
             -- b2 is always a continuation byte (0x80-0xBF), so the pair
             -- is valid UTF-8 iff b1 is a 2-byte lead (0xC2-0xDF)
             (b1 >= 194 AND b1 <= 223) AS valid,
             -- U+FFFD substitution: one replacement per MAXIMAL invalid
             -- subpart (Unicode TR on best practice); chars after repair:
             CASE
               WHEN b1 >= 194 AND b1 <= 223 THEN 1  -- valid 2-byte char
               WHEN b1 = 224 THEN CASE WHEN b2 >= 160 THEN 1 ELSE 2 END
               WHEN b1 >= 225 AND b1 <= 236 THEN 1  -- truncated 3-byte
               WHEN b1 = 237 THEN CASE WHEN b2 < 160 THEN 1 ELSE 2 END
               WHEN b1 >= 238 AND b1 <= 239 THEN 1
               WHEN b1 = 240 THEN CASE WHEN b2 >= 144 THEN 1 ELSE 2 END
               WHEN b1 >= 241 AND b1 <= 243 THEN 1  -- truncated 4-byte
               WHEN b1 = 244 THEN CASE WHEN b2 < 144 THEN 1 ELSE 2 END
               ELSE 2  -- ascii+stray, stray+stray, or invalid byte + stray
             END AS repaired_chars
      FROM b)
    SELECT doc_id, CAST(b1 AS BIGINT) AS b1, CAST(b2 AS BIGINT) AS b2,
           valid, NOT valid AS try_null,
           CAST(repaired_chars AS INT) AS repaired_chars
    FROM v ORDER BY doc_id
    """,
    doc="F54: UTF-8 validation surface (Spark 4 is_valid_utf8 / "
        "try_validate_utf8 / make_valid_utf8) over deterministic 2-byte "
        "sequences built from md5(text) with the second byte forced into "
        "the continuation range — the byte-level ingest guard a corpus "
        "pipeline runs before text ops. The oracle computes validity and "
        "the U+FFFD repair length from the UTF-8 state machine "
        "arithmetically (one replacement per maximal invalid subpart), "
        "so a divergence in Spark's substitution granularity would break "
        "the hash. Row-local expressions, no shuffle.",
)
def f54_utf8_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH b AS (
          SELECT doc_id,
                 conv(substring(md5(text), 1, 2), 16, 10) AS h1,
                 conv(substring(md5(text), 3, 2), 16, 10) AS h2
          FROM documents),
        raw AS (
          SELECT doc_id,
                 CAST(h1 AS BIGINT) AS b1,
                 CAST(128 + (CAST(h2 AS BIGINT) % 64) AS BIGINT) AS b2
          FROM b),
        s AS (
          SELECT doc_id, b1, b2,
                 CAST(unhex(concat(lpad(hex(b1), 2, '0'),
                                   lpad(hex(b2), 2, '0'))) AS STRING) AS txt
          FROM raw)
        SELECT doc_id, b1, b2,
               is_valid_utf8(txt) AS valid,
               try_validate_utf8(txt) IS NULL AS try_null,
               length(make_valid_utf8(txt)) AS repaired_chars
        FROM s ORDER BY doc_id
        """
    )


@register(
    "f55_aes_roundtrip",
    duck_sql="""
    SELECT doc_id,
           TRUE AS roundtrip_ok,
           CAST(16 * (length(text) // 16 + 1) AS BIGINT) AS ct_len,
           CAST(length(text) AS BIGINT) AS pt_len
    FROM documents ORDER BY doc_id
    """,
    doc="F55: column-level encryption surface (aes_encrypt/aes_decrypt, "
        "ECB for determinism — GCM's random IV is the production mode "
        "but can't hash cross-engine): the at-rest field-protection "
        "primitive for PII columns (t07/f52's masking siblings when the "
        "value must be RECOVERABLE). The oracle states the PKCS#7 "
        "ciphertext length law (16·⌊len/16+1⌋ — padding always added) "
        "and the decrypt∘encrypt identity; a wrong key, mode, or "
        "padding breaks the hash. Row-local codegen expressions, no "
        "shuffle. ASCII fixture text makes byte length = char length.",
)
def f55_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH e AS (
          SELECT doc_id, text,
                 aes_encrypt(text, '0123456789abcdef', 'ECB') AS ct
          FROM documents)
        SELECT doc_id,
               CAST(aes_decrypt(ct, '0123456789abcdef', 'ECB') AS STRING)
                 = text AS roundtrip_ok,
               CAST(length(ct) AS BIGINT) AS ct_len,
               CAST(length(text) AS BIGINT) AS pt_len
        FROM e ORDER BY doc_id
        """
    )


@register(
    "f56_xpath_extract",
    duck_sql="""
    SELECT o_orderkey,
           o_orderpriority AS prio,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(2 AS BIGINT) AS n_tags
    FROM orders ORDER BY o_orderkey
    """,
    doc="F56: XPath extraction (xpath_string / xpath_long / xpath) over "
        "XML documents CONSTRUCTED from table columns — the query-side "
        "complement of S25's XML source round-trip (read whole docs "
        "there, extract fields here). Because the XML is built from the "
        "same row, the oracle states each extracted field as the origin "
        "column: any escaping, path, or type-coercion error in the "
        "extraction breaks the hash. Row-local; at 100 TB this is the "
        "shred step for XML feeds, with the same pushdown profile as "
        "f23's JSON path extraction.",
)
def f56_xpath_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        WITH x AS (
          SELECT o_orderkey,
                 concat('<order><prio>', o_orderpriority,
                        '</prio><cents>',
                        CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING),
                        '</cents></order>') AS xml
          FROM orders)
        SELECT o_orderkey,
               xpath_string(xml, '/order/prio') AS prio,
               xpath_long(xml, '/order/cents') AS cents,
               CAST(size(xpath(xml, '/order/*')) AS BIGINT) AS n_tags
        FROM x ORDER BY o_orderkey
        """
    )


@register(
    "f57_convert_timezone",
    duck_sql="""
    WITH e AS (
      -- normalize to a NAIVE UTC wall-clock regardless of the parquet
      -- encoding: driver fixtures store naive timestamps (no-op cast);
      -- Spark-written scale fixtures store isAdjustedToUTC instants that
      -- DuckDB reads as TIMESTAMPTZ, where timezone()'s overload flips
      -- direction — the UTC-pinned session cast recovers the same naive
      -- value (caught by the sf1 oracle sweep)
      SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT event_id,
           strftime(timezone('America/New_York', timezone('UTC', ts)),
                    '%Y-%m-%d %H:%M:%S') AS ny_local,
           strftime(timezone('Asia/Kolkata', timezone('UTC', ts)),
                    '%Y-%m-%d %H:%M:%S') AS kolkata_local,
           CAST((epoch_us(timezone('America/New_York', timezone('UTC', ts)))
                 - epoch_us(ts)) / 3600000000.0 AS DOUBLE) AS ny_offset_h
    FROM e ORDER BY event_id
    """,
    doc="F57: IANA timezone conversion (convert_timezone, Spark 3.4+/4) — "
        "UTC event times rendered as New York (DST-observing) and "
        "Kolkata (half-hour offset) wall-clock, plus the derived UTC "
        "offset. Both engines resolve the SAME tz database rules, so the "
        "hash certifies agreement on historical DST transitions; the "
        "oracle pins the interpretation explicitly (naive→UTC→zone) so "
        "neither session's default timezone participates. Row-local "
        "expressions; the multi-region-serving normalization step.",
)
def f57_convert_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT event_id,
               date_format(convert_timezone('UTC', 'America/New_York', ts),
                           'yyyy-MM-dd HH:mm:ss') AS ny_local,
               date_format(convert_timezone('UTC', 'Asia/Kolkata', ts),
                           'yyyy-MM-dd HH:mm:ss') AS kolkata_local,
               CAST((unix_micros(CAST(convert_timezone('UTC', 'America/New_York', ts)
                          AS TIMESTAMP))
                     - unix_micros(ts)) / 3600000000.0 AS DOUBLE) AS ny_offset_h
        FROM events ORDER BY event_id
        """
    )


sql_pair(
    "f58_array_sort_comparator",
    """
    SELECT l_orderkey,
           concat_ws(',', transform(
             array_sort(
               collect_list(named_struct('q', l_quantity, 'ln', l_linenumber)),
               (l, r) -> CASE WHEN l.q > r.q THEN -1 WHEN l.q < r.q THEN 1
                              WHEN l.ln < r.ln THEN -1 WHEN l.ln > r.ln THEN 1
                              ELSE 0 END),
             s -> CAST(s.ln AS STRING))) AS lines_by_qty_desc
    FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    """
    SELECT l_orderkey,
           array_to_string(list(CAST(l_linenumber AS STRING)
                                ORDER BY l_quantity DESC, l_linenumber), ',')
             AS lines_by_qty_desc
    FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    doc="F58: array_sort with a CUSTOM COMPARATOR lambda — each order's "
        "lines reordered by (quantity DESC, linenumber ASC) inside the "
        "array, then projected to a string. The comparator is a TOTAL "
        "order over a unique key set, which is exactly what makes the "
        "result independent of collect_list's nondeterministic arrival "
        "order — the sorted-list-agg rule (§2B rule 4) generalized to "
        "arbitrary orderings. DuckDB states the same thing declaratively "
        "(list(... ORDER BY ...)); row-local, rides G10's agg shape.",
)


@register(
    "f59_schema_of_json",
    duck_sql="""
    SELECT 'STRUCT<k: BIGINT>' AS inferred_schema,
           CAST(count(*) AS BIGINT) AS n_parsed,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k
    FROM events
    """,
)
def f59_schema_of_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F59: JSON SCHEMA INFERENCE — schema_of_json derives the DDL of the
    props payload from a sample row at PLAN TIME, and that inferred
    schema immediately drives a typed from_json extraction over the
    whole column: the ingest-time workflow for undocumented JSON feeds
    (F23 extracts known paths; F24 parses a declared schema; this
    DISCOVERS the schema). The oracle states the expected inference
    verbatim — a drifted inferred type breaks the hash — and re-derives
    the typed sum through its own JSON reader."""
    sample = spark.table("events").select("props").first()["props"]
    inferred = (
        spark.range(1).select(F.schema_of_json(F.lit(sample)).alias("s")).first()["s"]
    )
    return (
        spark.table("events")
        .select(F.from_json("props", inferred).alias("j"))
        .agg(
            F.lit(inferred).alias("inferred_schema"),
            F.count(F.lit(1)).cast("bigint").alias("n_parsed"),
            F.sum(F.col("j.k")).cast("bigint").alias("sum_k"),
        )
    )


# ---------------------------------------------------------------------------
# f60: collation-aware grouping (Spark 4 COLLATE)
# ---------------------------------------------------------------------------

@register(
    "f60_collated_groupby",
    duck_sql="""
    WITH mixed AS (
      SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg
      FROM customer),
    norm AS (
      SELECT lower(seg) AS seg_norm, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM mixed GROUP BY lower(seg)),
    tot AS (
      SELECT CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_raw_distinct
      FROM mixed)
    SELECT seg_norm, n_rows,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_ci_groups,
           n_raw_distinct
    FROM norm CROSS JOIN tot
    ORDER BY seg_norm
    """,
    doc="F60: collation-aware grouping — Spark 4's COLLATE UTF8_LCASE "
        "makes case-insensitivity a property of the TYPE, so GROUP BY, "
        "DISTINCT, and joins honor it engine-side with NO lower() "
        "rewrite (the rewrite defeats dictionary encoding and any "
        "future collated index; collated grouping keeps the raw bytes "
        "and compares case-insensitively). A deterministic mixed-case "
        "segment column (upper for even keys, lower for odd) groups "
        "under the collation to 5 groups where raw DISTINCT sees 10 — "
        "both counts certified; the displayed group key is min(lower()) "
        "for a collation-independent representative. The oracle states "
        "the same semantics via lower() — equivalence IS the claim. "
        "Partial+final agg, one scan; collation compares are codegen'd "
        "row-local ops at any scale.",
)
def f60_collated_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    mixed = spark.table("customer").select(
        F.when(F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment"))
        .otherwise(F.lower("c_mktsegment"))
        .alias("seg")
    )
    norm = (
        mixed.groupBy(F.expr("seg COLLATE UTF8_LCASE").alias("segc"))
        .agg(
            F.min(F.lower("seg")).alias("seg_norm"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .select("seg_norm", "n_rows")
    )
    tot = mixed.agg(
        F.countDistinct("seg").cast("bigint").alias("n_raw_distinct")
    )
    from pyspark.sql.window import Window

    return (
        norm.withColumn(
            "n_ci_groups", F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint")
        )
        .crossJoin(F.broadcast(tot))
        .select("seg_norm", "n_rows", "n_ci_groups", "n_raw_distinct")
        .orderBy("seg_norm")
    )


# ---------------------------------------------------------------------------
# f61/f62: OUTER generators — explode_outer / posexplode_outer (r7 verdict #4)
# ---------------------------------------------------------------------------
# The classic silently-dropped-rows bug: inner explode() EMITS NOTHING for an
# empty or NULL array, so a per-document metric join built on it loses those
# documents without a trace. The OUTER variants keep the parent row with NULL
# generator output. Fixtures have no native array column with empties, so the
# pair PLANTS them deterministically: doc_id % 11 == 0 -> NULL array,
# doc_id % 7 == 0 -> empty array, else the token split. DuckDB has no outer
# unnest; the oracle is the textbook LEFT JOIN against the unnested child.

_F61_CASE_SPARK = """
      CASE WHEN doc_id % 11 = 0 THEN CAST(NULL AS ARRAY<STRING>)
           WHEN doc_id % 7 = 0 THEN array()
           ELSE split(text, ' ') END
"""

_F61_CASE_DUCK = """
      CASE WHEN doc_id % 11 = 0 THEN CAST(NULL AS VARCHAR[])
           WHEN doc_id % 7 = 0 THEN CAST([] AS VARCHAR[])
           ELSE string_split(text, ' ') END
"""

sql_pair(
    "f61_explode_outer",
    f"""
    WITH t AS (
      SELECT doc_id, {_F61_CASE_SPARK} AS toks
      FROM documents WHERE doc_id < 300)
    SELECT doc_id, tok
    FROM t LATERAL VIEW OUTER explode(toks) x AS tok
    ORDER BY doc_id, tok
    """,
    duck_sql=f"""
    WITH t AS (
      SELECT doc_id, {_F61_CASE_DUCK} AS toks
      FROM documents WHERE doc_id < 300),
    u AS (SELECT doc_id, unnest(toks) AS tok FROM t)
    SELECT t.doc_id, u.tok
    FROM t LEFT JOIN u ON t.doc_id = u.doc_id
    ORDER BY t.doc_id, tok
    """,
    doc="F61: explode_outer / LATERAL VIEW OUTER — parent rows with an "
        "empty or NULL array survive with tok = NULL instead of vanishing "
        "(the most common real-user array bug; inner f18_explode drops "
        "them). Oracle: DuckDB has no outer unnest, so the LEFT JOIN "
        "against the unnested child states the semantics from first "
        "principles. Generator runs inside the scan stage (no shuffle); "
        "outer-ness adds no cost at any scale.",
)

sql_pair(
    "f62_posexplode_outer",
    f"""
    WITH t AS (
      SELECT doc_id, {_F61_CASE_SPARK} AS toks
      FROM documents WHERE doc_id < 300)
    SELECT doc_id, CAST(pos AS BIGINT) AS pos, tok,
           CAST(count(*) OVER (PARTITION BY CAST(1 AS INT)) AS BIGINT)
             AS n_rows_total
    FROM t LATERAL VIEW OUTER posexplode(toks) x AS pos, tok
    ORDER BY doc_id, pos, tok
    """,
    duck_sql=f"""
    WITH t AS (
      SELECT doc_id, {_F61_CASE_DUCK} AS toks
      FROM documents WHERE doc_id < 300),
    u AS (SELECT doc_id,
                 CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos,
                 unnest(toks) AS tok
          FROM t)
    SELECT t.doc_id, u.pos, u.tok,
           CAST(count(*) OVER () AS BIGINT) AS n_rows_total
    FROM t LEFT JOIN u ON t.doc_id = u.doc_id
    ORDER BY t.doc_id, pos, tok
    """,
    doc="F62: posexplode_outer — ordinal-preserving OUTER generator; "
        "empty/NULL-array parents surface once with (pos, tok) = (NULL, "
        "NULL). The windowed total-row-count column certifies the exact "
        "row-preservation accounting cross-engine (every planted empty "
        "and NULL parent contributes exactly one row). Same LEFT-JOIN-"
        "unnest oracle as f61 with 0-based subscripts.",
)
