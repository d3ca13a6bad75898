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

from pydatalake_gen2_spark.registry import sql_pair

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
