"""Projection / filter / predicates — SURVEY.md §2B.2 (P01-P08).

All expressed so Catalyst pushes predicates and prunes columns down to the
parquet scan (verified via explain in tests: PushedFilters + ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pydatalake_gen2_spark.registry import register, sql_pair


@register(
    "p01_project_rename",
    duck_sql="""
    SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
    FROM customer
    """,
)
def p01_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning: ReadSchema should list exactly these 3 columns."""
    return spark.table("customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@register(
    "p02_computed_column",
    duck_sql="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS disc_price,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,4)) AS DOUBLE) AS charge
    FROM lineitem
    """,
)
def p02_computed_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money math in exact DECIMAL: source values carry ≤2 decimals, so the
    factors cast unambiguously to DECIMAL(18,4) and the product is exact —
    ROUNDing the double product instead would sit exactly on the half
    boundary (6-decimal true values) and diverge between engines."""
    li = spark.table("lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc_f = (1 - F.col("l_discount")).cast("decimal(18,4)")
    both_f = ((1 - F.col("l_discount")) * (1 + F.col("l_tax"))).cast("decimal(18,4)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (price * disc_f).cast("double").alias("disc_price"),
        (price * both_f).cast("double").alias("charge"),
    )


@register(
    "p03_filter_boolean",
    duck_sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30 AND l_discount >= 0.05)
       OR (NOT l_returnflag = 'N' AND l_tax < 0.02)
    """,
)
def p03_filter_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison + AND/OR/NOT; whole predicate lands in PushedFilters."""
    li = spark.table("lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") >= 0.05)) | (
        (~(F.col("l_returnflag") == "N")) & (F.col("l_tax") < 0.02)
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


sql_pair(
    "p04_in_between_like",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000 AND 150000
      AND o_orderpriority LIKE '%-%'
    """,
)

# Null-safe equality: Spark `<=>` ↔ ANSI IS NOT DISTINCT FROM (both engines
# accept the ANSI form; nulls are planted via a non-matching LEFT JOIN).
sql_pair(
    "p05_null_handling",
    """
    SELECT c.c_custkey,
           o.o_orderkey IS NULL AS no_order,
           o.o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f_nullsafe
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
    """,
)

sql_pair(
    "p06_conditional_exprs",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_pending,
           GREATEST(o_totalprice, 100000.0) AS at_least_100k,
           LEAST(CAST(o_orderkey AS BIGINT), o_custkey) AS min_key
    FROM orders
    """,
)

sql_pair(
    "p07_cast_matrix",
    """
    SELECT l_orderkey,
           CAST(l_quantity AS INT) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS STRING) AS price_str,
           CAST(CAST(l_shipdate AS DATE) AS STRING) AS ship_str,
           CAST('42' AS BIGINT) AS s2i,
           CAST('1996-03-14' AS DATE) AS s2d
    FROM lineitem
    """,
    duck_sql="""
    SELECT l_orderkey,
           CAST(l_quantity AS INT) AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS line_dbl,
           CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS VARCHAR) AS price_str,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
           CAST('42' AS BIGINT) AS s2i,
           CAST('1996-03-14' AS DATE) AS s2d
    FROM lineitem
    """,
)

sql_pair(
    "p08_distinct",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    """,
)


sql_pair(
    "p09_variant_json",
    """
    SELECT event_id,
           variant_get(parse_json(props), '$.k', 'int') AS k,
           CAST(is_variant_null(try_parse_json(props)) AS BOOLEAN) AS junk
    FROM events WHERE event_id < 1000 ORDER BY event_id
    """,
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           (json_extract(props, '$') IS NULL) AS junk
    FROM events WHERE event_id < 1000 ORDER BY event_id
    """,
    doc="VARIANT semi-structured type (Spark 4): parse_json into the "
        "binary variant encoding, typed path extraction via variant_get "
        "— the modern replacement for per-query get_json_object string "
        "re-parsing (variant parses once, extracts many times, and "
        "columnar-shreds at the scan at 100 TB). Oracle: DuckDB JSON "
        "path extraction over the same column.",
)


@register(
    "p10_nested_pruning",
    duck_sql="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS price
    FROM orders
    """,
    doc="P10: nested-schema pruning — orders rewritten as parquet with a "
        "3-field STRUCT column, read back projecting ONE leaf "
        "(info.o_totalprice). Catalyst prunes the ReadSchema to "
        "struct<o_totalprice> (plan-gated in tests/test_plans.py: the "
        "sibling leaves never leave the footer), so deeply nested "
        "100 TB event schemas pay only for the leaves a query touches — "
        "the property that makes the denormalized/nested layout (f49) "
        "viable at scale. Oracle is the flat projection.",
)
def p10_nested_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pydatalake_gen2_spark.queries.scans import _tmp, _write_once
    from pydatalake_gen2_spark.tables import load_table

    path = _tmp("p10_nested", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    nested = orders.select(
        "o_orderkey",
        F.struct("o_orderstatus", "o_totalprice", "o_orderpriority").alias("info"),
    )
    _write_once(path, lambda: nested.write.mode("overwrite").parquet(path))
    back = spark.read.parquet(path)
    return back.select(
        "o_orderkey",
        F.col("info.o_totalprice").cast("decimal(18,4)").cast("double").alias("price"),
    )


# ---------------------------------------------------------------------------
# p11: collation-aware string semantics (Spark 4 COLLATE)
# ---------------------------------------------------------------------------

sql_pair(
    "p11_collation",
    """
    WITH m AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS x
      FROM documents)
    SELECT count(DISTINCT x COLLATE UTF8_LCASE)                 AS n_ci,
           count(DISTINCT x)                                    AS n_cs,
           count(CASE WHEN x COLLATE UTF8_LCASE = 'EN' THEN 1 END) AS n_en_ci,
           count(CASE WHEN x = 'EN' THEN 1 END)                 AS n_en_cs
    FROM m
    """,
    """
    WITH m AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS x
      FROM documents)
    SELECT count(DISTINCT lower(x))                             AS n_ci,
           count(DISTINCT x)                                    AS n_cs,
           count(CASE WHEN lower(x) = 'en' THEN 1 END)          AS n_en_ci,
           count(CASE WHEN x = 'EN' THEN 1 END)                 AS n_en_cs
    FROM m
    """,
    doc="P11: collation-aware comparison/distinct (Spark 4 COLLATE "
        "UTF8_LCASE) over a deterministically case-mixed column — "
        "case-insensitive semantics expressed AT THE TYPE LEVEL, so "
        "Catalyst keeps pushdown/codegen, vs the lower()-wrapping the "
        "oracle must use. At 100 TB the difference matters: collated "
        "equality joins/groupBys hash the collation key directly instead "
        "of materializing a lowered copy of every string.",
)


# ---------------------------------------------------------------------------
# p12: SQL pipe syntax (Spark 4 |> operators)
# ---------------------------------------------------------------------------

sql_pair(
    "p12_sql_pipe",
    """
    FROM lineitem
    |> WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    |> EXTEND CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS rev
    |> AGGREGATE SUM(rev) AS revenue, COUNT(*) AS n GROUP BY l_returnflag
    |> ORDER BY l_returnflag
    """,
    """
    SELECT l_returnflag,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="P12: the same filtered-aggregate expressed in Spark 4's SQL pipe "
        "syntax (|> WHERE / EXTEND / AGGREGATE / ORDER BY) vs the oracle's "
        "classic form — pipe stages compile to the identical Catalyst plan "
        "(linear, declaration-ordered), proving the new surface is pure "
        "syntax: no plan or performance difference to re-audit.",
)


@register(
    "p13_parameterized_sql",
    duck_sql="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_totalprice > 1000.0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def p13_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: named parameter markers (spark.sql(..., args={...}), Spark
    3.4+/4) — the injection-safe way to template the same query over
    changing thresholds/dates; parameters bind as typed literals in the
    parser, so Catalyst constant-folds and pushes them down exactly like
    inline literals (same plan, same PushedFilters). The oracle is the
    equivalent literal SQL."""
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice > :floor
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"cutoff": "2000-01-01 00:00:00", "floor": 1000.0},
    )


sql_pair(
    "f53_try_variant",
    """
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN concat('{"k": ', CAST(doc_id AS STRING), '}')
                  WHEN doc_id % 3 = 1 THEN 'not json at all'
                  ELSE concat('[', CAST(doc_id AS STRING), ']') END AS payload
      FROM documents)
    SELECT doc_id,
           try_parse_json(payload) IS NULL               AS unparseable,
           variant_get(try_parse_json(payload), '$.k', 'bigint') AS k
    FROM raw ORDER BY doc_id
    """,
    """
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN '{"k": ' || CAST(doc_id AS VARCHAR) || '}'
                  WHEN doc_id % 3 = 1 THEN 'not json at all'
                  ELSE '[' || CAST(doc_id AS VARCHAR) || ']' END AS payload
      FROM documents)
    SELECT doc_id,
           (doc_id % 3 = 1)                              AS unparseable,
           CASE WHEN doc_id % 3 = 0 THEN doc_id END      AS k
    FROM raw ORDER BY doc_id
    """,
    doc="F53: error-tolerant VARIANT ingestion — try_parse_json turns "
        "producer garbage into NULL instead of a job abort (the f51/s22 "
        "discipline applied to the VARIANT type, p09's strict sibling); "
        "typed variant_get paths return NULL when the shape mismatches "
        "(array payload, missing key). The oracle states each branch's "
        "expected outcome from the payload constructor itself.",
)


# ---------------------------------------------------------------------------
# p14: VARIANT lateral explode (Spark 4 variant_explode)
# ---------------------------------------------------------------------------


@register(
    "p14_variant_explode",
    duck_sql="""
    SELECT event_id, CAST(0 AS BIGINT) AS pos,
           CAST(user_id AS VARCHAR) AS vjson FROM events
    UNION ALL
    SELECT event_id, 1, CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT event_id, 2, concat('"', event_type, '"') FROM events
    """,
    doc="P14: variant_explode — lateral expansion of a VARIANT array into "
        "(pos, value) rows, the row-generator face of the VARIANT surface "
        "(p09 path extraction, f53 error-tolerant parse). The exploded "
        "values round-trip through to_json; the oracle states each "
        "position's canonical JSON text directly (DuckDB's json_each "
        "needs the json extension, unavailable offline). Row-local "
        "generation — no exchange; at 100 TB this is the shred step for "
        "semi-structured ingestion.",
)
def p14_variant_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT e.event_id, CAST(p.pos AS BIGINT) AS pos,
               to_json(p.value) AS vjson
        FROM events e,
        LATERAL variant_explode(parse_json(concat(
            '[', CAST(e.user_id AS STRING), ',',
            CAST(CAST(round(e.value * 100) AS BIGINT) AS STRING),
            ',"', e.event_type, '"]'))) p
        """
    )


@register(
    "p15_sql_variables",
    duck_sql="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_quantity < 30.0
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="P15: SQL session variables (Spark 4 DECLARE VARIABLE / SET VAR) "
        "— procedural parameterization INSIDE the SQL dialect, the "
        "scripting-style sibling of P13's client-side parameter markers. "
        "Variables resolve to typed literals at analysis time, so they "
        "constant-fold and push into the scan exactly like inline "
        "constants (same PushedFilters); the oracle is the literal form. "
        "Re-declared idempotently (DECLARE OR REPLACE) so repeated runs "
        "in one session are safe.",
)
def p15_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "DECLARE OR REPLACE VARIABLE ship_cutoff TIMESTAMP "
        "DEFAULT TIMESTAMP '1995-01-01'"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE qty_cap DOUBLE DEFAULT 25.0")
    spark.sql("SET VAR ship_cutoff = TIMESTAMP '1996-01-01'")
    spark.sql("SET VAR qty_cap = 30.0")
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                 AS revenue
        FROM lineitem
        WHERE l_shipdate >= ship_cutoff AND l_quantity < qty_cap
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@register(
    "p17_identifier_clause",
    duck_sql="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def p17_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17: IDENTIFIER(:param) table templating (Spark 4) — the table name
    arrives as a BOUND PARAMETER, not string concatenation: the analyzer
    resolves it as an identifier (injection-safe, P13's sibling for
    names, not values). The templated query must plan and optimize
    exactly like the literal form — same scan, same pushdown — which the
    hash certifies against the oracle running the literal table name."""
    return spark.sql(
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n "
        "FROM IDENTIFIER(:tab) GROUP BY event_type ORDER BY event_type",
        args={"tab": "events"},
    )


sql_pair(
    "p19_lateral_column_alias",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             AS disc_cents,
           disc_cents + CAST(round(l_tax * disc_cents) AS BIGINT)
             AS final_cents,
           final_cents > 200000 AS is_big
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
    doc="P19: LATERAL COLUMN ALIASES — a SELECT item referencing an alias "
        "defined earlier in the SAME select list (disc_cents feeds "
        "final_cents feeds is_big), the ergonomic layering that otherwise "
        "forces nested subqueries; both engines resolve the chain "
        "identically and Catalyst still inlines everything into one "
        "projection (no extra plan node, codegen intact). The chain is "
        "integer cents end-to-end: re-ROUNDing an already-rounded money "
        "double lands on non-representable .5 ties that Spark "
        "(shortest-repr HALF_UP) and DuckDB (binary) resolve differently "
        "— found live on this very pair.",
)


@register(
    "p20_sql_scripting",
    duck_sql="""
    SELECT CAST(count(DISTINCT o_orderstatus) AS INT) AS n_statuses,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    """,
)
def p20_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P20: SQL SCRIPTING (Spark 4 BEGIN/DECLARE/FOR/SET blocks) — an
    in-dialect procedural program: a FOR loop iterates a grouped query's
    result rows, accumulating into declared variables, and the block's
    final SELECT is the result. Completes the procedural ladder (P13
    parameters → P15 session variables → P20 control flow); each
    statement inside the block still plans through Catalyst, so the
    loop body's aggregates keep their partial-agg shapes. The oracle
    states the accumulated result closed-form."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE n INT DEFAULT 0;
          FOR r AS (SELECT o_orderstatus AS s,
                           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                                AS BIGINT) AS c
                    FROM orders GROUP BY o_orderstatus ORDER BY s) DO
            SET total = total + r.c;
            SET n = n + 1;
          END FOR;
          SELECT n AS n_statuses, total AS total_cents;
        END
        """
    )


sql_pair(
    "p22_star_except",
    """
    SELECT * EXCEPT (o_orderpriority, o_orderdate)
    FROM orders WHERE o_orderkey < 100
    """,
    """
    SELECT * EXCLUDE (o_orderpriority, o_orderdate)
    FROM orders WHERE o_orderkey < 100
    """,
    doc="P22: star-except projection (Spark `* EXCEPT (...)` vs DuckDB "
        "`* EXCLUDE (...)` — same feature, different keyword): 'all "
        "columns but these', the ergonomic form wide-table pipelines "
        "(drop the embedding, keep 200 metadata columns) actually write. "
        "Resolves at ANALYSIS time to an explicit projection, so column "
        "pruning and scan ReadSchema behave exactly as if each kept "
        "column were listed — nothing dynamic survives into the plan.",
)


# ---------------------------------------------------------------------------
# p23: VARIANT ingest + shred (Spark 4 semi-structured path)
# ---------------------------------------------------------------------------

@register(
    "p23_variant_shred",
    duck_sql="""
    SELECT event_id,
           CAST(user_id AS BIGINT) AS uid,
           event_type AS seg,
           CAST(2 * CAST(ROUND(value * 100, 0) AS BIGINT) AS BIGINT)
             AS second_val,
           CAST(TRUE AS BOOLEAN) AS missing_is_null
    FROM events ORDER BY event_id
    """,
    doc="P23: VARIANT ingest + shred — Spark 4's semi-structured type "
        "end-to-end: a nested JSON document is built row-locally from "
        "typed columns (integer cents only — no float rendering), "
        "parse_json()'d into a VARIANT, then shredded back out with "
        "typed variant_get paths ($.user.id as bigint, $.user.seg as "
        "string, $.vals[1] array index, and a missing-path probe that "
        "must return NULL). The oracle recomputes every output straight "
        "from the source columns, so the hash certifies the build→parse"
        "→shred round-trip is lossless and the path/type semantics are "
        "exact. VARIANT is the open-table-format answer to schema-on-"
        "read JSON blobs: the binary encoding pushes typed path access "
        "into the scan instead of per-row string parsing (the "
        "get_json_object hot-path tax f23 measures). Row-local ops, no "
        "shuffle; at 100 TB this is a map-only stage and shredded "
        "columns prune like any other.",
)
def p23_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = F.concat(
        F.lit('{"user":{"id":'),
        F.col("user_id").cast("string"),
        F.lit(',"seg":"'),
        F.col("event_type"),
        F.lit('"},"vals":['),
        F.round(F.col("value") * 100, 0).cast("bigint").cast("string"),
        F.lit(","),
        (2 * F.round(F.col("value") * 100, 0).cast("bigint")).cast("string"),
        F.lit("]}"),
    )
    v = F.parse_json(doc)
    return (
        spark.table("events")
        .select("event_id", v.alias("v"))
        .select(
            "event_id",
            F.variant_get(F.col("v"), "$.user.id", "bigint").alias("uid"),
            F.variant_get(F.col("v"), "$.user.seg", "string").alias("seg"),
            F.variant_get(F.col("v"), "$.vals[1]", "bigint").alias("second_val"),
            F.variant_get(F.col("v"), "$.missing", "string")
            .isNull()
            .alias("missing_is_null"),
        )
        .orderBy("event_id")
    )
