"""Differential relational-expression fuzzer (r7 verdict #3).

The fixed registry proves what it DECLARES; this module hunts the dialect
-drift and type-coercion corners nobody declared (the U08/F13 class found
by hand in earlier rounds). A seeded generator builds random typed
expressions — projections, predicates, aggregates, FK joins, set ops —
over the real fixture schemas and renders each query for BOTH engines;
tests/test_fuzz_differential.py executes N seeds per session and demands
exact canonicalized-multiset equality via the same harness the registry
uses (harness.canon_rows — stricter than the driver's hash).

Generation is PORTABLE-BY-CONSTRUCTION: every node the generator can emit
follows a documented cross-engine dialect rule, so any mismatch the fuzzer
surfaces is a genuine engine/coercion divergence (or a rule we believed
wrongly — either way, a finding). The rules, each learned from a live
divergence during registry development (see queries/sqlexact.py and the
memory'd money-math discipline):

 R1  Money-like doubles (2-decimal payloads) enter integer math ONLY as
     cents: CAST(ROUND(col * 100, 0) AS BIGINT). Raw doubles may be
     projected / MIN / MAXed (bit-identical storage) but never summed.
 R2  No fractional literals: ``bigint_col + 0.5`` runs in DECIMAL with
     DIFFERENT division scales per engine. Integer literals only.
 R3  Integer division goes through sqlexact.idiv (per-dialect spelling;
     there is no shared-text exact form). ``%`` is shared (sign-of-
     dividend in both), with a nonzero literal divisor.
 R4  SUM over integer expressions is CAST(... AS BIGINT); generated
     magnitudes are bounded so every rendered integer stays < 2^53
     (the harness's float64-exact fence). Means are rendered as
     CAST(SUM AS DOUBLE) / COUNT(*) — exact int sums through one
     correctly-rounded IEEE divide — never engine AVG.
 R5  No ROUND on computed doubles (only the R1 idiom rounds, where the
     payload is an exact half-free 2-decimal grid).
 R6  String ops from the verified-portable set only: ``||`` (NULL-
     propagating in both; DuckDB's concat() skips NULLs — divergent),
     upper/lower/trim/substring/replace/length/left/right/instr.
 R7  No ORDER BY (compare is an order-insensitive multiset); GROUP BY is
     ordinal (both engines honor it).
 R8  Timestamp literals use the shared TIMESTAMP '...' spelling;
     extraction via year()/month()/day() (INT vs BIGINT width differs —
     canon_rows compares python ints, so width is immaterial).
 R9  COUNT/COUNT DISTINCT are exact in both; approximate aggregates are
     out of scope here (they carry their own fenced pairs).
 R10 NULLs are injected via NULLIF and must flow through ||, CASE,
     COALESCE, predicates (three-valued logic) and GROUP BY (NULL is one
     group in both) identically.
 R11 Positional window functions (row_number/lag/lead/ntile/running
     frames) ORDER BY a verified-unique key only; value-ranked windows
     (rank/dense_rank) are tie-stable. THE FUZZER'S FIRST LIVE CATCH:
     seeds 24/84 diverged on lag() ordered by l_orderkey*10+l_linenumber
     because the driver fixtures' lineitem carries duplicate
     (orderkey, linenumber) pairs — the "obviously unique" key isn't,
     and each engine broke the ties its own way (see UNIQUE_KEYS).
 R12 Super-aggregates (ROLLUP / CUBE / GROUPING SETS with the () grand-
     total set) over an EMPTY input: the standard (and DuckDB, and
     Postgres) emits the grand-total row — grouping by () over an empty
     table yields one group, COUNT(*) = 0 — while Spark emits zero rows
     (its GROUPING SETS expansion aggregates over the synthetic grouping
     -id column, and any non-empty grouping-expression list over an
     empty input produces no groups). THE FUZZER'S SECOND LIVE CATCH:
     11/25 rollup_agg smoke seeds whose WHERE filtered a table to empty
     diverged exactly this way. Fenced with a shared HAVING
     COUNT(*) > 0 — semantics-preserving wherever the engines agree
     (every real grouping-set row aggregates >= 1 input row). The fence
     blinds the randomized gate to the corner itself, so the
     ``rollup_empty`` template (r8 ADVICE) intentionally regenerates the
     empty-input case WITHOUT the fence and asserts the asymmetry
     holds: the DuckDB side subtracts the expected grand-total row via
     EXCEPT ALL, so both engines must land on the empty set — if either
     engine's behavior drifts (Spark starts emitting the row, DuckDB
     changes its shape), the template diverges and the drift is a
     finding again.

 Rules R13-R18 were added for the round-9 grammar extension, each
 verified live on both engines before encoding (the decade-sweep bug
 classes: window frames, int64-adjacent arithmetic, timestamps/zones):

 R13 DuckDB's date_trunc returns DATE for day-and-coarser units where
     Spark always returns TIMESTAMP — fence by casting the DuckDB side
     back: CAST(date_trunc(u, ts) AS TIMESTAMP). Sub-day units agree
     unfenced.
 R14 Day differences: Spark datediff(end, start) over DATE casts ==
     DuckDB date_diff('day', start, end) — note the flipped argument
     order; both are exact day subtraction once inputs are DATEs.
 R15 Epoch microseconds exceed 2^53 — render digit-exact as STRING
     (unix_micros vs epoch_us), the g51/g58 canonicalizer discipline.
 R16 Timezone conversion pins the interpretation explicitly
     (naive -> UTC -> zone; the f57 lesson): Spark
     convert_timezone('UTC', tz, ts) rendered via date_format ==
     DuckDB timezone(tz, timezone('UTC', ts)) via strftime, so neither
     session's default zone participates. ISO weekday: Spark
     weekday()+1 == DuckDB isodow (Spark's dayofweek/DuckDB's dayofweek
     disagree on week origin — excluded).
 R17 Wide integer arithmetic (the g58 int64-overflow class) runs in
     DECIMAL(38,0) on BOTH sides — Spark's ANSI BIGINT sum overflows
     where DuckDB silently widens to HUGEINT, so the shared-exact form
     is an explicit decimal widening before SUM — and renders as STRING
     past the 2^53 fence (R15's discipline).
 R18 Window FRAME specs: ROWS frames (positional) obey R11 — ORDER BY
     a verified-unique key only; RANGE frames with numeric offsets are
     VALUE-based (all peers enter the frame), so they are tie-stable
     and may ORDER BY any int expression — the one window form that is
     deterministic over non-unique orderings by construction.
"""

from __future__ import annotations

import random

from pydatalake_gen2_spark.queries.sqlexact import idiv

# type tags: "int" (exact integer), "money" (2-decimal double), "str",
# "ts" (timestamp). doubles beyond money are excluded (events.value is a
# free double whose *100 grid has real half-way cases — R1 scope).
SCHEMAS: dict[str, dict[str, list[str]]] = {
    "region": {"int": ["r_regionkey"], "money": [], "str": ["r_name"], "ts": []},
    "nation": {
        "int": ["n_nationkey", "n_regionkey"],
        "money": [],
        "str": ["n_name"],
        "ts": [],
    },
    "customer": {
        "int": ["c_custkey", "c_nationkey"],
        "money": ["c_acctbal"],
        "str": ["c_name", "c_mktsegment"],
        "ts": [],
    },
    "supplier": {
        "int": ["s_suppkey", "s_nationkey"],
        "money": ["s_acctbal"],
        "str": ["s_name"],
        "ts": [],
    },
    "part": {
        "int": ["p_partkey", "p_size"],
        "money": ["p_retailprice"],
        "str": ["p_name", "p_brand", "p_type"],
        "ts": [],
    },
    "orders": {
        "int": ["o_orderkey", "o_custkey"],
        "money": ["o_totalprice"],
        "str": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
    },
    "lineitem": {
        "int": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "money": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "str": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
    },
}

# (left table, left col, right table, right col) — the fixtures' FK edges
FKS = [
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

# unique total-order keys per table (window determinism rule R11: any
# POSITIONAL window function — row_number/lag/lead/ntile/running frames —
# must ORDER BY a genuinely unique key, or tie order is engine-dependent
# and the results legitimately diverge. lineitem is deliberately ABSENT:
# the driver fixtures carry duplicate (l_orderkey, l_linenumber) pairs
# (6000 rows, 4599 distinct at sf0.001 — found LIVE by fuzz seeds 24/84,
# whose lag() over the would-be key diverged), so it has no unique key.
# Value-ranked windows (rank/dense_rank) are tie-stable and would be
# safe anywhere, but the grammar keeps one rule for all positional forms.
UNIQUE_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
}

_STR_LITS = ["A", "BRASS", "econ", "F", "O", "1-URGENT", "x", ""]
_LIKE_PATS = ["%a%", "C%", "%5", "%er%", "%e_t%", "A%"]
_TS_LITS = [
    "1993-01-01 00:00:00",
    "1995-06-17 00:00:00",
    "1997-03-01 00:00:00",
]


def _df_program(table, cols, where, group_n, having, distinct):
    """DUAL RENDERING (r9 verdict #6): rebuild a generated single-table
    query as a DataFrame-API program. Expressions stay in SQL text (via
    F.expr — the expression grammar is identical by construction), but
    the RELATIONAL shape goes through the API builders, so resolution
    runs against API-built Project/Filter/Aggregate nodes instead of
    spark.sql's single-pass analysis of one statement. That is exactly
    where API-vs-SQL drift lives (the P24 lateral-alias-shadowing class:
    alias visibility, GROUP BY ordinal vs expression, HAVING resolution)
    — a space pure-SQL fuzzing structurally cannot reach. Faithful
    translations of the SQL-only constructs: GROUP BY ordinals become
    the key expressions themselves (aliased in groupBy); HAVING becomes
    a boolean aggregate column filtered-then-dropped after agg()."""
    where_s = where.spark if where is not None else None
    having_s = having[0] if having is not None else None
    col_specs = [(a, s) for a, s, _ in cols]

    def build(spark):
        from pyspark.sql import functions as F

        df = spark.table(table)
        if where_s is not None:
            df = df.filter(F.expr(where_s))
        if group_n:
            keys = [F.expr(s).alias(a) for a, s in col_specs[:group_n]]
            aggs = [F.expr(s).alias(a) for a, s in col_specs[group_n:]]
            if having_s is not None:
                aggs.append(F.expr(having_s).alias("__having"))
            df = df.groupBy(*keys).agg(*aggs)
            if having_s is not None:
                df = df.filter(F.col("__having")).drop("__having")
        else:
            df = df.select(*[F.expr(s).alias(a) for a, s in col_specs])
        if distinct:
            df = df.distinct()
        return df

    return build


class _E:
    """A generated expression rendered per dialect."""

    __slots__ = ("spark", "duck", "typ")

    def __init__(self, spark: str, duck: str | None, typ: str):
        self.spark = spark
        self.duck = duck if duck is not None else spark
        self.typ = typ


def _shared(text: str, typ: str) -> _E:
    return _E(text, text, typ)


class QueryGen:
    def __init__(self, seed: int):
        self.r = random.Random(seed)
        # Set by _render for single-table shapes: a callable
        # (spark) -> DataFrame that rebuilds the SAME query through the
        # DataFrame API (select/filter/groupBy/agg builders) instead of
        # spark.sql — see _df_program. None for shapes the API leg
        # doesn't cover (joins, set ops, derived tables).
        self.df_builder = None

    # ---------------- expressions ----------------

    def int_expr(self, t: str, depth: int = 0) -> _E:
        s = SCHEMAS[t]
        leafs: list[str] = []
        if s["int"]:
            leafs += ["col"] * 4
        if s["money"]:
            leafs += ["cents"] * 2
        if s["ts"]:
            leafs += ["datepart"] * 2
        if s["str"]:
            leafs += ["length"]
        leafs += ["lit"]
        ops = (
            ["add", "sub", "mul", "mod", "idiv", "abs", "case",
             "coalesce_nullif", "greatest", "instr"]
            if depth < 2
            else []
        )
        kind = self.r.choice(leafs + ops * 2)
        if kind == "col":
            return _shared(self.r.choice(s["int"]), "int")
        if kind == "cents":
            c = self.r.choice(s["money"])
            return _shared(f"CAST(ROUND({c} * 100, 0) AS BIGINT)", "int")  # R1
        if kind == "datepart":
            c = self.r.choice(s["ts"])
            fn = self.r.choice(["year", "month", "day"])
            return _shared(f"{fn}({c})", "int")
        if kind == "length":
            inner = self.str_expr(t, depth + 1)
            return _E(f"length({inner.spark})", f"length({inner.duck})", "int")
        if kind == "lit":
            return _shared(str(self.r.randint(0, 100)), "int")
        if kind == "abs":
            a = self.int_expr(t, depth + 1)
            return _E(f"abs({a.spark})", f"abs({a.duck})", "int")
        if kind in ("add", "sub"):
            a, b = self.int_expr(t, depth + 1), self.int_expr(t, depth + 1)
            op = "+" if kind == "add" else "-"
            return _E(
                f"({a.spark} {op} {b.spark})", f"({a.duck} {op} {b.duck})", "int"
            )
        if kind == "mul":
            # literal factor only: bounds every rendered int < 2^53 (R4)
            a = self.int_expr(t, depth + 1)
            k = self.r.randint(2, 7)
            return _E(f"({a.spark} * {k})", f"({a.duck} * {k})", "int")
        if kind == "mod":
            a = self.int_expr(t, depth + 1)
            k = self.r.randint(2, 13)
            return _E(f"({a.spark} % {k})", f"({a.duck} % {k})", "int")
        if kind == "idiv":
            a = self.int_expr(t, depth + 1)
            k = str(self.r.randint(1, 9))
            return _E(idiv(False, a.spark, k), idiv(True, a.duck, k), "int")  # R3
        if kind == "case":
            p = self.pred(t, depth + 1)
            a, b = self.int_expr(t, depth + 1), self.int_expr(t, depth + 1)
            # sometimes omit ELSE: the implicit NULL branch must flow
            # identically (R10)
            els_s = f" ELSE {b.spark}" if self.r.random() < 0.8 else ""
            els_d = f" ELSE {b.duck}" if els_s else ""
            return _E(
                f"(CASE WHEN {p.spark} THEN {a.spark}{els_s} END)",
                f"(CASE WHEN {p.duck} THEN {a.duck}{els_d} END)",
                "int",
            )
        if kind == "greatest":
            a, b = self.int_expr(t, depth + 1), self.int_expr(t, depth + 1)
            fn = self.r.choice(["greatest", "least"])
            return _E(
                f"{fn}({a.spark}, {b.spark})", f"{fn}({a.duck}, {b.duck})", "int"
            )
        if kind == "instr":
            a = self.str_expr(t, depth + 1)
            sub = self.r.choice(["a", "er", "5", "Q"])
            return _E(
                f"CAST(instr({a.spark}, '{sub}') AS INT)",
                f"CAST(instr({a.duck}, '{sub}') AS INT)",
                "int",
            )
        # coalesce_nullif: inject a NULL and recover it (R10)
        a = self.int_expr(t, depth + 1)
        b = self.int_expr(t, depth + 1)
        k = self.r.randint(0, 10)
        return _E(
            f"COALESCE(NULLIF({a.spark}, {k}), {b.spark})",
            f"COALESCE(NULLIF({a.duck}, {k}), {b.duck})",
            "int",
        )

    def str_expr(self, t: str, depth: int = 0) -> _E:
        s = SCHEMAS[t]
        kinds = ["col"] * 4 + ["lit"]
        if depth < 2:
            kinds += ["upper", "lower", "trim", "substr", "replace", "concat",
                      "leftright", "nullif", "cast_int", "lpad"]
        kind = self.r.choice(kinds)
        if kind == "col" and s["str"]:
            return _shared(self.r.choice(s["str"]), "str")
        if kind in ("col", "lit"):
            lit = self.r.choice(_STR_LITS)
            return _shared(f"'{lit}'", "str")
        if kind in ("upper", "lower", "trim"):
            a = self.str_expr(t, depth + 1)
            return _E(f"{kind}({a.spark})", f"{kind}({a.duck})", "str")
        if kind == "substr":
            a = self.str_expr(t, depth + 1)
            i, n = self.r.randint(1, 5), self.r.randint(1, 8)
            return _E(
                f"substring({a.spark}, {i}, {n})",
                f"substring({a.duck}, {i}, {n})",
                "str",
            )
        if kind == "replace":
            a = self.str_expr(t, depth + 1)
            frm = self.r.choice("aeiou")
            return _E(
                f"replace({a.spark}, '{frm}', 'Q')",
                f"replace({a.duck}, '{frm}', 'Q')",
                "str",
            )
        if kind == "concat":
            a, b = self.str_expr(t, depth + 1), self.str_expr(t, depth + 1)
            # || propagates NULL in BOTH engines; concat() does not (R6)
            return _E(
                f"({a.spark} || '_' || {b.spark})",
                f"({a.duck} || '_' || {b.duck})",
                "str",
            )
        if kind == "leftright":
            a = self.str_expr(t, depth + 1)
            fn = self.r.choice(["left", "right"])
            n = self.r.randint(1, 6)
            return _E(f"{fn}({a.spark}, {n})", f"{fn}({a.duck}, {n})", "str")
        if kind == "cast_int":
            # Spark spells it STRING; DuckDB accepts STRING as a VARCHAR
            # alias (bare VARCHAR needs a length in Spark — R6 family)
            a = self.int_expr(t, depth + 1)
            return _E(
                f"CAST({a.spark} AS STRING)", f"CAST({a.duck} AS STRING)", "str"
            )
        if kind == "lpad":
            a = self.str_expr(t, depth + 1)
            n = self.r.randint(1, 10)
            fn = self.r.choice(["lpad", "rpad"])
            return _E(
                f"{fn}({a.spark}, {n}, '#')", f"{fn}({a.duck}, {n}, '#')", "str"
            )
        a = self.str_expr(t, depth + 1)
        lit = self.r.choice(_STR_LITS)
        return _E(
            f"NULLIF({a.spark}, '{lit}')", f"NULLIF({a.duck}, '{lit}')", "str"
        )

    def pred(self, t: str, depth: int = 0) -> _E:
        kinds = ["icmp"] * 3 + ["scmp", "like", "between", "isin"]
        if SCHEMAS[t]["ts"]:
            kinds += ["tscmp"]
        if depth < 2:
            kinds += ["and", "or", "not", "isnull"]
        kind = self.r.choice(kinds)
        if kind == "icmp":
            a, b = self.int_expr(t, depth + 1), self.int_expr(t, depth + 1)
            op = self.r.choice(["=", "<", "<=", ">", ">=", "<>"])
            return _E(
                f"({a.spark} {op} {b.spark})", f"({a.duck} {op} {b.duck})", "bool"
            )
        if kind == "scmp":
            a, b = self.str_expr(t, depth + 1), self.str_expr(t, depth + 1)
            op = self.r.choice(["=", "<>", "<", ">"])
            return _E(
                f"({a.spark} {op} {b.spark})", f"({a.duck} {op} {b.duck})", "bool"
            )
        if kind == "like":
            a = self.str_expr(t, depth + 1)
            pat = self.r.choice(_LIKE_PATS)
            return _E(f"({a.spark} LIKE '{pat}')", f"({a.duck} LIKE '{pat}')", "bool")
        if kind == "between":
            a = self.int_expr(t, depth + 1)
            lo = self.r.randint(0, 50)
            hi = lo + self.r.randint(0, 80)
            return _E(
                f"({a.spark} BETWEEN {lo} AND {hi})",
                f"({a.duck} BETWEEN {lo} AND {hi})",
                "bool",
            )
        if kind == "isin":
            a = self.int_expr(t, depth + 1)
            vals = ", ".join(str(self.r.randint(0, 60)) for _ in range(3))
            return _E(f"({a.spark} IN ({vals}))", f"({a.duck} IN ({vals}))", "bool")
        if kind == "tscmp":
            c = self.r.choice(SCHEMAS[t]["ts"])
            lit = self.r.choice(_TS_LITS)
            op = self.r.choice(["<", ">=", ">"])
            if self.r.random() < 0.4:
                # shared interval arithmetic: ts + INTERVAL n DAY parses
                # and adds identically in both engines
                n = self.r.randint(1, 90)
                return _shared(
                    f"(({c} + INTERVAL {n} DAY) {op} TIMESTAMP '{lit}')",
                    "bool",
                )
            return _shared(f"({c} {op} TIMESTAMP '{lit}')", "bool")
        if kind in ("and", "or"):
            a, b = self.pred(t, depth + 1), self.pred(t, depth + 1)
            op = kind.upper()
            return _E(
                f"({a.spark} {op} {b.spark})", f"({a.duck} {op} {b.duck})", "bool"
            )
        if kind == "not":
            a = self.pred(t, depth + 1)
            return _E(f"(NOT {a.spark})", f"(NOT {a.duck})", "bool")
        a = self.str_expr(t, depth + 1)
        return _E(f"({a.spark} IS NULL)", f"({a.duck} IS NULL)", "bool")

    def group_key(self, t: str) -> _E:
        """Low-cardinality key expressions (bounds result size)."""
        s = SCHEMAS[t]
        kinds = []
        if s["str"]:
            kinds += ["prefix", "strcol"]
        if s["int"]:
            kinds += ["mod"]
        if s["ts"]:
            kinds += ["year", "trunc"]
        kind = self.r.choice(kinds)
        if kind == "prefix":
            c = self.r.choice(s["str"])
            return _shared(f"substring({c}, 1, 1)", "str")
        if kind == "strcol":
            # pick the lowest-cardinality-ish string col (status/segment
            # style names sort first in these schemas by suffix) — any is
            # fine for a multiset compare, cardinality just bounds rows
            return _shared(self.r.choice(s["str"]), "str")
        if kind == "mod":
            c = self.r.choice(s["int"])
            k = self.r.randint(2, 9)
            return _shared(f"({c} % {k})", "int")
        if kind == "year":
            c = self.r.choice(s["ts"])
            return _shared(f"year({c})", "int")
        c = self.r.choice(s["ts"])
        return _shared(f"CAST(date_trunc('month', {c}) AS DATE)", "date")

    def aggs(self, t: str, n: int) -> list[tuple[str, str, str]]:
        out = []
        for i in range(n):
            kind = self.r.choice(
                ["count_star", "count", "count_distinct", "min_int", "max_int",
                 "sum_int", "mean_int", "min_str", "max_str", "min_money"]
            )
            alias = f"a{i}"
            if kind == "count_star":
                out.append((alias, "CAST(COUNT(*) AS BIGINT)", None))
            elif kind == "count":
                e = self.str_expr(t, 2)
                out.append(
                    (alias, f"CAST(COUNT({e.spark}) AS BIGINT)",
                     f"CAST(COUNT({e.duck}) AS BIGINT)")
                )
            elif kind == "count_distinct":
                s = SCHEMAS[t]
                c = self.r.choice(s["int"] + s["str"])
                out.append((alias, f"CAST(COUNT(DISTINCT {c}) AS BIGINT)", None))
            elif kind in ("min_int", "max_int"):
                e = self.int_expr(t, 1)
                fn = kind[:3].upper()
                out.append(
                    (alias, f"CAST({fn}({e.spark}) AS BIGINT)",
                     f"CAST({fn}({e.duck}) AS BIGINT)")
                )
            elif kind == "sum_int":
                e = self.int_expr(t, 1)
                out.append(
                    (alias, f"CAST(SUM({e.spark}) AS BIGINT)",
                     f"CAST(SUM({e.duck}) AS BIGINT)")
                )
            elif kind == "mean_int":
                # R4: exact int sum through ONE IEEE divide — never AVG
                e = self.int_expr(t, 1)
                out.append(
                    (alias,
                     f"(CAST(SUM({e.spark}) AS DOUBLE) / COUNT(*))",
                     f"(CAST(SUM({e.duck}) AS DOUBLE) / COUNT(*))")
                )
            elif kind in ("min_str", "max_str"):
                e = self.str_expr(t, 2)
                fn = kind[:3].upper()
                out.append((alias, f"{fn}({e.spark})", f"{fn}({e.duck})"))
            else:  # min_money: raw doubles are bit-identical storage (R1)
                s = SCHEMAS[t]
                if s["money"]:
                    c = self.r.choice(s["money"])
                    fn = self.r.choice(["MIN", "MAX"])
                    out.append((alias, f"{fn}({c})", None))
                else:
                    out.append((alias, "CAST(COUNT(*) AS BIGINT)", None))
        return out

    # ---------------- query templates ----------------

    def _render(self, cols: list[tuple[str, str, str | None]],
                frm_s: str, frm_d: str, where: _E | None,
                group_n: int = 0, having: tuple[str, str] | None = None,
                distinct: bool = False) -> tuple[str, str]:
        kw = "SELECT DISTINCT" if distinct else "SELECT"
        sel_s = ", ".join(f"{s} AS {a}" for a, s, _ in cols)
        sel_d = ", ".join(f"{d if d is not None else s} AS {a}" for a, s, d in cols)
        q_s = f"{kw} {sel_s} FROM {frm_s}"
        q_d = f"{kw} {sel_d} FROM {frm_d}"
        if where is not None:
            q_s += f" WHERE {where.spark}"
            q_d += f" WHERE {where.duck}"
        if group_n:
            ordinal = ", ".join(str(i + 1) for i in range(group_n))
            q_s += f" GROUP BY {ordinal}"
            q_d += f" GROUP BY {ordinal}"
        if having is not None:
            q_s += f" HAVING {having[0]}"
            q_d += f" HAVING {having[1]}"
        self.df_builder = (
            _df_program(frm_s, cols, where, group_n, having, distinct)
            if " " not in frm_s
            else None
        )
        return q_s, q_d

    def filter_project(self) -> tuple[str, str]:
        t = self.r.choice(list(SCHEMAS))
        n = self.r.randint(1, 4)
        cols = []
        for i in range(n):
            which = self.r.random()
            if which < 0.5:
                e = self.int_expr(t)
            elif which < 0.85:
                e = self.str_expr(t)
            elif SCHEMAS[t]["ts"]:
                e = _shared(self.r.choice(SCHEMAS[t]["ts"]), "ts")
            else:
                e = self.int_expr(t)
            cols.append((f"c{i}", e.spark, e.duck))
        where = self.pred(t)
        if self.r.random() < 0.2:
            # scalar-subquery comparison: uncorrelated MAX/MIN from a
            # second table inside the predicate
            t2 = self.r.choice([x for x in SCHEMAS if x != t])
            c2 = self.r.choice(SCHEMAS[t2]["int"])
            a = self.int_expr(t, 1)
            sub = f"(SELECT MIN({c2}) FROM {t2})"
            where = _E(
                f"({where.spark} AND {a.spark} >= {sub})",
                f"({where.duck} AND {a.duck} >= {sub})",
                "bool",
            )
        return self._render(
            cols, t, t, where, distinct=self.r.random() < 0.25
        )

    def group_agg(self) -> tuple[str, str]:
        t = self.r.choice(list(SCHEMAS))
        nk = self.r.randint(1, 2)
        keys = [self.group_key(t) for _ in range(nk)]
        cols = [(f"k{i}", k.spark, k.duck) for i, k in enumerate(keys)]
        cols += self.aggs(t, self.r.randint(1, 3))
        where = self.pred(t) if self.r.random() < 0.7 else None
        having = None
        if self.r.random() < 0.3:
            k = self.r.randint(1, 40)
            having = (f"COUNT(*) > {k}", f"COUNT(*) > {k}")
        return self._render(cols, t, t, where, group_n=nk, having=having)

    def join_agg(self) -> tuple[str, str]:
        lt, lc, rt, rc = self.r.choice(FKS)
        jt = self.r.choice(["JOIN", "JOIN", "LEFT JOIN", "LEFT JOIN",
                            "RIGHT JOIN", "FULL OUTER JOIN"])
        frm = f"{lt} {jt} {rt} ON {lt}.{lc} = {rt}.{rc}"
        kt = self.r.choice([lt, rt] if jt == "JOIN" else [lt])
        key = self.group_key(kt)
        cols = [("k0", key.spark, key.duck)]
        cols += self.aggs(lt, self.r.randint(1, 2))
        # predicates on the LEFT side only, and only under INNER/LEFT:
        # a WHERE over null-extended columns silently drops the outer
        # rows (consistently in both engines, but it defeats the outer
        # semantics this template exists to exercise). Under RIGHT/FULL
        # the outer-row NULL flow itself is the test: NULL group keys
        # (one group in both), aggs skipping NULL left columns, COUNT(*)
        # counting every null-extended row.
        where = (
            self.pred(lt)
            if jt in ("JOIN", "LEFT JOIN") and self.r.random() < 0.6
            else None
        )
        out = self._render(cols, frm, frm, where, group_n=1)
        # r10 dual rendering, join shape: the FK tables' column names are
        # disjoint (TPC-H prefixes), so the API join resolves the same
        # references unambiguously — this leg covers df.join(on=expr,
        # how=...) resolution, which the single-table builder cannot.
        how = {"JOIN": "inner", "LEFT JOIN": "left", "RIGHT JOIN": "right",
               "FULL OUTER JOIN": "full"}[jt]
        col_specs = [(a, s) for a, s, _ in cols]
        where_s = where.spark if where is not None else None

        def build(spark, lt=lt, lc=lc, rt=rt, rc=rc, how=how,
                  col_specs=col_specs, where_s=where_s):
            from pyspark.sql import functions as F

            df = spark.table(lt).join(
                spark.table(rt), on=F.col(lc) == F.col(rc), how=how
            )
            if where_s is not None:
                df = df.filter(F.expr(where_s))
            keys = [F.expr(s).alias(a) for a, s in col_specs[:1]]
            aggs = [F.expr(s).alias(a) for a, s in col_specs[1:]]
            return df.groupBy(*keys).agg(*aggs)

        self.df_builder = build
        return out

    def join3_agg(self) -> tuple[str, str]:
        """Three-table FK chain join + aggregate: multiplicity through a
        fact->dim->dim path, with optional LEFT on the second hop. The
        fixtures' FK columns are non-null and total, so a bare LEFT JOIN
        never null-extends (r8 ADVICE) — an extra ON-clause predicate on
        t3 makes the null-extension REAL: rows whose dim fails the
        predicate survive with NULL t3 columns, which then flow through
        group keys (NULL is one group in both engines, per join_agg) and
        aggregate inputs (SUM/COUNT/MIN skip NULLs in both)."""
        chain = self.r.choice([
            ("lineitem", "l_orderkey", "orders", "o_orderkey",
             "o_custkey", "customer", "c_custkey"),
            ("orders", "o_custkey", "customer", "c_custkey",
             "c_nationkey", "nation", "n_nationkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey",
             "n_regionkey", "region", "r_regionkey"),
            ("supplier", "s_nationkey", "nation", "n_nationkey",
             "n_regionkey", "region", "r_regionkey"),
            ("lineitem", "l_suppkey", "supplier", "s_suppkey",
             "s_nationkey", "nation", "n_nationkey"),
        ])
        t1, c1, t2, c2, c2b, t3, c3 = chain
        j2 = self.r.choice(["JOIN", "JOIN", "LEFT JOIN"])
        on2_s = on2_d = f"{t2}.{c2b} = {t3}.{c3}"
        agg_t = t1
        if j2 == "LEFT JOIN":
            if self.r.random() < 0.7:
                # the null-extender: dim rows failing this predicate
                # leave NULL t3 columns on the surviving fact rows
                p3 = self.pred(t3, 1)
                on2_s += f" AND {p3.spark}"
                on2_d += f" AND {p3.duck}"
            if self.r.random() < 0.5:
                agg_t = t3  # aggregate inputs see the NULL extension
        frm_s = (f"{t1} JOIN {t2} ON {t1}.{c1} = {t2}.{c2} "
                 f"{j2} {t3} ON {on2_s}")
        frm_d = (f"{t1} JOIN {t2} ON {t1}.{c1} = {t2}.{c2} "
                 f"{j2} {t3} ON {on2_d}")
        kt = self.r.choice([t1, t2, t3])  # t3 keys safe: NULL is one group
        key = self.group_key(kt)
        cols = [("k0", key.spark, key.duck)]
        cols += self.aggs(agg_t, self.r.randint(1, 2))
        where = self.pred(t1) if self.r.random() < 0.6 else None
        return self._render(cols, frm_s, frm_d, where, group_n=1)

    def window(self) -> tuple[str, str]:
        """Window functions over deterministic frames: ranking by VALUE
        (rank/dense_rank — tie-stable multisets), everything positional
        (row_number/lag/lead/ntile/running sums) over the table's unique
        key order, optional low-cardinality PARTITION BY."""
        t = self.r.choice(list(UNIQUE_KEYS))
        uk = UNIQUE_KEYS[t]
        part = ""
        if self.r.random() < 0.6:
            k = self.group_key(t)
            part = f"PARTITION BY {k.spark} "  # group_key is shared-text
        kind = self.r.choice(
            ["row_number", "rank", "dense_rank", "lag", "lead", "ntile",
             "running_sum", "part_sum", "part_minmax"]
        )
        if kind in ("row_number", "ntile"):
            n = self.r.randint(2, 5)
            fn = "ROW_NUMBER()" if kind == "row_number" else f"NTILE({n})"
            w = f"{fn} OVER ({part}ORDER BY {uk})"
            wexp = _shared(w, "int")
        elif kind in ("rank", "dense_rank"):
            e = self.int_expr(t, 1)
            w_s = f"{kind.upper()}() OVER ({part}ORDER BY {e.spark})"
            w_d = f"{kind.upper()}() OVER ({part}ORDER BY {e.duck})"
            wexp = _E(w_s, w_d, "int")
        elif kind in ("lag", "lead"):
            e = self.int_expr(t, 1)
            off = self.r.randint(1, 3)
            w_s = f"{kind}({e.spark}, {off}) OVER ({part}ORDER BY {uk})"
            w_d = f"{kind}({e.duck}, {off}) OVER ({part}ORDER BY {uk})"
            wexp = _E(w_s, w_d, "int")
        elif kind == "running_sum":
            e = self.int_expr(t, 1)
            frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            w_s = f"SUM({e.spark}) OVER ({part}ORDER BY {uk} {frame})"
            w_d = f"SUM({e.duck}) OVER ({part}ORDER BY {uk} {frame})"
            wexp = _E(f"CAST({w_s} AS BIGINT)", f"CAST({w_d} AS BIGINT)", "int")
        elif kind == "part_sum":
            e = self.int_expr(t, 1)
            p = part or f"PARTITION BY ({UNIQUE_KEYS[t]}) % 7 "
            w_s = f"CAST(SUM({e.spark}) OVER ({p.rstrip()}) AS BIGINT)"
            w_d = f"CAST(SUM({e.duck}) OVER ({p.rstrip()}) AS BIGINT)"
            wexp = _E(w_s, w_d, "int")
        else:  # part_minmax
            e = self.int_expr(t, 1)
            p = part or f"PARTITION BY ({UNIQUE_KEYS[t]}) % 5 "
            fn = self.r.choice(["MIN", "MAX"])
            w_s = f"{fn}({e.spark}) OVER ({p.rstrip()})"
            w_d = f"{fn}({e.duck}) OVER ({p.rstrip()})"
            wexp = _E(f"CAST({w_s} AS BIGINT)", f"CAST({w_d} AS BIGINT)", "int")
        cols = [("k0", f"({uk})", None), ("w0", wexp.spark, wexp.duck)]
        where = self.pred(t) if self.r.random() < 0.5 else None
        return self._render(cols, t, t, where)

    def rollup_agg(self) -> tuple[str, str]:
        """ROLLUP / CUBE / GROUPING SETS with GROUPING() disambiguation.

        The super-aggregate NULL a rollup emits is indistinguishable from
        a data NULL in the key column alone — GROUPING(expr) is the
        standard marker, and both engines implement it (Spark returns
        TINYINT, DuckDB BIGINT — cast to INT; canon compares python
        ints). Keys are shared-text (group_key always is), so the
        grouping clause renders identically; only the aggregates carry
        per-dialect spellings. Expressions must be repeated literally in
        the grouping clause (ordinals are not allowed inside ROLLUP in
        either engine)."""
        t = self.r.choice(list(SCHEMAS))
        k1 = self.group_key(t)
        k2 = self.group_key(t)
        for _ in range(5):  # distinct key texts keep GROUPING() unambiguous
            if k2.spark != k1.spark:
                break
            k2 = self.group_key(t)
        if k2.spark == k1.spark:
            return self.group_agg()
        form = self.r.choice(["ROLLUP", "CUBE", "SETS"])
        if form == "SETS":
            grp = (f"GROUPING SETS (({k1.spark}, {k2.spark}), "
                   f"({k1.spark}), ())")
        else:
            grp = f"{form}({k1.spark}, {k2.spark})"
        cols: list[tuple[str, str, str | None]] = [
            ("k0", k1.spark, None),
            ("k1", k2.spark, None),
            ("g0", f"CAST(GROUPING({k1.spark}) AS INT)", None),
            ("g1", f"CAST(GROUPING({k2.spark}) AS INT)", None),
        ]
        cols += self.aggs(t, self.r.randint(1, 2))
        where = self.pred(t) if self.r.random() < 0.6 else None
        sel_s = ", ".join(f"{s} AS {a}" for a, s, _ in cols)
        sel_d = ", ".join(f"{d if d is not None else s} AS {a}"
                          for a, s, d in cols)
        q_s = f"SELECT {sel_s} FROM {t}"
        q_d = f"SELECT {sel_d} FROM {t}"
        if where is not None:
            q_s += f" WHERE {where.spark}"
            q_d += f" WHERE {where.duck}"
        # R12 fence: the shared HAVING drops exactly the empty-input
        # super-aggregate rows DuckDB (standard) emits and Spark doesn't;
        # over non-empty inputs every grouping-set row has COUNT(*) >= 1,
        # so this is semantics-preserving where the engines agree.
        tail = f" GROUP BY {grp} HAVING COUNT(*) > 0"
        return q_s + tail, q_d + tail

    def agg_filter(self) -> tuple[str, str]:
        """Aggregate FILTER (WHERE ...) clauses — per-aggregate predicates
        with their own three-valued logic (a NULL filter predicate must
        exclude the row in both engines, same as WHERE)."""
        t = self.r.choice(list(SCHEMAS))
        key = self.group_key(t)
        cols: list[tuple[str, str, str | None]] = [
            ("k0", key.spark, key.duck)
        ]
        for i in range(self.r.randint(1, 2)):
            p = self.pred(t, 1)
            flt_s, flt_d = f" FILTER (WHERE {p.spark})", f" FILTER (WHERE {p.duck})"
            kind = self.r.choice(["count", "sum", "minmax"])
            if kind == "count":
                cols.append((f"a{i}", f"CAST(COUNT(*){flt_s} AS BIGINT)",
                             f"CAST(COUNT(*){flt_d} AS BIGINT)"))
            elif kind == "sum":
                e = self.int_expr(t, 1)
                cols.append((f"a{i}",
                             f"CAST(SUM({e.spark}){flt_s} AS BIGINT)",
                             f"CAST(SUM({e.duck}){flt_d} AS BIGINT)"))
            else:
                e = self.int_expr(t, 1)
                fn = self.r.choice(["MIN", "MAX"])
                cols.append((f"a{i}",
                             f"CAST({fn}({e.spark}){flt_s} AS BIGINT)",
                             f"CAST({fn}({e.duck}){flt_d} AS BIGINT)"))
        cols.append(("n", "CAST(COUNT(*) AS BIGINT)", None))
        where = self.pred(t) if self.r.random() < 0.4 else None
        return self._render(cols, t, t, where, group_n=1)

    def nested_agg(self) -> tuple[str, str]:
        """Two-level aggregation through a derived table: the outer
        aggregate consumes the inner's computed columns, exercising type
        propagation (BIGINT counts, exact-mean doubles) across a subquery
        boundary."""
        t = self.r.choice(list(SCHEMAS))
        k1 = self.group_key(t)
        k2 = self.group_key(t)
        e = self.int_expr(t, 1)
        where = self.pred(t) if self.r.random() < 0.6 else None
        inner_s = (f"SELECT {k1.spark} AS i0, {k2.spark} AS i1, "
                   f"CAST(COUNT(*) AS BIGINT) AS c, "
                   f"CAST(SUM({e.spark}) AS BIGINT) AS s FROM {t}")
        inner_d = (f"SELECT {k1.duck} AS i0, {k2.duck} AS i1, "
                   f"CAST(COUNT(*) AS BIGINT) AS c, "
                   f"CAST(SUM({e.duck}) AS BIGINT) AS s FROM {t}")
        if where is not None:
            inner_s += f" WHERE {where.spark}"
            inner_d += f" WHERE {where.duck}"
        inner_s += " GROUP BY 1, 2"
        inner_d += " GROUP BY 1, 2"
        outer_agg = self.r.choice(["sum", "minmax", "mean"])
        if outer_agg == "sum":
            oa = "CAST(SUM(c) AS BIGINT)"
        elif outer_agg == "minmax":
            oa = f"CAST({self.r.choice(['MIN', 'MAX'])}(s) AS BIGINT)"
        else:  # exact int sum through one IEEE divide (R4)
            oa = "(CAST(SUM(s) AS DOUBLE) / COUNT(*))"
        having = ""
        if self.r.random() < 0.4:
            having = f" HAVING COUNT(*) > {self.r.randint(1, 5)}"
        tmpl = ("SELECT i0 AS k0, {oa} AS a0, CAST(COUNT(*) AS BIGINT) AS n "
                "FROM ({inner}) sub GROUP BY 1{having}")
        return (
            tmpl.format(oa=oa, inner=inner_s, having=having),
            tmpl.format(oa=oa, inner=inner_d, having=having),
        )

    def scalar_select(self) -> tuple[str, str]:
        """Correlated scalar subquery in the SELECT list through an FK
        edge. COUNT(*) over an empty correlated set is the classic
        decorrelation corner (the 'COUNT bug': naive rewrite to a join
        yields NULL where the semantics demand 0) — both engines must
        produce 0; MIN/MAX must produce NULL."""
        lt, lc, rt, rc = self.r.choice(FKS)
        p2 = self.pred(rt, 1)
        kind = self.r.choice(["count", "minmax"])
        if kind == "count":
            agg_s = agg_d = "CAST(COUNT(*) AS BIGINT)"
        else:
            e = self.int_expr(rt, 1)
            fn = self.r.choice(["MIN", "MAX"])
            agg_s = f"CAST({fn}({e.spark}) AS BIGINT)"
            agg_d = f"CAST({fn}({e.duck}) AS BIGINT)"
        sub_s = (f"(SELECT {agg_s} FROM {rt} WHERE {rt}.{rc} = {lt}.{lc}"
                 f" AND {p2.spark})")
        sub_d = (f"(SELECT {agg_d} FROM {rt} WHERE {rt}.{rc} = {lt}.{lc}"
                 f" AND {p2.duck})")
        where = self.pred(lt) if self.r.random() < 0.6 else None
        q_s = f"SELECT {lt}.{lc} AS c0, {sub_s} AS c1 FROM {lt}"
        q_d = f"SELECT {lt}.{lc} AS c0, {sub_d} AS c1 FROM {lt}"
        if where is not None:
            q_s += f" WHERE {where.spark}"
            q_d += f" WHERE {where.duck}"
        return q_s, q_d

    def rollup_over_join(self) -> tuple[str, str]:
        """Super-aggregate over an FK join: ROLLUP keys drawn from BOTH
        sides of the join, so the grand-total row aggregates the joined
        multiplicity. R12 fence applies (the WHERE can empty the join)."""
        lt, lc, rt, rc = self.r.choice(FKS)
        frm = f"{lt} JOIN {rt} ON {lt}.{lc} = {rt}.{rc}"
        k1 = self.group_key(lt)
        k2 = self.group_key(rt)
        if k1.spark == k2.spark:
            return self.join_agg()
        cols: list[tuple[str, str, str | None]] = [
            ("k0", k1.spark, None),
            ("k1", k2.spark, None),
            ("g0", f"CAST(GROUPING({k1.spark}) AS INT)", None),
            ("g1", f"CAST(GROUPING({k2.spark}) AS INT)", None),
        ]
        cols += self.aggs(lt, 1)
        where = self.pred(lt) if self.r.random() < 0.5 else None
        sel_s = ", ".join(f"{s} AS {a}" for a, s, _ in cols)
        sel_d = ", ".join(f"{d if d is not None else s} AS {a}"
                          for a, s, d in cols)
        q_s = f"SELECT {sel_s} FROM {frm}"
        q_d = f"SELECT {sel_d} FROM {frm}"
        if where is not None:
            q_s += f" WHERE {where.spark}"
            q_d += f" WHERE {where.duck}"
        tail = (f" GROUP BY ROLLUP({k1.spark}, {k2.spark})"
                f" HAVING COUNT(*) > 0")  # R12
        return q_s + tail, q_d + tail

    def window_over_join(self) -> tuple[str, str]:
        """Window function over a join result: the frame's partition and
        order must survive the join's multiplicity. Positional order uses
        the FACT side's unique key (R11) — only chains whose left side
        has one (lineitem excluded) — made total again by the join being
        at most 1:1 from fact to dim."""
        lt, lc, rt, rc = self.r.choice(
            [f for f in FKS if f[0] in UNIQUE_KEYS]
        )
        uk = f"{lt}.{UNIQUE_KEYS[lt]}"
        frm = f"{lt} JOIN {rt} ON {lt}.{lc} = {rt}.{rc}"
        part_key = self.group_key(rt)  # dim-side partition
        e = self.int_expr(lt, 1)
        kind = self.r.choice(["row_number", "running_sum", "part_minmax"])
        if kind == "row_number":
            w_s = w_d = (f"ROW_NUMBER() OVER (PARTITION BY {part_key.spark} "
                         f"ORDER BY {uk})")
        elif kind == "running_sum":
            frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            w_s = (f"CAST(SUM({e.spark}) OVER (PARTITION BY {part_key.spark}"
                   f" ORDER BY {uk} {frame}) AS BIGINT)")
            w_d = (f"CAST(SUM({e.duck}) OVER (PARTITION BY {part_key.duck}"
                   f" ORDER BY {uk} {frame}) AS BIGINT)")
        else:
            fn = self.r.choice(["MIN", "MAX"])
            w_s = (f"CAST({fn}({e.spark}) OVER "
                   f"(PARTITION BY {part_key.spark}) AS BIGINT)")
            w_d = (f"CAST({fn}({e.duck}) OVER "
                   f"(PARTITION BY {part_key.duck}) AS BIGINT)")
        cols = [("k0", f"({uk})", None), ("w0", w_s, w_d)]
        where = self.pred(lt) if self.r.random() < 0.5 else None
        return self._render(cols, frm, frm, where)

    def order_limit(self) -> tuple[str, str]:
        """ORDER BY a verified-unique key + LIMIT / OFFSET: the top-k
        scan path. Determinism needs the total order to be genuinely
        total (R11's lesson), so the sort key is always the table's
        UNIQUE_KEYS entry, optionally negated for DESC; the projected
        payload exercises the expression grammar."""
        t = self.r.choice(list(UNIQUE_KEYS))
        uk = UNIQUE_KEYS[t]
        e1 = self.int_expr(t)
        e2 = self.str_expr(t)
        cols_s = f"{uk} AS k0, {e1.spark} AS c1, {e2.spark} AS c2"
        cols_d = f"{uk} AS k0, {e1.duck} AS c1, {e2.duck} AS c2"
        where = self.pred(t) if self.r.random() < 0.5 else None
        direction = self.r.choice(["ASC", "DESC"])
        k = self.r.randint(1, 40)
        off = f" OFFSET {self.r.randint(1, 20)}" if self.r.random() < 0.4 else ""
        q_s = f"SELECT {cols_s} FROM {t}"
        q_d = f"SELECT {cols_d} FROM {t}"
        if where is not None:
            q_s += f" WHERE {where.spark}"
            q_d += f" WHERE {where.duck}"
        tail = f" ORDER BY {uk} {direction} LIMIT {k}{off}"
        return q_s + tail, q_d + tail

    def exists_filter(self) -> tuple[str, str]:
        """Correlated EXISTS / NOT EXISTS through an FK edge."""
        lt, lc, rt, rc = self.r.choice(FKS)
        neg = "NOT " if self.r.random() < 0.4 else ""
        p2 = self.pred(rt, 1)
        e = self.int_expr(lt, 1)
        sub_s = (f"SELECT 1 FROM {rt} WHERE {rt}.{rc} = {lt}.{lc}"
                 f" AND {p2.spark}")
        sub_d = (f"SELECT 1 FROM {rt} WHERE {rt}.{rc} = {lt}.{lc}"
                 f" AND {p2.duck}")
        return (
            f"SELECT {lt}.{lc} AS c0, {e.spark} AS c1 FROM {lt} "
            f"WHERE {neg}EXISTS ({sub_s})",
            f"SELECT {lt}.{lc} AS c0, {e.duck} AS c1 FROM {lt} "
            f"WHERE {neg}EXISTS ({sub_d})",
        )

    def setop(self) -> tuple[str, str]:
        t = self.r.choice(list(SCHEMAS))
        op = self.r.choice(["UNION ALL", "UNION", "INTERSECT ALL", "EXCEPT ALL"])
        e1, e2 = self.int_expr(t), self.str_expr(t)
        p1, p2 = self.pred(t), self.pred(t)
        b_s = f"SELECT {e1.spark} AS c0, {e2.spark} AS c1 FROM {t}"
        b_d = f"SELECT {e1.duck} AS c0, {e2.duck} AS c1 FROM {t}"
        return (
            f"{b_s} WHERE {p1.spark} {op} {b_s} WHERE {p2.spark}",
            f"{b_d} WHERE {p1.duck} {op} {b_d} WHERE {p2.duck}",
        )

    def frame_spec(self) -> tuple[str, str]:
        """Window FRAME specs (R18, the W15/W20 discipline): bounded ROWS
        frames over a verified-unique order (R11), and RANGE frames with
        numeric offsets over ANY int expression — value-based peers make
        RANGE tie-stable where ROWS would legitimately diverge."""
        t = self.r.choice(list(UNIQUE_KEYS))
        uk = UNIQUE_KEYS[t]
        part = ""
        if self.r.random() < 0.5:
            k = self.group_key(t)
            part = f"PARTITION BY {k.spark} "  # group_key is shared-text
        e = self.int_expr(t, 1)
        fn = self.r.choice(["SUM", "MIN", "MAX", "COUNT"])
        arg_s = "*" if fn == "COUNT" else e.spark
        arg_d = "*" if fn == "COUNT" else e.duck
        if self.r.random() < 0.5:
            # ROWS: positional, so ORDER BY the unique key (R11)
            lo = self.r.choice(["UNBOUNDED PRECEDING",
                                f"{self.r.randint(1, 5)} PRECEDING",
                                "CURRENT ROW"])
            hi = (f"{self.r.randint(1, 4)} FOLLOWING"
                  if self.r.random() < 0.6 else "CURRENT ROW")
            if lo == "CURRENT ROW" and hi == "CURRENT ROW":
                lo = "1 PRECEDING"
            frame = f"ORDER BY {uk} ROWS BETWEEN {lo} AND {hi}"
            w_s = f"{fn}({arg_s}) OVER ({part}{frame})"
            w_d = f"{fn}({arg_d}) OVER ({part}{frame})"
        else:
            # RANGE: value-based — tie-stable over a NON-unique ordering
            oc = self.r.choice(SCHEMAS[t]["int"])
            lo = self.r.choice(["UNBOUNDED PRECEDING",
                                f"{self.r.randint(1, 500)} PRECEDING",
                                "CURRENT ROW"])
            hi = (f"{self.r.randint(1, 500)} FOLLOWING"
                  if self.r.random() < 0.6 else "CURRENT ROW")
            if lo == "CURRENT ROW" and hi == "CURRENT ROW":
                lo = f"{self.r.randint(1, 500)} PRECEDING"
            frame = f"ORDER BY {oc} RANGE BETWEEN {lo} AND {hi}"
            w_s = f"{fn}({arg_s}) OVER ({part}{frame})"
            w_d = f"{fn}({arg_d}) OVER ({part}{frame})"
        cols = [("k0", f"({uk})", None),
                ("w0", f"CAST({w_s} AS BIGINT)", f"CAST({w_d} AS BIGINT)")]
        where = self.pred(t) if self.r.random() < 0.5 else None
        return self._render(cols, t, t, where)

    def frame_spec_api(self) -> tuple[str, str]:
        """R18 frames dual-rendered through the REAL WindowSpec API
        (r10 verdict #6a): same dialect rules as frame_spec, but the
        third leg builds the frame with ``Window.partitionBy/orderBy/
        rowsBetween/rangeBetween`` builders instead of F.expr-ing one
        OVER(...) text — so frame-BOUNDARY resolution (negative offsets,
        the unboundedPreceding/currentRow sentinels, rangeBetween's
        single-numeric-order requirement) runs through WindowSpec code
        paths the text leg never touches. SQL legs still compare Spark
        vs DuckDB; the API leg must match both."""
        t = self.r.choice(list(UNIQUE_KEYS))
        uk = UNIQUE_KEYS[t]
        part = self.group_key(t) if self.r.random() < 0.5 else None
        e = self.int_expr(t, 1)
        fn = self.r.choice(["SUM", "MIN", "MAX", "COUNT"])
        rows_mode = self.r.random() < 0.5
        if rows_mode:
            order_c = uk  # positional frame: verified-unique order (R11)
            lo = self.r.choice([None, -self.r.randint(1, 5), 0])
            hi = self.r.randint(1, 4) if self.r.random() < 0.6 else 0
            if lo == 0 and hi == 0:
                lo = -1
        else:
            # value frame: tie-stable over ANY int column (R18)
            order_c = self.r.choice(SCHEMAS[t]["int"])
            lo = self.r.choice([None, -self.r.randint(1, 500), 0])
            hi = self.r.randint(1, 500) if self.r.random() < 0.6 else 0
            if lo == 0 and hi == 0:
                lo = -self.r.randint(1, 500)

        def bound(n: int | None) -> str:
            if n is None:
                return "UNBOUNDED PRECEDING"
            if n == 0:
                return "CURRENT ROW"
            return f"{-n} PRECEDING" if n < 0 else f"{n} FOLLOWING"

        kw = "ROWS" if rows_mode else "RANGE"
        frame = f"ORDER BY {order_c} {kw} BETWEEN {bound(lo)} AND {bound(hi)}"
        part_s = f"PARTITION BY {part.spark} " if part is not None else ""
        part_d = f"PARTITION BY {part.duck} " if part is not None else ""
        arg_s = "*" if fn == "COUNT" else e.spark
        arg_d = "*" if fn == "COUNT" else e.duck
        cols = [
            ("k0", f"({uk})", None),
            ("w0", f"CAST({fn}({arg_s}) OVER ({part_s}{frame}) AS BIGINT)",
                   f"CAST({fn}({arg_d}) OVER ({part_d}{frame}) AS BIGINT)"),
        ]
        where = self.pred(t) if self.r.random() < 0.5 else None
        q = self._render(cols, t, t, where)
        where_s = where.spark if where is not None else None
        part_txt = part.spark if part is not None else None
        arg_txt = None if fn == "COUNT" else e.spark

        def build(spark, t=t, uk=uk, part_txt=part_txt, order_c=order_c,
                  rows_mode=rows_mode, lo=lo, hi=hi, fn=fn,
                  arg_txt=arg_txt, where_s=where_s):
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            df = spark.table(t)
            if where_s is not None:
                df = df.filter(F.expr(where_s))
            w = (Window.partitionBy(F.expr(part_txt))
                 if part_txt is not None else Window.partitionBy())
            w = w.orderBy(F.expr(order_c))
            lo_b = Window.unboundedPreceding if lo is None else lo
            w = w.rowsBetween(lo_b, hi) if rows_mode else w.rangeBetween(lo_b, hi)
            wc = (F.count(F.lit(1)) if fn == "COUNT"
                  else getattr(F, fn.lower())(F.expr(arg_txt)))
            return df.select(
                F.expr(uk).alias("k0"),
                wc.over(w).cast("bigint").alias("w0"),
            )

        self.df_builder = build  # replace the F.expr-text program
        return q

    def overflow_arith(self) -> tuple[str, str]:
        """Wide integer arithmetic near/past int64 (R17, the g58 class):
        SUMs of cents-products whose true magnitude breaks both the
        int64 accumulator (Spark ANSI: overflow error; DuckDB: silent
        HUGEINT widening) and the 2^53 canon fence. The portable exact
        form is an explicit DECIMAL(38,0) widening before the multiply,
        rendered digit-exact as STRING."""
        t = self.r.choice(["lineitem", "orders", "customer",
                           "supplier", "part"])
        money = SCHEMAS[t]["money"]
        ca = self.r.choice(money)
        cb = self.r.choice(money)  # may equal ca: the cents^2 g51 class
        cents_a = f"CAST(round({ca} * 100, 0) AS BIGINT)"
        cents_b = f"CAST(round({cb} * 100, 0) AS BIGINT)"
        wide = f"SUM(CAST({cents_a} AS DECIMAL(38,0)) * {cents_b})"
        cols: list[tuple[str, str, str | None]] = []
        nk = 0
        if self.r.random() < 0.6:
            k = self.group_key(t)
            cols.append(("k0", k.spark, k.duck))
            nk = 1
        cols.append(("a0", f"CAST({wide} AS STRING)",
                     f"CAST({wide} AS VARCHAR)"))
        if self.r.random() < 0.5:
            cols.append(("a1", "CAST(COUNT(*) AS BIGINT)", None))
        where = self.pred(t) if self.r.random() < 0.5 else None
        return self._render(cols, t, t, where, group_n=nk)

    def ts_arith(self) -> tuple[str, str]:
        """Timestamp / timezone expressions (R13-R16, the f57 class):
        truncation, interval arithmetic, day differences, epoch
        rendering, IANA zone conversion, ISO weekday, last_day — each
        spelling pair verified live on both engines before encoding."""
        t = self.r.choice(["orders", "lineitem"])
        c = self.r.choice(SCHEMAS[t]["ts"])
        kind = self.r.choice(["trunc", "interval", "datediff", "epoch",
                              "tz", "isodow", "last_day"])
        if kind == "trunc":
            u = self.r.choice(["year", "quarter", "month", "week", "day",
                               "hour"])
            s = f"date_trunc('{u}', {c})"
            # R13: DuckDB yields DATE at day-and-coarser units
            d = f"CAST(date_trunc('{u}', {c}) AS TIMESTAMP)"
            e = _E(s, d, "ts")
        elif kind == "interval":
            n = self.r.randint(1, 400)
            u = self.r.choice(["DAY", "HOUR", "MONTH", "YEAR"])
            op = self.r.choice(["+", "-"])
            e = _shared(f"({c} {op} INTERVAL {n} {u})", "ts")
        elif kind == "datediff":
            lit = self.r.choice(["1993-01-01", "1995-06-17", "1997-03-01"])
            if self.r.random() < 0.5:  # R14: flipped argument order
                s = (f"CAST(datediff(CAST({c} AS DATE), DATE '{lit}') "
                     f"AS BIGINT)")
                d = (f"CAST(date_diff('day', DATE '{lit}', "
                     f"CAST({c} AS DATE)) AS BIGINT)")
            else:
                s = (f"CAST(datediff(DATE '{lit}', CAST({c} AS DATE)) "
                     f"AS BIGINT)")
                d = (f"CAST(date_diff('day', CAST({c} AS DATE), "
                     f"DATE '{lit}') AS BIGINT)")
            e = _E(s, d, "int")
        elif kind == "epoch":  # R15: digit-exact past 2^53
            e = _E(f"CAST(unix_micros({c}) AS STRING)",
                   f"CAST(epoch_us({c}) AS VARCHAR)", "str")
        elif kind == "tz":  # R16: pinned naive -> UTC -> zone
            tz = self.r.choice(["America/New_York", "Asia/Kolkata",
                                "Europe/London", "Australia/Sydney",
                                "America/Sao_Paulo"])
            e = _E(
                f"date_format(convert_timezone('UTC', '{tz}', {c}), "
                f"'yyyy-MM-dd HH:mm:ss')",
                f"strftime(timezone('{tz}', timezone('UTC', {c})), "
                f"'%Y-%m-%d %H:%M:%S')",
                "str",
            )
        elif kind == "isodow":
            e = _E(f"CAST(weekday({c}) + 1 AS INT)",
                   f"CAST(isodow({c}) AS INT)", "int")
        else:
            e = _shared(f"last_day({c})", "date")
        cols = [("c0", e.spark, e.duck)]
        if self.r.random() < 0.5:
            e2 = self.int_expr(t, 1)
            cols.append(("c1", e2.spark, e2.duck))
        where = self.pred(t) if self.r.random() < 0.5 else None
        return self._render(cols, t, t, where)

    def setop_null(self) -> tuple[str, str]:
        """INTERSECT / EXCEPT [ALL] / UNION [ALL] with PLANTED NULL rows
        (r8 verdict #6d): both branches NULLIF-inject into both columns,
        so the set-op's NULL-equality semantics (NULL matches NULL in
        set ops, unlike =) are actually exercised every seed — the base
        setop template only sees NULLs when the expression grammar
        happens to emit one."""
        t = self.r.choice(list(SCHEMAS))
        s = SCHEMAS[t]
        sc = self.r.choice(s["str"])
        ic = self.r.choice(s["int"])
        m = self.r.randint(2, 9)
        plant_s = f"NULLIF(substring({sc}, 1, 1), '{self.r.choice(_STR_LITS[:6])[:1]}')"
        plant_i = f"NULLIF(({ic} % {m}), {self.r.randint(0, m - 1)})"
        op = self.r.choice(["UNION", "UNION ALL", "INTERSECT",
                            "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"])
        p1, p2 = self.pred(t), self.pred(t)
        b = f"SELECT {plant_s} AS c0, {plant_i} AS c1 FROM {t}"
        return (
            f"{b} WHERE {p1.spark} {op} {b} WHERE {p2.spark}",
            f"{b} WHERE {p1.duck} {op} {b} WHERE {p2.duck}",
        )

    def rollup_empty(self) -> tuple[str, str]:
        """Super-aggregate over a PROVABLY EMPTY input, unfenced — keeps
        the R12 divergence itself under randomized test (r8 ADVICE #2).
        Spark emits zero rows; the standard (DuckDB) emits exactly the
        grand-total row (keys NULL, GROUPING()=1, COUNT(*)=0, SUM NULL).
        The DuckDB side subtracts that expected row via EXCEPT ALL, so
        the pair matches IFF the asymmetry holds in exactly its known
        shape — any drift in either engine (Spark emitting the row,
        DuckDB changing its values, GROUPING() flipping on the
        grand-total) re-surfaces as a divergent seed."""
        t = self.r.choice(list(SCHEMAS))
        k1 = self.group_key(t)
        k2 = self.group_key(t)
        for _ in range(5):
            if k2.spark != k1.spark:
                break
            k2 = self.group_key(t)
        if k2.spark == k1.spark:
            return self.group_agg()
        # provably-empty predicates over the fixtures: keys are
        # non-negative; the sentinel string never occurs
        opts = ["1 = 0"]
        if t in UNIQUE_KEYS:
            opts.append(f"{UNIQUE_KEYS[t]} < 0")
        if SCHEMAS[t]["str"]:
            c = self.r.choice(SCHEMAS[t]["str"])
            opts.append(f"{c} = 'ZZZ_NO_SUCH_VALUE'")
        empty_where = self.r.choice(opts)
        form = self.r.choice(["ROLLUP", "CUBE", "SETS"])
        if form == "SETS":
            grp = (f"GROUPING SETS (({k1.spark}, {k2.spark}), "
                   f"({k1.spark}), ())")
        else:
            grp = f"{form}({k1.spark}, {k2.spark})"
        e = self.int_expr(t, 1)
        sel = (f"{k1.spark} AS k0, {k2.spark} AS k1, "
               f"CAST(GROUPING({k1.spark}) AS INT) AS g0, "
               f"CAST(GROUPING({k2.spark}) AS INT) AS g1, "
               f"CAST(COUNT(*) AS BIGINT) AS a0")
        sel_s = sel + f", CAST(SUM({e.spark}) AS BIGINT) AS a1"
        sel_d = sel + f", CAST(SUM({e.duck}) AS BIGINT) AS a1"
        body_s = (f"SELECT {sel_s} FROM {t} WHERE {empty_where} "
                  f"GROUP BY {grp}")
        body_d = (f"SELECT {sel_d} FROM {t} WHERE {empty_where} "
                  f"GROUP BY {grp}")
        duck_ty = {"str": "VARCHAR", "int": "BIGINT", "date": "DATE"}
        nk1 = f"CAST(NULL AS {duck_ty[k1.typ]})"
        nk2 = f"CAST(NULL AS {duck_ty[k2.typ]})"
        expected = (f"SELECT {nk1}, {nk2}, 1, 1, CAST(0 AS BIGINT), "
                    f"CAST(NULL AS BIGINT)")
        return body_s, f"{body_d} EXCEPT ALL {expected}"

    def query(self) -> tuple[str, str]:
        kind = self.r.choices(
            ["filter_project", "group_agg", "join_agg", "setop", "window",
             "exists_filter", "rollup_agg", "agg_filter", "nested_agg",
             "scalar_select", "join3_agg", "order_limit",
             "rollup_over_join", "window_over_join",
             "frame_spec", "overflow_arith", "ts_arith", "setop_null",
             "rollup_empty", "frame_spec_api"],
            weights=[3, 4, 3, 2, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2,
                     2, 2, 2, 2, 1, 2],
        )[0]
        return getattr(self, kind)()


def generate(seed: int) -> tuple[str, str]:
    """(spark_sql, duck_sql) for one seed — deterministic."""
    return QueryGen(seed).query()


def run_seed(spark, con, seed: int) -> dict:
    """Execute one generated seed on both engines (and, for single-table
    shapes, a THIRD time through the DataFrame API — r9 verdict #6);
    harness-canon compare across all legs."""
    from pydatalake_gen2_spark.harness import canon_rows

    gen = QueryGen(seed)
    s_sql, d_sql = gen.query()
    out = {"seed": seed, "spark_sql": s_sql, "duck_sql": d_sql}
    try:
        sdf = spark.sql(s_sql)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001 — an engine error IS a finding
        out["status"] = "SPARK_ERROR"
        out["detail"] = f"{type(e).__name__}: {str(e)[:300]}"
        return out
    try:
        dres = con.execute(d_sql)
        d_cols = [d[0].lower() for d in dres.description]
        d_rows = dres.fetchall()
    except Exception as e:  # noqa: BLE001
        out["status"] = "DUCK_ERROR"
        out["detail"] = f"{type(e).__name__}: {str(e)[:300]}"
        return out
    if sorted(s_cols) != sorted(d_cols):
        out["status"] = "COL_MISMATCH"
        out["detail"] = f"spark={sorted(s_cols)} duck={sorted(d_cols)}"
        return out
    sm, dm = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if sm != dm:
        out["status"] = "VALUE_MISMATCH"
        only_s = list((sm - dm).items())[:3]
        only_d = list((dm - sm).items())[:3]
        out["detail"] = f"only_spark={only_s} only_duck={only_d}"
        return out
    # Third leg: the DataFrame-API rendering of the same seed must agree
    # with the SQL rendering (and therefore with DuckDB). Catches
    # API-vs-SQL resolution drift that two-engine SQL comparison cannot.
    if gen.df_builder is not None:
        try:
            adf = gen.df_builder(spark)
            a_cols = [c.lower() for c in adf.columns]
            a_rows = [tuple(r) for r in adf.collect()]
        except Exception as e:  # noqa: BLE001 — an API-leg error IS a finding
            out["status"] = "API_ERROR"
            out["detail"] = f"{type(e).__name__}: {str(e)[:300]}"
            return out
        if sorted(a_cols) != sorted(s_cols):
            out["status"] = "API_COL_MISMATCH"
            out["detail"] = f"api={sorted(a_cols)} sql={sorted(s_cols)}"
            return out
        am = canon_rows(a_cols, a_rows)
        if am != sm:
            out["status"] = "API_MISMATCH"
            only_a = list((am - sm).items())[:3]
            only_s2 = list((sm - am).items())[:3]
            out["detail"] = f"only_api={only_a} only_sql={only_s2}"
            return out
        out["api_leg"] = True
    out["status"] = "match"
    out["rows"] = len(s_rows)
    return out


# ---------------------------------------------------------------------------
# Streaming differential family (r10 verdict #6b): randomized watermark-free
# windowed aggregation over events, BATCH leg vs STREAM leg through the
# replay harness — the one surface the relational grammar never touched.
# ---------------------------------------------------------------------------


def gen_stream_plan(seed: int):
    """Deterministic generator for one streaming seed: returns
    (meta, plan) where ``plan(src) -> DataFrame`` applies the SAME
    declarative windowed aggregation to a batch table OR a streaming
    source. Dialect-style rules keeping the compare sound (each verified
    live before encoding, the R-rule discipline):

    SR1 Watermark-FREE + complete output mode: no late-data drop path,
        so the final streamed state is exactly the batch aggregation
        regardless of micro-batch cut points.
    SR2 Order-insensitive aggregates only: COUNT, exact DECIMAL(18,4)
        SUM (cast to double once, at output), MIN/MAX. Raw float64 SUM
        is excluded — its value depends on accumulation order, which
        differs between one batch pass and 4 incremental state merges.
    SR3 Window starts render as formatted strings (the tumbling_agg
        discipline) so TZ-naive timestamps compare textually.
    SR4 Grouping keys and filters are row-local expressions available
        identically on both legs (event_type, user_id buckets,
        event_id/value predicates)."""
    r = random.Random(seed ^ 0x5EED)
    dur = r.choice([5, 10, 15, 20, 30, 60])
    slide = None
    if r.random() < 0.35:
        divs = [m for m in (5, 10, 15, 30) if m < dur and dur % m == 0]
        if divs:
            slide = r.choice(divs)
    keys: list[str] = []
    if r.random() < 0.7:
        keys.append("event_type")
    if r.random() < 0.35:
        keys.append(f"user_id % {r.randint(2, 7)}")
    roll = r.random()
    if roll < 0.3:
        m = r.randint(2, 5)
        filt = f"event_id % {m} = {r.randint(0, m - 1)}"
    elif roll < 0.5:
        filt = f"value >= {r.randint(1, 50)}"
    else:
        filt = None
    agg_kinds = ["count"]
    if r.random() < 0.8:
        agg_kinds.append("decsum")
    if r.random() < 0.4:
        agg_kinds.append("max_eid")
    if r.random() < 0.3:
        agg_kinds.append("min_value")
    with_end = r.random() < 0.3

    def plan(src):
        from pyspark.sql import functions as F

        df = src
        if filt is not None:
            df = df.filter(F.expr(filt))
        wcol = (F.window("ts", f"{dur} minutes", f"{slide} minutes")
                if slide else F.window("ts", f"{dur} minutes"))
        gcols = [wcol.alias("w")] + [
            F.expr(k).alias(f"k{i}") for i, k in enumerate(keys)
        ]
        aggs = []
        for kind in agg_kinds:
            if kind == "count":
                aggs.append(F.count(F.lit(1)).alias("n"))
            elif kind == "decsum":
                aggs.append(
                    F.sum(F.col("value").cast("decimal(18,4)"))
                    .cast("double").alias("sum_value")
                )
            elif kind == "max_eid":
                aggs.append(F.max("event_id").alias("max_eid"))
            else:
                aggs.append(F.min("value").alias("min_value"))
        out = df.groupBy(*gcols).agg(*aggs)
        sel = [
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("w_start")
        ]
        if with_end:
            sel.append(
                F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("w_end")
            )
        sel += [F.col(f"k{i}") for i in range(len(keys))]
        names = {"count": "n", "decsum": "sum_value",
                 "max_eid": "max_eid", "min_value": "min_value"}
        sel += [F.col(names[k]) for k in agg_kinds]
        return out.select(*sel)

    meta = {"seed": seed, "dur": dur, "slide": slide, "keys": keys,
            "filter": filt, "aggs": agg_kinds, "with_end": with_end}
    return meta, plan


def run_stream_seed(spark, sf_dir: str, seed: int) -> dict:
    """Execute one streaming seed: the generated plan over the batch
    events table vs the same plan over the 4-chunk file-replay stream
    (maxFilesPerTrigger=1, complete mode, availableNow) — canon-compare
    the final state against the batch result."""
    from pydatalake_gen2_spark.harness import canon_rows
    from pydatalake_gen2_spark.streaming.replay import (
        _run_to_memory,
        read_stream,
    )
    from pydatalake_gen2_spark.tables import load_table

    meta, plan = gen_stream_plan(seed)
    out = dict(meta)
    batch = plan(load_table(spark, sf_dir, "events"))
    b_cols = [c.lower() for c in batch.columns]
    b_rows = [tuple(r) for r in batch.collect()]
    name = f"fz_stream_{seed}"
    try:
        _run_to_memory(plan(read_stream(spark, sf_dir)), name, "complete")
        sdf = spark.table(name)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001 — a stream-leg error IS a finding
        out["status"] = "STREAM_ERROR"
        out["detail"] = f"{type(e).__name__}: {str(e)[:300]}"
        return out
    finally:
        try:
            spark.catalog.dropTempView(name)
        except Exception:  # noqa: BLE001 — sink never materialized
            pass
    if sorted(s_cols) != sorted(b_cols):
        out["status"] = "COL_MISMATCH"
        out["detail"] = f"stream={sorted(s_cols)} batch={sorted(b_cols)}"
        return out
    sm, bm = canon_rows(s_cols, s_rows), canon_rows(b_cols, b_rows)
    if sm != bm:
        out["status"] = "VALUE_MISMATCH"
        only_s = list((sm - bm).items())[:3]
        only_b = list((bm - sm).items())[:3]
        out["detail"] = f"only_stream={only_s} only_batch={only_b}"
        return out
    out["status"] = "match"
    out["rows"] = len(b_rows)
    return out


def main() -> int:  # pragma: no cover — dev CLI
    import sys

    from pydatalake_gen2_spark.harness import duck_connect
    from pydatalake_gen2_spark.registry import ensure_views
    from pydatalake_gen2_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    spark = get_spark("fuzz")
    ensure_views(spark, sf_dir)
    con = duck_connect(sf_dir)
    bad = 0
    for seed in range(start, start + n):
        r = run_seed(spark, con, seed)
        if r["status"] != "match":
            bad += 1
            print(f"FAIL seed={seed} {r['status']}\n  spark: {r['spark_sql']}\n"
                  f"  duck:  {r['duck_sql']}\n  {r.get('detail', '')}")
    print(f"\n{n - bad}/{n} match")
    return 1 if bad else 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
