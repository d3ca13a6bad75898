"""Static dtype-class parity gate: Spark analyzed schema vs DuckDB bind.

Round-10 driver finding: the dq08 oracle left a SimHash fingerprint as
DuckDB HUGEINT (``sum(BIGINT)`` widens), so the output column reached the
driver as DECIMAL128(38,0) while Spark emitted int64 — values
byte-identical, rendering-hash red.  The local canonicalizer's
Decimal→float coercion masked the class from every local gate.  This
module closes the whole CLASS, not just dq08: for every registered
QueryPair it compares the Spark analyzed schema (``df.schema`` — jobless)
against DuckDB's static bind of the oracle (``con.sql(sql)`` — lazy
relation, no execution) and fails any pair whose column TYPE CLASSES
diverge.

Type classes (what the driver's Arrow/string renderer distinguishes):

- ``int``            — all integral widths (int64 renders bare digits)
- ``decimal(s=N)``   — decimal with scale N (scale changes the rendering:
                       ``2126`` vs ``2126.00``); DuckDB HUGEINT ≡
                       ``decimal(s=0)`` because Arrow materializes it as
                       decimal128(38,0)
- ``float``          — float32/float64 (render with a fractional part)
- ``str`` ``bool`` ``date`` ``ts`` ``time`` ``bin`` ``interval`` ``null``
- ``array<...>`` / ``map<...>`` / ``struct<...>`` — recursive

Two engines whose classes match render equal values equally; classes that
diverge (integral vs decimal vs float vs string) can diverge in rendering
even when the VALUES are equal — exactly the dq08 failure.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

_SPARK_SIMPLE: list[tuple[tuple, str]] = [
    ((T.ByteType, T.ShortType, T.IntegerType, T.LongType), "int"),
    ((T.FloatType, T.DoubleType), "float"),
    ((T.StringType,), "str"),
    ((T.BooleanType,), "bool"),
    ((T.DateType,), "date"),
    ((T.TimestampType, T.TimestampNTZType), "ts"),
    ((T.BinaryType,), "bin"),
    ((T.NullType,), "null"),
    ((T.DayTimeIntervalType, T.YearMonthIntervalType), "interval"),
]


def spark_type_class(dt: T.DataType) -> str:
    if isinstance(dt, T.DecimalType):
        return f"decimal(s={dt.scale})"
    for classes, label in _SPARK_SIMPLE:
        if isinstance(dt, classes):
            return label
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_type_class(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return (
            f"map<{spark_type_class(dt.keyType)},"
            f"{spark_type_class(dt.valueType)}>"
        )
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name.lower()}:{spark_type_class(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return f"other:{dt.simpleString()}"


# ---------------------------------------------------------------------------
# DuckDB side (DuckDBPyType from a LAZY relation — bind only, no execution)
# ---------------------------------------------------------------------------

_DUCK_SIMPLE = {
    "tinyint": "int", "smallint": "int", "integer": "int", "bigint": "int",
    "utinyint": "int", "usmallint": "int", "uinteger": "int",
    "ubigint": "int",
    # Arrow materializes HUGEINT as decimal128(38,0) — the dq08 class.
    "hugeint": "decimal(s=0)", "uhugeint": "decimal(s=0)",
    "float": "float", "double": "float",
    "varchar": "str", "char": "str", "enum": "str", "uuid": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts", "timestamp with time zone": "ts",
    "timestamp_s": "ts", "timestamp_ms": "ts", "timestamp_ns": "ts",
    "time": "time", "time with time zone": "time",
    "blob": "bin", "bit": "bin",
    "interval": "interval",
    '"null"': "null", "null": "null", "sqlnull": "null",
}


def duck_type_class(t: Any) -> str:
    tid = t.id
    if tid == "decimal":
        scale = dict(t.children)["scale"]
        return f"decimal(s={scale})"
    if tid in _DUCK_SIMPLE:
        return _DUCK_SIMPLE[tid]
    if tid == "list":
        (_, child), = t.children
        return f"array<{duck_type_class(child)}>"
    if tid == "map":
        children = dict(t.children)
        return (
            f"map<{duck_type_class(children['key'])},"
            f"{duck_type_class(children['value'])}>"
        )
    if tid == "struct":
        inner = ",".join(
            f"{name.lower()}:{duck_type_class(child)}"
            for name, child in t.children
        )
        return f"struct<{inner}>"
    return f"other:{tid}"


# ---------------------------------------------------------------------------
# Pair / registry audit
# ---------------------------------------------------------------------------

def audit_pair(spark, con, sf_dir: str, name: str, sdf=None) -> list[str]:
    """Return per-column class mismatches for one pair ([] = parity).

    Constructs the Spark DataFrame (analyzer only — no job) and binds the
    oracle SQL as a lazy DuckDB relation (no execution).  Columns are
    matched by lower-cased name, order-insensitive, mirroring the
    driver's sort-columns-by-name compare.  Pass ``sdf`` when the
    caller already built the pair's DataFrame (tools/check.py
    --analyze) — only its schema is read, and side-effectful pairs
    (stream drains, versioned-table writes) then construct once, not
    twice.
    """
    from pydatalake_gen2_spark.registry import REGISTRY

    qp = REGISTRY[name]
    if qp.duck_sql is None:
        return []
    if sdf is None:
        sdf = qp.spark_fn(spark, sf_dir)
    s_types = {f.name.lower(): spark_type_class(f.dataType) for f in sdf.schema.fields}
    rel = con.sql(qp.duck_sql)
    d_types = {
        c.lower(): duck_type_class(t) for c, t in zip(rel.columns, rel.types)
    }
    problems = []
    for col in sorted(set(s_types) | set(d_types)):
        sc, dc = s_types.get(col), d_types.get(col)
        if sc is None or dc is None:
            problems.append(f"{col}: present only in "
                            f"{'spark' if dc is None else 'duck'}")
        elif sc != dc:
            problems.append(f"{col}: spark={sc} duck={dc}")
    return problems


def audit_all(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[str]]:
    """Audit every (or the selected) registered pair; returns {name: problems}
    for pairs with at least one mismatch or an audit-time error."""
    from pydatalake_gen2_spark.harness import duck_connect
    from pydatalake_gen2_spark.registry import REGISTRY, load_all

    load_all()
    con = duck_connect(sf_dir)
    out: dict[str, list[str]] = {}
    for name in names or sorted(REGISTRY):
        try:
            problems = audit_pair(spark, con, sf_dir, name)
        except Exception as e:  # noqa: BLE001 — surface every failure class
            problems = [f"AUDIT_ERROR {type(e).__name__}: {str(e)[:300]}"]
        if problems:
            out[name] = problems
    return out
