"""t2 mirror: every registered tier-H QueryPair must hash-match DuckDB
at sf0.001 (the driver runs the same compare at sf0.01)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pydatalake_gen2_spark.harness import run_pair
from pydatalake_gen2_spark.registry import load_all


def _names():
    return sorted(load_all().keys())


@pytest.mark.parametrize("name", _names())
def test_pair(spark, duck, sf_dir, name):
    res = run_pair(spark, duck, sf_dir, name)
    assert res["status"] in ("match", "rows_only"), res
    assert res["spark_rows"] >= 0


def _walk_wide_casts(jplan) -> set:
    """Collect (child_type, 'double') for every Cast(decimal(p>=19, s=0)
    -> double) in an analyzed plan, recursing through plan nodes,
    expression trees, and subquery plans via py4j."""
    import re

    hits = set()
    stack = [jplan]
    while stack:
        node = stack.pop()
        try:
            ch = node.children()
            for i in range(ch.size()):
                stack.append(ch.apply(i))
        except Exception:
            pass
        try:
            exprs = node.expressions()
        except Exception:
            continue
        estack = [exprs.apply(i) for i in range(exprs.size())]
        while estack:
            e = estack.pop()
            cls = e.getClass().getSimpleName()
            if cls == "Cast":
                try:
                    dt = e.dataType().simpleString()
                    cdt = e.child().dataType().simpleString()
                    m = re.match(r"decimal\((\d+),(\d+)\)", cdt)
                    if dt == "double" and m and int(m.group(1)) >= 19 \
                            and int(m.group(2)) == 0:
                        hits.add((cdt, dt))
                except Exception:
                    pass
            if "Subquery" in cls or "Exists" in cls or "ListQuery" in cls:
                try:
                    stack.append(e.plan())
                except Exception:
                    pass
            try:
                ech = e.children()
                for i in range(ech.size()):
                    estack.append(ech.apply(i))
            except Exception:
                pass
    return hits


def test_canonicalizer_shape_contract(spark, sf_dir):
    """Driver-gate shape contract, checked over EVERY oracle pair in one
    construction pass (no execution):

    (1) No complex-typed output columns: the external canonicalizer
        pandas-sorts and hashes result cells, and dies on list/dict
        cells (round-1 VERDICT: f30/f31/f32 TypeError unhashable list).
        Arrays are rendered via array_join/array_to_string in the pair.

    (2) No wide integer-decimal OUTPUT columns (DecimalType precision >
        15, scale 0): their values can pass 2^53, where a float64-
        coercing hasher renders Spark's Decimal and DuckDB's int128
        differently even when the values are EQUAL — the round-5 driver
        red row (g51's DECIMAL(38,0) cents^2 sums, ~2^61). Render such
        values as STRING, or keep them < 2^53 via sqlexact.idiv.

    (3) No Cast(decimal(p>=19, s=0) -> double) ANYWHERE in the analyzed
        plan: width >= 19 is DuckDB's int128 storage, whose cast to
        double is NOT correctly rounded (1-ulp drift, observed live on
        g39's 70-bit moments) — a shared-text cast can therefore differ
        per engine even on equal inputs, and a terminal ROUND(6) only
        shrinks the window where the ulp flips a rounding boundary.
        Use sqlexact.dec2dbl (deterministic hi/lo int64 split) or exact
        integer division instead. Width <= 18 scale-0 casts are int64-
        backed in both engines (correctly rounded — deterministic), and
        scaled money casts (e.g. DECIMAL(28,4) revenue) keep their
        unscaled payloads < 2^53 at test scale; both stay allowed.
    """
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    complex_out, wide_out, wide_casts = [], [], []
    for name, qp in sorted(load_all().items()):
        if qp.duck_sql is None:
            continue  # rows-only checks never hash cells
        df = qp.spark_fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                complex_out.append((name, f.name, f.dataType.simpleString()))
            if (
                isinstance(f.dataType, DecimalType)
                and f.dataType.precision > 15
                and f.dataType.scale == 0
            ):
                wide_out.append((name, f.name, f.dataType.simpleString()))
        hits = _walk_wide_casts(df._jdf.queryExecution().analyzed())
        if hits:
            wide_casts.append((name, sorted(hits)))
    assert not complex_out, f"complex-typed outputs: {complex_out}"
    assert not wide_out, f"wide integer-decimal outputs: {wide_out}"
    assert not wide_casts, f"wide-decimal->double casts: {wide_casts}"


def test_float64_exact_fence_unit():
    """The runtime fence must trip on the exact shape that made the
    round-5 driver row red (an integral DECIMAL cell of ~2^61) and on
    >2^53 BIGINTs, and pass the sanctioned renders (STRING, double,
    <=2^53 ints)."""
    from decimal import Decimal

    from pydatalake_gen2_spark.harness import _fence_float64_exact

    with pytest.raises(AssertionError):
        _fence_float64_exact("prefix_g51", ["ss"], [(Decimal(2**61),)])
    with pytest.raises(AssertionError):
        _fence_float64_exact("big_int", ["x"], [(2**53 + 1,)])
    _fence_float64_exact(
        "ok", ["s", "f", "i", "d"], [(str(2**61), 1.5, 2**53, Decimal("1.25"))]
    )
    # round-6 ADVICE item 1: SCALED decimals are fenced on the unscaled
    # payload — a DECIMAL(38,4) money sum whose int128 payload passes
    # 2^53 coerces not-correctly-rounded even though the VALUE is small.
    with pytest.raises(AssertionError):
        _fence_float64_exact(
            "money", ["rev"], [(Decimal(2**54) / Decimal(10_000),)]
        )
    with pytest.raises(AssertionError):  # positive exponent: 92E+15
        _fence_float64_exact("exp", ["x"], [(Decimal("92E+15"),)])
    _fence_float64_exact("ok2", ["rev"], [(Decimal("900719925474.0992"),)])


def test_wide_cast_walker_sentinel(spark):
    """Round-6 ADVICE item 2: the static fence's py4j plan walk wraps
    every accessor in try/except, so Catalyst API drift would make it
    fail OPEN (report zero casts). Assert it still detects a deliberate
    decimal(38,0)->double cast — API drift now fails THIS test loudly."""
    df = spark.range(1).select(
        F.col("id").cast("decimal(38,0)").cast("double").alias("x")
    )
    hits = _walk_wide_casts(df._jdf.queryExecution().analyzed())
    assert ("decimal(38,0)", "double") in hits, (
        "sentinel wide cast not found — the py4j plan-walk API drifted "
        f"and the shape-contract fence is failing open (hits={hits})"
    )
    # and a subquery-buried cast is still found (the recursion leg)
    spark.range(3).createOrReplaceTempView("_sentinel_t")
    df2 = spark.sql(
        "SELECT (SELECT CAST(CAST(max(id) AS DECIMAL(20,0)) AS DOUBLE) "
        "FROM _sentinel_t) AS y"
    )
    hits2 = _walk_wide_casts(df2._jdf.queryExecution().analyzed())
    assert ("decimal(20,0)", "double") in hits2, (
        f"subquery-buried sentinel cast not found (hits={hits2})"
    )


def test_detector_oracle_copies_agree():
    """l49's agreement audit carries private copies of the three detector
    oracle chains (l02b jaccard, l42 simhash, l36 minhash). A threshold /
    bit-layout / shingle edit applied to a detector but not to the audit
    would silently make the audit diverge from what it audits — exactly
    the drift class l49 exists to catch. Guard: the load-bearing
    expression fragments must appear IDENTICALLY in both the detector's
    oracle and l49's copy."""
    from pydatalake_gen2_spark.registry import load_all

    reg = load_all()
    l49 = reg["l49_detector_agreement"].duck_sql
    for src, fragments in {
        # jaccard leg (l02b / l42): 3-gram shingle build + tau fence
        "l42_ensemble_dedup": [
            "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]",
            ">= 0.3",
            # simhash leg: 15-hex-digit bit build (the shared fingerprint
            # recurrence — identical text in detector and audit)
            "substring(md5(tok), j, 1)) - 1 AS BIGINT)",
            "<< (4 * (15 - j))",
            "generate_series(0, 47)",
            "lower(coalesce(text, ''))",
        ],
        # minhash leg (l36): seeded signature + band hash + verify tau
        "l36_minhash_sql": [
            "min(md5('0:' || tok)) AS h0",
            "md5(h0 || h1) AS bh",
            ">= 0.2",
        ],
    }.items():
        det = reg[src].duck_sql
        for frag in fragments:
            assert frag in det, (src, frag)
            assert frag in l49, ("l49", frag)
    # The Hamming-radius fence survives in BOTH, but spelled per form
    # since r10: l42's oracle generates candidates via the exact 5-band
    # pigeonhole (sf1-affordable; tests/test_correctness_extra.py proves
    # banded == all-pairs in DuckDB itself), while l49's audit keeps the
    # brute-force spelling (its corpus slice keeps it affordable).
    assert "bit_count(xor(sha, shb)) <= 4" in reg["l42_ensemble_dedup"].duck_sql
    assert "bit_count(xor(a.sh, b.sh)) <= 4" in l49
