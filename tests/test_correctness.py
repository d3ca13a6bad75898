"""t2 mirror: every registered tier-H QueryPair must hash-match DuckDB
at sf0.001 (the driver runs the same compare at sf0.01)."""

from __future__ import annotations

import pytest

from pydatalake_gen2_spark.harness import run_pair
from pydatalake_gen2_spark.registry import load_all


def _names():
    return sorted(load_all().keys())


@pytest.mark.parametrize("name", _names())
def test_pair(spark, duck, sf_dir, name):
    res = run_pair(spark, duck, sf_dir, name)
    assert res["status"] in ("match", "rows_only"), res
    assert res["spark_rows"] >= 0


def test_no_complex_typed_outputs(spark, sf_dir):
    """Driver-gate shape contract: the external canonicalizer pandas-sorts
    and hashes result cells, and dies on list/dict cells (round-1 VERDICT:
    f30/f31/f32 TypeError unhashable list). Every registered query with an
    oracle must therefore emit only scalar top-level columns — arrays are
    rendered via array_join/array_to_string inside the pair."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = []
    for name, qp in sorted(load_all().items()):
        if qp.duck_sql is None:
            continue  # rows-only checks never hash cells
        df = qp.spark_fn(spark, sf_dir)
        for f in df.schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


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
            # simhash leg: 15-hex-digit bit build + hamming fence
            "substring(md5(tok), j, 1)) - 1 AS BIGINT)",
            "<< (4 * (15 - j))",
            "bit_count(xor(a.sh, b.sh)) <= 4",
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
