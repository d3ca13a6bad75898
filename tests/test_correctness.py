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
