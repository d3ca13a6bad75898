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
