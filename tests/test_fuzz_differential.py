"""Seeded differential fuzzing: random relational expressions executed on
Spark AND DuckDB must canon-match exactly (r7 verdict #3).

The registry's 550 fixed pairs prove the declared surface; these seeds walk
the UNdeclared dialect / type-coercion space (NULL three-valued logic
through ||, CASE with implicit NULL branches, greatest/least NULL
skipping, DISTINCT over computed columns, HAVING, scalar and correlated
EXISTS subqueries, window functions over partitioned/running frames,
set-op type unification, idiv fencing...). Every construct the generator
can emit follows a documented portability rule (pydatalake_gen2_spark/
fuzz.py module docstring), so a failure here is a real engine divergence
or a falsified rule — both findings.

The fuzzer already earned its keep: seeds 24/84 of the window grammar
caught lag() diverging over ORDER BY l_orderkey*10+l_linenumber — the
fixtures' lineitem carries duplicate (orderkey, linenumber) pairs, so
the "obviously unique" key isn't, and each engine broke ties its own
way (now dialect rule R11: positional window order must be verified
unique). Seeds 0..999 at sf0.001 plus 0..199 at sf0.01 were swept with
the final grammar (all match); CI pins the first 200 as the per-session
gate.
"""

from __future__ import annotations

from pydatalake_gen2_spark.fuzz import run_seed
from pydatalake_gen2_spark.harness import duck_connect
from pydatalake_gen2_spark.registry import ensure_views

N_SEEDS = 200


def test_differential_fuzz_200_seeds(spark, sf_dir):
    ensure_views(spark, sf_dir)
    con = duck_connect(sf_dir)
    failures = []
    for seed in range(N_SEEDS):
        r = run_seed(spark, con, seed)
        if r["status"] != "match":
            failures.append(
                f"seed={seed} {r['status']}\n  spark: {r['spark_sql']}\n"
                f"  duck:  {r['duck_sql']}\n  {r.get('detail', '')}"
            )
    assert not failures, f"{len(failures)} divergent seeds:\n" + "\n".join(
        failures[:10]
    )
