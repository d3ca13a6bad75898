"""Dev loop: run registered query pairs against the DuckDB oracle.

Usage:
    python tools/check.py [sf_dir] [name_prefix ...]
    python tools/check.py --analyze [sf_dir] [name_prefix ...]

``--analyze`` is the pre-commit gate: it CONSTRUCTS every selected pair's
DataFrame and forces Spark's analyzer over it (``df.schema``) without
executing a job, so an operator that fails at analysis time (illegal
expression, unresolved column, bad plan shape) can never ship unrun —
the dq07 class of bug. Seconds for most of the registry; pairs that
materialize fixtures inside their builder still pay that one-time cost.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pydatalake_gen2_spark.harness import run_all
from pydatalake_gen2_spark.registry import load_all
from pydatalake_gen2_spark.session import get_spark


def _selected(prefixes: list[str]) -> list[str]:
    from pydatalake_gen2_spark.registry import REGISTRY

    return sorted(
        n for n in REGISTRY if not prefixes or any(n.startswith(p) for p in prefixes)
    )


def analyze_only(sf_dir: str, prefixes: list[str]) -> int:
    """Construct + analyze every selected pair; no job execution.

    Also runs the round-11 dtype-class parity gate (typeaudit): Spark's
    analyzed schema vs DuckDB's static bind of the oracle — jobless on
    both sides — so an integral-vs-decimal/float/string class drift (the
    dq08 driver-red class) can never ship unflagged.
    """
    from pydatalake_gen2_spark.harness import duck_connect
    from pydatalake_gen2_spark.registry import REGISTRY
    from pydatalake_gen2_spark.typeaudit import audit_pair

    names = _selected(prefixes)
    spark = get_spark("analyze")
    con = duck_connect(sf_dir)
    bad = 0
    t0 = time.time()
    for name in names:
        pair = REGISTRY[name]
        try:
            df = pair.spark_fn(spark, sf_dir)
            _ = df.schema  # forces full analysis; never runs a job
            problems = audit_pair(spark, con, sf_dir, name, sdf=df)
            if problems:
                bad += 1
                print(f"FAIL {name:38s} TYPE_MISMATCH: {problems}")
        except Exception as e:  # noqa: BLE001 — report every failure class
            bad += 1
            print(f"FAIL {name:38s} {type(e).__name__}: {str(e)[:300]}")
    print(f"\nanalyze+types: {len(names) - bad}/{len(names)} pass "
          f"({time.time() - t0:.1f}s)")
    return 1 if bad else 0


def main() -> int:
    argv = sys.argv[1:]
    analyze = "--analyze" in argv
    argv = [a for a in argv if a != "--analyze"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    prefixes = argv[1:]
    load_all()
    if analyze:
        return analyze_only(sf_dir, prefixes)

    names = _selected(prefixes)
    spark = get_spark("check")
    results = run_all(spark, sf_dir, names)
    bad = 0
    for r in results:
        ok = r["status"] in ("match", "rows_only")
        if not ok:
            bad += 1
        line = f"{'OK ' if ok else 'FAIL'} {r['name']:38s} {r['status']}"
        if not ok:
            line += f"\n     {r.get('detail', '')[:500]}"
        print(line)
    print(f"\n{len(results) - bad}/{len(results)} pass")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
