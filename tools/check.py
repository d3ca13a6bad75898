"""Dev loop: run registered query pairs against the DuckDB oracle.

Usage: python tools/check.py [sf_dir] [name_prefix ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pydatalake_gen2_spark.harness import run_all
from pydatalake_gen2_spark.registry import load_all
from pydatalake_gen2_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    prefixes = sys.argv[2:]
    load_all()
    from pydatalake_gen2_spark.registry import REGISTRY

    names = sorted(
        n for n in REGISTRY if not prefixes or any(n.startswith(p) for p in prefixes)
    )
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
