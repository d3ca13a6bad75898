"""Per-pair STREAMING oracle sweep — the decade-ladder workhorse.

tools/check.py batches all output until the end of the run (fine at the
gate scales, blinding at sf1+ where a single heavy ORACLE can grind for
an hour single-threaded in DuckDB). This variant prints each pair's
verdict and wall time as it lands, flushed, so long sweeps are
observable, interruptible, and their partial results survive as
artifacts (see evidence/sweep_sf1_*.log — round 9's non-relational sf1
certification ran through exactly this script).

Usage: python tools/stream_check.py <sf_dir> <prefix> [prefix ...]
       python tools/stream_check.py fixtures/sf1 l0 l1 l2 l3 l4   # the
       l01-l43 continuation queued at round-9 end (l42's oracle is the
       known >45 min cost wall: it re-verifies SimHash banding against
       brute-force all-pairs Hamming, single-threaded on the DuckDB side)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pydatalake_gen2_spark.harness import duck_connect, run_pair
from pydatalake_gen2_spark.registry import REGISTRY, load_all
from pydatalake_gen2_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1]
    prefixes = sys.argv[2:]
    load_all()
    names = sorted(
        n for n in REGISTRY if not prefixes or any(n.startswith(p) for p in prefixes)
    )
    spark = get_spark("stream-check")
    con = duck_connect(sf_dir)
    bad = 0
    for n in names:
        t0 = time.time()
        try:
            r = run_pair(spark, con, sf_dir, n)
            st = r["status"]
        except Exception as e:  # noqa: BLE001 — keep sweeping, report all
            st = f"ERROR {type(e).__name__}: {str(e)[:200]}"
        ok = st in ("match", "rows_only")
        bad += 0 if ok else 1
        print(
            f"{'OK ' if ok else 'FAIL'} {n:38s} {st} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    print(f"\n{len(names) - bad}/{len(names)} pass", flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
