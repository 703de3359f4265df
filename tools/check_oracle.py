"""Local mirror of the driver's DuckDB-oracle correctness gate.

    PYTHONPATH=/root/repo python tools/check_oracle.py [--lenient] [--skip q1,q2] [sf_dir] [query ...]

Strict (driver-faithful) by default: exact float repr, and Decimal /
HUGEINT outputs are hard failures. ``--lenient`` restores the round-1
9-digit rounding, useful only to tell representational mismatches from
real value divergence.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark import registry, testing
from data_engineering_challenge_spark.session import get_session


def main() -> int:
    argv = sys.argv[1:]
    skip: set[str] = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--lenient"]
    strict = "--lenient" not in argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_session("check_oracle")
    con = testing.duckdb_con(sf_dir)
    failures = []
    for name, spec in registry.all_queries().items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"  {name:32s} SKIP (--skip; run separately)")
            continue
        t0 = time.time()
        sdf = spec.fn(spark, sf_dir)
        s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
        if spec.oracle is None:
            print(f"  {name:32s} rows={len(s_rows):<8d} (rows-only, {time.time() - t0:.1f}s)")
            continue
        d_cols, d_rows = testing.run_oracle(con, spec.oracle)
        ok, detail = testing.compare(s_cols, s_rows, d_cols, d_rows, strict=strict)
        print(f"  {name:32s} {'OK ' if ok else 'FAIL'} rows={len(s_rows)} ({time.time() - t0:.1f}s)")
        if not ok:
            failures.append(name)
            print("    " + detail.replace("\n", "\n    "))
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
