#!/usr/bin/env python
"""Print the physical plan of any registered query:

    python tools/explain.py pricing_summary [--sf-dir /root/testdata/sf0.01]
    python tools/explain.py --list
    python tools/explain.py margin_signature_60days --mode simple --scan-summary

`--scan-summary` appends the parsed scan sections (PushedFilters /
ReadSchema / PartitionFilters) and the shuffle-exchange count — the
properties the plan regression tests assert.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark import registry
from data_engineering_challenge_spark.plans.checks import (
    count_exchanges,
    physical_plan,
    scan_sections,
)
from data_engineering_challenge_spark.session import get_session


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--mode", default="formatted", choices=["simple", "extended", "formatted", "cost", "codegen"])
    ap.add_argument("--scan-summary", action="store_true")
    args = ap.parse_args(argv)

    if args.list or not args.query:
        for name, spec in sorted(registry.all_queries().items()):
            print(f"{name:32s} {','.join(spec.tags)}")
        return 0

    specs = registry.all_queries()
    if args.query not in specs:
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2
    spark = get_session("explain")
    df = specs[args.query].fn(spark, args.sf_dir)
    plan = physical_plan(df, args.mode)
    print(plan)
    if args.scan_summary:
        print(f"shuffle exchanges: {count_exchanges(plan)}")
        for s in scan_sections(plan):
            loc = s.get("Location", "")
            table = loc.rsplit("/", 1)[-1].rstrip("]") if loc else "?"
            print(f"scan {table}")
            for k in ("PushedFilters", "PartitionFilters", "ReadSchema"):
                if s.get(k):
                    print(f"  {k}: {s[k]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
