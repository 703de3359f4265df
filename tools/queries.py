#!/usr/bin/env python
"""Query-catalog CLI: list every registered query with tags and doc.

    python tools/queries.py                 # full catalog
    python tools/queries.py --tag dedup     # filter by tag
    python tools/queries.py --name ann_topk # one query, full doc + oracle

The discoverability surface over the registry (the engine's public
correctness surface): every row here is runnable via
`registry.spark_queries()[name](spark, sf_dir)` and oracle-checked by
`tools/check_oracle.py`.
"""

from __future__ import annotations

import argparse
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark import registry


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tag", help="only queries carrying this tag")
    ap.add_argument("--name", help="show one query in full (doc + oracle SQL)")
    args = ap.parse_args(argv)

    specs = registry.all_queries()
    if args.name:
        spec = specs.get(args.name)
        if spec is None:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        print(f"{spec.name}  [{', '.join(spec.tags)}]")
        print(textwrap.fill(spec.doc, 72))
        print("\n-- oracle (DuckDB) " + "-" * 40)
        print(textwrap.dedent(spec.oracle or "(rows-only: no SQL-expressible oracle)"))
        return 0

    rows = sorted(specs.values(), key=lambda s: s.name)
    if args.tag:
        rows = [s for s in rows if args.tag in s.tags]
    for s in rows:
        first_line = textwrap.shorten(s.doc, 70, placeholder="…")
        print(f"{s.name:32} [{', '.join(s.tags)}]\n{'':32}  {first_line}")
    print(f"\n{len(rows)} queries", f"(tag={args.tag})" if args.tag else "")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
