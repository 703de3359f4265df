#!/usr/bin/env python
"""CLI for the SQL-file query surface (reference run_sql_cli.py:42-105):

    python tools/run_sql.py --list
    python tools/run_sql.py --name pricing_summary [--sf-dir /root/testdata/sf0.01]
    python tools/run_sql.py --path my_query.sql
    python tools/run_sql.py --sql "SELECT COUNT(*) FROM lineitem"
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark import sql_runner
from data_engineering_challenge_spark.session import get_session


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--list", action="store_true", help="list named queries")
    src.add_argument("--name", help="run a named query from the sql/ registry")
    src.add_argument("--path", help="run a .sql file by path")
    src.add_argument("--sql", help="run a SQL string")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--sql-dir", default=sql_runner.DEFAULT_SQL_DIR)
    ap.add_argument("--limit", type=int, default=50, help="max rows to print")
    args = ap.parse_args(argv)

    if args.list:
        for name in sql_runner.load_queries(args.sql_dir):
            print(name)
        return 0

    spark = get_session("run_sql")
    if args.name:
        df = sql_runner.run_named(spark, args.name, args.sf_dir, args.sql_dir)
    elif args.path:
        with open(args.path, encoding="utf-8") as f:
            df = sql_runner.run_sql(spark, f.read(), args.sf_dir)
    else:
        df = sql_runner.run_sql(spark, args.sql, args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
