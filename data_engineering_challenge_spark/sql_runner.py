"""SQL-file query surface: discover ``*.sql`` files, run them through
``spark.sql`` against the registered testdata views.

Reference parity (SURVEY.md §2.1 S11/S12 and §3.1):
- ``run_sql``     ↔ `run_sql` (src/db/pipeline.py:141-162) — there the
  SQL string is shipped to PostgreSQL; here the string IS the logical
  plan input and Catalyst does parse → analyze → optimize → execute.
- ``load_queries`` / the CLI in ``tools/run_sql.py`` ↔ the `*.sql`
  registry + argparse front end (src/etl/ingest/run_sql_cli.py:30-105).

The shipped ``sql/`` directory holds the reference's analytic query
set re-expressed in Spark SQL over the testdata star schema; every
file has a DataFrame twin in the registry, and the test suite asserts
file-vs-twin result equality, so both entry points stay in lockstep.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views

DEFAULT_SQL_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "sql")


def load_queries(sql_dir: str = DEFAULT_SQL_DIR) -> dict[str, str]:
    """Discover ``*.sql`` files by stem (reference run_sql_cli.py:30-34)."""
    out: dict[str, str] = {}
    for fn in sorted(os.listdir(sql_dir)):
        if fn.endswith(".sql"):
            with open(os.path.join(sql_dir, fn), encoding="utf-8") as f:
                out[fn[: -len(".sql")]] = f.read()
    return out


def run_sql(spark: SparkSession, sql_text: str, sf_dir: str | None = None) -> DataFrame:
    """Execute arbitrary SQL; optionally (re)register the testdata views
    first so table names resolve (reference run_sql, pipeline.py:141-162)."""
    if sf_dir is not None:
        register_views(spark, sf_dir)
    return spark.sql(sql_text)


def run_named(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    sql_dir: str = DEFAULT_SQL_DIR,
) -> DataFrame:
    """Run a query by file stem from the SQL registry."""
    queries = load_queries(sql_dir)
    if name not in queries:
        raise KeyError(f"no query named {name!r}; available: {sorted(queries)}")
    return run_sql(spark, queries[name], sf_dir)
