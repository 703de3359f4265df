"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``data_engineering_challenge_spark.registry``): every implemented
operator from SURVEY.md §2 (plus the north-star extensions) registers a
Spark implementation and, where SQL-expressible, a DuckDB oracle twin
with matching column names.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_engineering_challenge_spark import registry
from data_engineering_challenge_spark.operators.relational import top10_units


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = top-10 products by units sold (SURVEY.md §7.1):
    parquet scan → partial/final hash agg → distributed top-k
    (TakeOrderedAndProject).
    """
    return top10_units(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query in ``queries()``."""
    return registry.oracles()
