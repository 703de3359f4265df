"""The SQL-file surface must agree with its DataFrame twins: every
shipped sql/*.sql file names a registered query and returns identical
rows through spark.sql (reference parity for the run_sql_cli path)."""

from __future__ import annotations

import pytest

from data_engineering_challenge_spark import registry, sql_runner


def _names():
    return sorted(sql_runner.load_queries())


def test_registry_has_all_sql_files():
    assert set(_names()) <= set(registry.all_queries())


@pytest.mark.parametrize("name", _names())
def test_sql_file_matches_dataframe_twin(name, spark, sf_dir):
    # key=repr: total order even when rows carry NULLs (grouping sets)
    sql_rows = sorted(
        map(tuple, sql_runner.run_named(spark, name, sf_dir).collect()), key=repr
    )
    twin = registry.all_queries()[name].fn(spark, sf_dir)
    twin_rows = sorted(map(tuple, twin.collect()), key=repr)
    assert sql_rows == twin_rows


def test_run_named_unknown_raises(spark):
    with pytest.raises(KeyError):
        sql_runner.run_named(spark, "no_such_query")


def test_raw_sql_string(spark, sf_dir):
    n = sql_runner.run_sql(
        spark, "SELECT COUNT(*) AS n FROM lineitem", sf_dir
    ).collect()[0]["n"]
    assert n > 0
