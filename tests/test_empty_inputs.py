"""Fleet-wide empty-input robustness: every registered query must
EXECUTE on schema-correct but row-free tables.

A 100-TB pipeline routinely meets empty partitions, empty date slices,
and freshly-created tables; an operator that throws on zero rows
(empty-array reductions, divisions inside expressions, iterative
fixpoints with no seed) would fail a production DAG at 3am. The sweep
asserts execution, not values — the oracles pin semantics on real
data."""

from __future__ import annotations

import os

import pytest

from data_engineering_challenge_spark import registry
from data_engineering_challenge_spark.catalog import TABLES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        schema = spark.read.parquet(src).schema
        spark.createDataFrame([], schema).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, f"{t}.parquet")
        )
    return root


@pytest.mark.parametrize(
    "spec",
    sorted(registry.all_queries().values(), key=lambda s: s.name),
    ids=lambda s: s.name,
)
def test_query_survives_empty_tables(spec, spark, empty_sf_dir):
    rows = spec.fn(spark, empty_sf_dir).collect()
    assert isinstance(rows, list)
