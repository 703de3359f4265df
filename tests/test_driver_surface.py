"""Driver-surface regression pins (round-2 fix class, VERDICT.md r1).

The driver hashes exact cell values; DecimalType outputs (Spark) and
DECIMAL/HUGEINT outputs (DuckDB oracles) render engine-specifically
(scale, trailing zeros, int128) and fail ``hash_match`` even when the
values are equal. Round 1 shipped 9 such failures. These tests make
the class unrepresentable: every registered query must emit
driver-hashable types on BOTH sides.
"""

from __future__ import annotations

import pytest

from data_engineering_challenge_spark import registry, testing


def _specs():
    return sorted(registry.all_queries().values(), key=lambda s: s.name)


@pytest.fixture(scope="module")
def con(sf_dir):
    return testing.duckdb_con(sf_dir)


@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_spark_output_has_no_decimal_columns(spec, spark, sf_dir):
    from pyspark.sql.types import DecimalType

    df = spec.fn(spark, sf_dir)
    offenders = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, DecimalType)
    ]
    assert not offenders, (
        f"{spec.name} emits DecimalType {offenders}; keep decimal internal "
        "and cast the final projection to double (testing.py module doc)"
    )


@pytest.mark.parametrize(
    "spec", [s for s in _specs() if s.oracle is not None], ids=lambda s: s.name
)
def test_oracle_output_has_no_decimal_or_hugeint(spec, con):
    offenders = [
        f"{c}:{t}"
        for c, t in testing.oracle_output_types(con, spec.oracle)
        if "DECIMAL" in t or "HUGEINT" in t
    ]
    assert not offenders, (
        f"{spec.name} oracle returns {offenders}; CAST(... AS DOUBLE) for "
        "decimal aggregates, CAST(... AS BIGINT) for integer SUMs"
    )
