"""Property-based invariants for merge_upsert and the Z-order key.

merge_upsert: for arbitrary key sets, output keys are exactly
target-keys ∪ source-keys, matched rows take source values, and
row counts never inflate (full-outer joins are where accidental
many-to-many blowups hide).

zorder_key: the Morton interleave must be a bijection on the bucket
grid — a collision would silently merge distinct value regions and an
inversion would break range locality.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_challenge_spark.operators.merge import merge_upsert

_SETTINGS = dict(
    max_examples=8,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_keys = st.sets(st.integers(min_value=0, max_value=30), min_size=0, max_size=12)


@settings(**_SETTINGS)
@given(target_keys=_keys, source_keys=_keys)
def test_merge_upsert_key_algebra(spark, target_keys, source_keys):
    target = spark.createDataFrame(
        [(k, f"t{k}") for k in target_keys] or [(None, None)], "k int, v string"
    ).filter("k IS NOT NULL")
    source = spark.createDataFrame(
        [(k, f"s{k}") for k in source_keys] or [(None, None)], "k int, v string"
    ).filter("k IS NOT NULL")
    out = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    assert set(out) == target_keys | source_keys  # exact key union
    for k, v in out.items():
        # source wins wherever present; untouched rows keep target value
        assert v == (f"s{k}" if k in source_keys else f"t{k}")


def test_zorder_key_bijective_on_grid(spark):
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sinks.maintenance import zorder_key

    bits = 5  # 32x32 grid — full cross product in one tiny job
    grid = spark.range(1 << bits).select(F.col("id").alias("a")).crossJoin(
        spark.range(1 << bits).select(F.col("id").alias("b"))
    )
    keyed = grid.select(zorder_key(["a", "b"], bits=bits))
    n = 1 << (2 * bits)
    assert keyed.distinct().count() == n  # injective on the grid
    lo, hi = keyed.agg(F.min("_zkey"), F.max("_zkey")).first()
    assert (lo, hi) == (0, n - 1)  # and exactly onto [0, 2^(2 bits))
