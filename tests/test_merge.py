"""merge_upsert semantics: matched-source-wins, null-keeps-target,
insert-only-in-source, untouched-only-in-target, row-count exactness."""

from __future__ import annotations

import os

from pyspark.sql import Row

from data_engineering_challenge_spark.operators.merge import merge_upsert


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="a", n=10), Row(k=2, v="b", n=20), Row(k=3, v="c", n=30)]
    )
    source = spark.createDataFrame(
        [
            Row(k=2, v="B", n=None),  # update: v wins, null n keeps target's 20
            Row(k=4, v="d", n=40),  # insert
        ]
    )
    out = merge_upsert(target, source, ["k"])
    assert out.columns == ["k", "v", "n"]  # target column order preserved
    assert _rows(out) == {
        (1, "a", 10),  # untouched
        (2, "B", 20),  # source v, target n (null-keeps)
        (3, "c", 30),  # untouched
        (4, "d", 40),  # inserted
    }


def test_merge_upsert_exact_key_union_cardinality(spark):
    target = spark.createDataFrame([Row(k=i, v=str(i)) for i in range(100)])
    source = spark.createDataFrame(
        [Row(k=i, v="u") for i in range(50, 150)]
    )  # 50 updates + 50 inserts
    out = merge_upsert(target, source, ["k"])
    assert out.count() == 150  # |target ∪ source keys|, never more
    assert out.filter("v = 'u'").count() == 100


def test_merge_upsert_composite_and_null_keys(spark):
    target = spark.createDataFrame(
        [Row(a=1, b="x", v=1), Row(a=1, b=None, v=2)]
    )
    source = spark.createDataFrame(
        [(1, None, 99)],  # must match the NULL-keyed row, not cross-join
        "a int, b string, v int",
    )
    out = merge_upsert(target, source, ["a", "b"])
    assert _rows(out) == {(1, "x", 1), (1, None, 99)}


# ---------------------------------------------------------------------------
# SCD2 semantics (scd2_apply)
# ---------------------------------------------------------------------------

def _scd2_target(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("valid_from", T.IntegerType()),
            T.StructField("valid_to", T.IntegerType()),
            T.StructField("is_current", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_scd2_change_close_insert_and_noop(spark):
    from data_engineering_challenge_spark.operators.merge import scd2_apply

    target = _scd2_target(
        spark,
        [
            (1, "a", 0, None, True),   # will change
            (2, "b", 0, None, True),   # identical re-send -> no-op
            (3, "c", 0, None, True),   # not in delta -> untouched
            (4, "old", 0, 1, False),   # history row -> untouched
            (4, "new", 1, None, True), # current of a key with history
        ],
    )
    delta = spark.createDataFrame(
        [(1, "A"), (2, "b"), (5, "e")], ["k", "v"]
    )
    out = {tuple(r) for r in scd2_apply(target, delta, ["k"], ["v"], 2).collect()}
    assert out == {
        (1, "a", 0, 2, False),    # closed at batch 2
        (1, "A", 2, None, True),  # new version
        (2, "b", 0, None, True),  # idempotent re-send: NOT versioned
        (3, "c", 0, None, True),
        (4, "old", 0, 1, False),
        (4, "new", 1, None, True),
        (5, "e", 2, None, True),  # brand-new key
    }


def test_scd2_null_attr_transitions_are_versioned(spark):
    from data_engineering_challenge_spark.operators.merge import scd2_apply

    target = _scd2_target(spark, [(1, None, 0, None, True), (2, "b", 0, None, True)])
    delta = spark.createDataFrame([(1, "x"), (2, None)], ["k", "v"])
    out = {tuple(r) for r in scd2_apply(target, delta, ["k"], ["v"], 1).collect()}
    # null -> value and value -> null are both real changes (null-safe compare)
    assert out == {
        (1, None, 0, 1, False),
        (1, "x", 1, None, True),
        (2, "b", 0, 1, False),
        (2, None, 1, None, True),
    }


def test_scd2_exact_output_cardinality(spark):
    from data_engineering_challenge_spark.operators.merge import scd2_apply

    target = _scd2_target(spark, [(i, "v", 0, None, True) for i in range(100)])
    delta = spark.createDataFrame(
        [(i, "u") for i in range(50, 100)] + [(i, "v") for i in range(50)]
        + [(i, "n") for i in range(100, 120)],
        ["k", "v"],
    )
    out = scd2_apply(target, delta, ["k"], ["v"], 1)
    # |target| + |changed| + |new| = 100 + 50 + 20
    assert out.count() == 170
    assert out.filter("is_current").count() == 120


# ---------------------------------------------------------------------------
# snapshot_diff semantics
# ---------------------------------------------------------------------------

def test_snapshot_diff_classification(spark):
    from data_engineering_challenge_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        ["k", "s", "n"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 41), (5, "e", 50)],
        ["k", "s", "n"],
    )
    out = {tuple(r) for r in snapshot_diff(old, new, ["k"], ["s", "n"]).collect()}
    assert out == {
        (1, "unchanged", False, False),
        (2, "changed", True, False),
        (3, "removed", False, False),
        (4, "changed", False, True),   # null attr compares null-safe
        (5, "added", False, False),
    }


def test_scd2_asof_attributes_point_in_time(spark, tmp_path_factory):
    """A customer whose segment rotates at batch 2 must have its
    orders split by as-of batch: batches 0/1 see the old segment,
    batch 2 the new one."""
    import os

    from data_engineering_challenge_spark.operators.merge import orders_scd2_asof

    path = str(tmp_path_factory.mktemp("scd2asof"))
    # c_custkey=3 -> %10==3: identical re-send at batch 1 (no version),
    # segment rotated to 'SEG3' at batch 2.
    spark.createDataFrame(
        [(3, 11, 100.0, "OLD")],
        ["c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).selectExpr(
        "CAST(c_custkey AS BIGINT) c_custkey",
        "'c' c_name",
        "CAST(c_nationkey AS INT) c_nationkey",
        "CAST(c_acctbal AS DOUBLE) c_acctbal",
        "c_mktsegment",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "customer.parquet"))
    # orders with as-of batches 0, 1, 2 (o_orderkey % 3)
    spark.createDataFrame(
        [(3, 3), (4, 3), (5, 3)], ["o_orderkey", "o_custkey"]
    ).selectExpr(
        "CAST(o_orderkey AS BIGINT) o_orderkey",
        "CAST(o_custkey AS BIGINT) o_custkey",
        "'O' o_orderstatus",
        "CAST(10.0 AS DOUBLE) o_totalprice",
        "CAST('2024-01-01' AS TIMESTAMP) o_orderdate",
        "'1-URGENT' o_orderpriority",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "orders.parquet"))

    out = {r["segment_asof"]: r for r in orders_scd2_asof(spark, path).collect()}
    # orderkeys 3 (asof 0) and 4 (asof 1) -> OLD; orderkey 5 (asof 2) -> SEG3
    assert out["OLD"]["n_orders"] == 2
    assert out["SEG3"]["n_orders"] == 1
    assert out["OLD"]["revenue"] == 20.0
    assert out["SEG3"]["revenue"] == 10.0


def test_scd2_stream_applies_nightly_feed_and_replays_clean(
    spark, tmp_path
):
    """Streaming SCD2 maintenance: night 1 seeds the history, night 2
    versions a changed row / no-ops an identical re-send / inserts a
    new key; a checkpointed restart with no new files is byte-stable
    (scd2_apply's idempotent-re-send rule makes replays no-op)."""
    import pandas as pd

    from data_engineering_challenge_spark.streaming.pipelines import (
        _stream_dir_for,
        run_scd2_stream,
    )

    feed = str(tmp_path / "dim_feed.parquet")
    pd.DataFrame(
        [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}]
    ).to_parquet(feed, index=False)
    out = str(tmp_path / "dim_history")
    ckpt = str(tmp_path / "ckpt_scd2")

    run_scd2_stream(spark, feed, out, ckpt, keys=["k"], attrs=["v"])
    h1 = {tuple(r) for r in spark.read.parquet(out).collect()}
    # batch 1 against empty history: both rows insert as current
    assert h1 == {(1, "a", 1, None, True), (2, "b", 1, None, True)}

    # night 2 lands: k=1 changes, k=2 identical re-send, k=3 new
    schema = spark.read.parquet(feed).schema
    sdir = _stream_dir_for(feed, schema.simpleString())
    night2 = os.path.join(sdir, "night2.parquet")
    pd.DataFrame(
        [{"k": 1, "v": "A"}, {"k": 2, "v": "b"}, {"k": 3, "v": "c"}]
    ).to_parquet(night2, index=False)
    try:
        run_scd2_stream(spark, feed, out, ckpt, keys=["k"], attrs=["v"])
        h2 = {tuple(r) for r in spark.read.parquet(out).collect()}
        assert h2 == {
            (1, "a", 1, 2, False),   # closed at batch 2
            (1, "A", 2, None, True),
            (2, "b", 1, None, True),  # identical re-send: NOT versioned
            (3, "c", 2, None, True),
        }
        # restart with no new files: byte-stable history
        run_scd2_stream(spark, feed, out, ckpt, keys=["k"], attrs=["v"])
        assert {tuple(r) for r in spark.read.parquet(out).collect()} == h2
    finally:
        os.remove(night2)
