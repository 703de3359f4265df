"""merge_upsert semantics: matched-source-wins, null-keeps-target,
insert-only-in-source, untouched-only-in-target, row-count exactness."""

from __future__ import annotations

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
