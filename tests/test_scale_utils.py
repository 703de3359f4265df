"""Skew-mitigation and bucketing utilities: semantics preserved,
shuffles eliminated where promised."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_challenge_spark.catalog import load_table
from data_engineering_challenge_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)
from data_engineering_challenge_spark.plans.checks import physical_plan
from data_engineering_challenge_spark.sinks.writers import write_bucketed_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    plain = sorted(
        map(tuple, l.join(p, l.l_partkey == p.p_partkey).collect())
    )
    salted = sorted(map(tuple, salted_join(l, p, "l_partkey", "p_partkey").collect()))
    assert salted == plain


def test_salted_count_distinct_matches_exact(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_suppkey: r.n
        for r in l.groupBy("l_suppkey").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    salted = {
        r.l_suppkey: r.n_distinct_l_orderkey
        for r in salted_count_distinct(l, "l_suppkey", "l_orderkey").collect()
    }
    assert salted == exact


def test_bucketed_join_runs_without_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key must sort-merge join with
    zero Exchange nodes — the pay-once-at-load co-location design."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(o, "orders_b", "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    write_bucketed_table(l, "lineitem_b", "l_orderkey", n_buckets=8, sort_col="l_orderkey")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "(1) Exchange" not in plan  # no shuffle exchange at all
        import re

        assert not re.search(r"\(\d+\) Exchange\b", plan)
        # and it still computes the right thing
        assert joined.count() == o.join(l, o.o_orderkey == l.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(128 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
