"""Writers (partition pruning design) + profiling API tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_engineering_challenge_spark.catalog import load_table, load_tables
from data_engineering_challenge_spark.operators.profiling import (
    compare_schemas,
    create_profile_report,
    profile_table,
    quick_column_stats,
)
from data_engineering_challenge_spark.sinks.writers import (
    verify_rowcount,
    write_csv,
    write_partitioned_parquet,
)


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_part")
    write_partitioned_parquet(o, out, date_col="o_orderdate")
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    # partition pruning: filtering one month must scan only that partition
    one = back.filter(F.col("part_month") == "1997-01")
    plan = one.explain if False else one._jdf.queryExecution().executedPlan().toString()
    assert "part_month" in plan
    expected = o.filter(F.date_format("o_orderdate", "yyyy-MM") == "1997-01").count()
    assert one.count() == expected


def test_csv_roundtrip_and_verify(spark, sf_dir, tmp_path):
    n5 = load_table(spark, sf_dir, "nation")
    out_csv = str(tmp_path / "nation_csv")
    write_csv(n5, out_csv)
    back = spark.read.option("header", True).option("sep", "|").csv(out_csv)
    assert back.count() == n5.count()

    out_pq = str(tmp_path / "nation_pq")
    n5.write.parquet(out_pq)
    src, written, ok = verify_rowcount(spark, n5, out_pq)
    assert ok and src == written == 25


def test_profile_and_schema_compare(spark, sf_dir, tmp_path):
    dfs = load_tables(spark, sf_dir, ("region", "nation"))
    p = profile_table(dfs["region"], "region")
    assert p["n_rows"] == 5 and p["n_cols"] == 2

    cmp = compare_schemas(dfs)
    assert "n_nationkey" in cmp["union"]
    assert cmp["intersection"] == []  # disjoint column names
    assert cmp["presence"]["r_name"] == {"region": True, "nation": False}

    out = tmp_path / "report.json"
    rep = create_profile_report(spark, sf_dir, str(out), tables=("region", "nation"))
    assert json.loads(out.read_text())["tables"]["region"]["n_rows"] == 5
    assert rep["tables"]["nation"]["n_rows"] == 25


def test_quick_column_stats_approx_mode(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    exact = {r.column_name: r.n_distinct for r in quick_column_stats(o, ("o_custkey",)).collect()}
    approx = {
        r.column_name: r.n_distinct
        for r in quick_column_stats(o, ("o_custkey",), approx=True).collect()
    }
    # HLL++ estimate within 10% of exact (the 100-TB default path)
    assert abs(approx["o_custkey"] - exact["o_custkey"]) / exact["o_custkey"] < 0.1


def test_write_with_stats_observes_single_pass(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.catalog import load_table
    from data_engineering_challenge_spark.sinks.writers import write_with_stats

    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "obs")
    stats = write_with_stats(o, out, sum_col="o_totalprice")
    back = spark.read.parquet(out)
    assert stats["rows_written"] == back.count()
    assert float(stats["sum_o_totalprice"]) == float(
        back.agg(F.sum(F.col("o_totalprice").cast("decimal(28,2)"))).first()[0]
    )


def test_backfill_touches_only_its_partitions(spark, sf_dir, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.catalog import load_table
    from data_engineering_challenge_spark.sinks.writers import (
        backfill_partitions,
        write_partitioned_parquet,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_orderdate").cast("date").alias("d")
    )
    path = str(tmp_path / "wh")
    write_partitioned_parquet(o, path, date_col="d")
    months = sorted(
        p.split("=")[1] for p in glob.glob(f"{path}/part_month=*") for p in [p.rsplit("/", 1)[1]]
    )
    assert len(months) > 3
    target = months[1]

    # recompute one month with a visible change (price zeroed)
    delta = o.filter(F.date_format("d", "yyyy-MM") == target).withColumn(
        "o_totalprice", F.lit(0.0)
    )
    import os

    before = {
        m: os.path.getmtime(p)
        for p in glob.glob(f"{path}/part_month=*")
        for m in [p.rsplit("=", 1)[1]]
    }
    backfill_partitions(delta, path, date_col="d")

    back = spark.read.parquet(path)
    # the backfilled month changed...
    assert (
        back.filter(F.col("part_month") == target)
        .agg(F.sum("o_totalprice"))
        .first()[0]
        == 0.0
    )
    # ...its row count is preserved...
    assert back.filter(F.col("part_month") == target).count() == delta.count() > 0
    # ...and every other partition's files were not rewritten
    after = {
        m: os.path.getmtime(p)
        for p in glob.glob(f"{path}/part_month=*")
        for m in [p.rsplit("=", 1)[1]]
    }
    untouched = [m for m in before if m != target]
    assert untouched and all(before[m] == after[m] for m in untouched)
    # total rows unchanged: backfill replaced, never appended
    assert back.count() == o.count()


def test_write_jdbc_gate_fails_fast_without_driver(spark, sf_dir):
    """S8 literal DB-load parity is env-gated (no JDBC driver jar in
    this container): write_jdbc must raise NotImplementedError from a
    driver-side Class.forName probe BEFORE any job starts — never a
    mid-write executor ClassNotFoundException."""
    import pytest

    from data_engineering_challenge_spark.catalog import load_table
    from data_engineering_challenge_spark.sinks.writers import write_jdbc

    o = load_table(spark, sf_dir, "orders").limit(5)
    with pytest.raises(NotImplementedError, match="JDBC driver"):
        write_jdbc(o, "jdbc:postgresql://localhost/x", "orders")


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    from data_engineering_challenge_spark.sinks.writers import read_orc, write_orc

    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(o, out)
    back = read_orc(spark, out)
    assert back.count() == o.count()
    assert back.schema == o.schema
    # the ORC reader pushes predicates like the parquet one
    plan = back.filter(F.col("o_orderkey") == 42)._jdf.queryExecution().executedPlan().toString()
    assert "o_orderkey" in plan


def test_jsonl_roundtrip_with_schema(spark, sf_dir, tmp_path):
    from data_engineering_challenge_spark.sinks.writers import read_jsonl, write_jsonl

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "props")
    out = str(tmp_path / "events_jsonl")
    write_jsonl(e, out)
    back = read_jsonl(spark, out, schema=e.schema)
    assert back.count() == e.count()
    assert back.schema == e.schema
    # value-faithful: the jsonl boundary must not mangle a sample row
    a = {tuple(r) for r in e.orderBy("event_id").limit(5).collect()}
    b = {tuple(r) for r in back.orderBy("event_id").limit(5).collect()}
    assert a == b
