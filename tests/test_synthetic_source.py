"""Custom Python DataSource: executor-parallel deterministic corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources.synthetic import (
    SCHEMA,
    SyntheticDocsDataSource,
)


def _read(spark, n_docs: int, n_partitions: int):
    spark.dataSource.register(SyntheticDocsDataSource)
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", n_docs)
        .option("n_partitions", n_partitions)
        .load()
    )


def test_synthetic_source_schema_count_parallelism(spark):
    df = _read(spark, 5000, 8)
    assert df.schema == SCHEMA
    assert df.rdd.getNumPartitions() == 8  # partitions() honored
    assert df.count() == 5000
    ids = df.agg(
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.countDistinct("doc_id").alias("d"),
    ).first()
    assert (ids.lo, ids.hi, ids.d) == (0, 4999, 5000)


def test_synthetic_source_deterministic_across_partitioning(spark):
    # same corpus regardless of split count — content-addressed, no RNG
    a = _read(spark, 1000, 4).orderBy("doc_id").collect()
    b = _read(spark, 1000, 13).orderBy("doc_id").collect()
    assert a == b
    assert all(r.n_chars == len(r.text) for r in a[:50])


def test_synthetic_source_composes_with_engine_ops(spark):
    # the generated corpus flows through normal engine operators
    df = _read(spark, 2000, 8)
    by_lang = df.groupBy("lang").count()
    assert by_lang.count() == 4
    assert by_lang.agg(F.sum("count")).first()[0] == 2000
