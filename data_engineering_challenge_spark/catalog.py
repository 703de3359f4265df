"""Testdata catalog: load parquet tables, register temp views.

Spark-side replacement for the reference's PostgreSQL catalog
(`information_schema` introspection at ``src/db/pipeline.py:68-97`` and
DDL application at ``src/db/pipeline.py:100-123``): tables are
columnar parquet scanned directly; schema comes from parquet footers;
views make the SQL surface (`spark.sql`) work against the same names
DuckDB pre-registers for the oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table (lazy — no job until an action).

    `events.ts` is parquet TIMESTAMP(NANOS): Spark reads it as a raw
    int64 (nanosAsLong conf), we truncate to microseconds with exact
    integer division — the same nanos→µs truncation DuckDB applies —
    and convert to TIMESTAMP_NTZ. NTZ is the right type here: it is
    wall-clock (naive) like DuckDB's, and PySpark collects it without
    consulting the driver process's OS timezone, so results are
    identical no matter what TZ the harness runs under. (The cast
    instant→wall-clock uses the session tz, which apply_runtime_confs
    pins to UTC first.)
    """
    apply_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names if os.path.exists(table_path(sf_dir, n))}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view for spark.sql()."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def scan_partitions(df: DataFrame) -> int:
    """Partition count of a scan-rooted frame, memoized per file list.

    `df.rdd.getNumPartitions()` compiles a physical plan per call
    (~40-50 ms warm) and the suite probes the same handful of parquet
    tables hundreds of times per bench run; the split count is a pure
    function of the scan's files (+ session split confs), so one probe
    per file list amortizes the rest (guide §1.2: driver work counts).
    Frames with no resolvable input files (in-memory test frames) fall
    through to the direct probe."""
    try:
        files = tuple(df.inputFiles())
    except Exception:
        files = ()
    if not files:
        return df.rdd.getNumPartitions()
    # r11 (ADVICE): key on the owning SparkSession too — a probe cached
    # under one session (whose split confs fix the file→split packing)
    # must not be served to a different session with different confs.
    # id() of the live session object is free; a torn-down session's
    # entries become unreachable keys, never wrong answers.
    key = (id(df.sparkSession), files)
    n = _SCAN_PARTS_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        _SCAN_PARTS_CACHE[key] = n
    return n


_SCAN_PARTS_CACHE: dict[tuple[int, tuple[str, ...]], int] = {}


def spread_scan(df: DataFrame, spark: SparkSession, key: str) -> DataFrame:
    """Hash-repartition a compute-dense frame up to session parallelism
    when the source scan yields fewer partitions than cores.

    The driver testdata stores each table as ONE small parquet file, so
    a corpus scan is a single task and every per-row-expensive operator
    (shingle hashing, minhash signatures, 64-dim dot products, Arrow
    Python stages) runs on one core while 31 idle — measured 8× below
    per-core throughput at sf0.1 vs sf1. Hash-partitioning on the id
    key is deterministic (unlike round-robin) and balanced for the
    uniform id domains here. At cluster scale a real corpus scan
    already has ≥ cores splits, the predicate is false, and NO shuffle
    is added — this is a small-input adaptation, not a plan change.
    """
    target = spark.sparkContext.defaultParallelism
    try:
        # The repartition earns its shuffle twice over: parallelism AND
        # balance. Probed at sf100 (gen_sf wrote documents as 25 files
        # skewed 437 KB–56 MB, so scan splits are 100×-uneven in rows):
        # removing the repartition made compute-dense doc_fingerprint
        # 2.3× SLOWER (168 → 386 s, stragglers) while saving light
        # token_counts ~30% (53 → 37 s). Dense per-row ops are what
        # spread_scan exists for, so balance wins. At cluster scale a
        # real corpus scan has ≥ cores splits of uniform
        # maxPartitionBytes and the condition below is false — no-op.
        if scan_partitions(df) >= target:
            return df
    except Exception:
        return df
    from pyspark.sql import functions as F

    return df.repartition(target, F.col(key))
