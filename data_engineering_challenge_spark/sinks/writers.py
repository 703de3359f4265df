"""Writers (reference SURVEY.md §2.1 S8-S9).

The reference's sink is CSV → Postgres `COPY FROM STDIN`
(src/db/pipeline.py:165-195) plus cleaned-CSV exports (notebook cell
31). Spark-first replacements:

- :func:`write_partitioned_parquet` — the warehouse sink. Partitioning
  by a month column derived from the date column is the physical
  design that replaces the reference's three B-tree indexes
  (src/db/sql/schema.sql:41-43): date-window queries prune partitions
  at planning time (SURVEY.md §4).
- :func:`write_csv` — pipe-delimited CSV export parity.
- :func:`verify_rowcount` — the reference's post-COPY
  `SELECT COUNT(*)` reconciliation (src/db/pipeline.py:194-195).

- :func:`write_jdbc` — literal DB-load parity (reference
  src/db/pipeline.py:165-195), env-gated: no JDBC driver jar ships in
  this container, so it fail-fasts with NotImplementedError instead of
  dying mid-write with a JVM ClassNotFoundException.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    date_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet, partitioned by month of `date_col` when given.

    At 100 TB: month partitions keep file counts manageable (~120
    partitions for 10 years) while serving every date-window query in
    the suite via partition pruning; finer grains (day) explode the
    file count without improving pruning for month-scale windows.
    """
    w = df
    writer = None
    if date_col:
        w = df.withColumn("part_month", F.date_format(F.col(date_col), "yyyy-MM"))
        writer = w.write.partitionBy("part_month")
    else:
        writer = w.write
    writer.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, sep: str = "|", mode: str = "overwrite") -> None:
    """Pipe-delimited CSV with header (reference S9)."""
    df.write.option("sep", sep).option("header", True).mode(mode).csv(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_col) at
    write time so repeated joins/aggregations on that key run without
    a shuffle (Catalyst sees the bucketing as a satisfied hash
    distribution). The 100-TB design for fact-fact joins where neither
    side broadcasts: pay the shuffle once at load, never per query.
    """
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.mode(mode).format("parquet").saveAsTable(table)


def verify_rowcount(spark: SparkSession, df: DataFrame, path: str) -> tuple[int, int, bool]:
    """(source_count, written_count, match) — load reconciliation."""
    src = df.count()
    written = spark.read.parquet(path).count()
    return src, written, src == written


def write_with_stats(
    df: DataFrame,
    path: str,
    sum_col: str | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write parquet and return load-reconciliation stats from the SAME
    pass using an Observation (df.observe): row count (and optionally a
    control sum) are accumulated task-side while the write runs.

    This replaces the count-after-write reconciliation
    (verify_rowcount, mirroring the reference's SELECT COUNT(*) after
    COPY, src/db/pipeline.py:194-195) with a zero-extra-scan version —
    at 100 TB a post-write count is a full re-read of everything just
    written; observed metrics are free.
    """
    from pyspark.sql import Observation

    metrics = [F.count(F.lit(1)).alias("rows_written")]
    if sum_col is not None:
        metrics.append(
            F.sum(F.col(sum_col).cast("decimal(28,2)")).alias(f"sum_{sum_col}")
        )
    obs = Observation("load_stats")
    df.observe(obs, *metrics).write.mode(mode).parquet(path)
    return dict(obs.get)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (columnar interop with Hive/Trino warehouses).

    Same layout guidance as parquet: ORC stripes carry min/max stats,
    so the reader enjoys the identical predicate-pushdown story —
    useful when the downstream warehouse is ORC-native.
    """
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (pushdown/pruning come from the native ORC reader)."""
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines export — the interchange format of LLM data work
    (each row one JSON object; map/array columns serialize natively).

    At scale prefer parquet between OUR stages; jsonl is the boundary
    format for external tokenizer/training consumers.
    """
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines scan. Pass an explicit schema at scale: schemaless
    json triggers a full inference pre-pass over the data (an extra
    scan) and types drift per-file; with a schema the reader is a
    single streaming pass."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    options: dict | None = None,
) -> None:
    """Distributed JDBC load — the Spark twin of the reference's
    Postgres `COPY FROM STDIN` bulk path (src/db/pipeline.py:165-195).

    Each task opens one connection and streams its partition in
    `batch_size`-row round trips (`batchsize` is the JDBC writer's
    executeBatch window — the same batching role the reference's COPY
    buffer plays). `num_partitions` coalesces before the write so the
    target DB sees a bounded connection count: at cluster scale an
    unthrottled 1000-task write IS a connection storm; size it to the
    DB's write concurrency, not the cluster's.

    Env gate: raises NotImplementedError when the JDBC driver class is
    not on the JVM classpath (this container ships none). Probing
    Class.forName up front turns a mid-write executor
    ClassNotFoundException into a fail-fast driver-side error.
    """
    opts = dict(options or {})
    driver = opts.setdefault("driver", "org.postgresql.Driver")
    spark = df.sparkSession
    try:
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
    except Exception as exc:
        raise NotImplementedError(
            f"JDBC driver {driver!r} not on the JVM classpath; add the "
            "driver jar via spark.jars (e.g. org.postgresql:postgresql) "
            "to enable DB-load parity"
        ) from exc
    w = df
    if num_partitions is not None:
        w = w.coalesce(num_partitions)
    writer = (
        w.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
    )
    for k, v in opts.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def backfill_partitions(
    df: DataFrame,
    path: str,
    date_col: str,
) -> None:
    """Partition-level backfill: rewrite ONLY the month partitions
    present in `df`, leaving every other partition untouched.

    Uses dynamic partition overwrite (partitionOverwriteMode=dynamic,
    scoped to this write): the correction for one late-arriving or
    recomputed month replaces exactly that month's files. The static
    default would truncate the whole table first — at 100 TB the
    difference between rewriting 1/120th of the data and all of it.
    """
    (
        df.withColumn("part_month", F.date_format(F.col(date_col), "yyyy-MM"))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .partitionBy("part_month")
        .parquet(path)
    )
