"""Dataset profiling operators (reference SURVEY.md §2.9 Q7-Q10).

API parity:
- :func:`profile_table` / `profile_tables` ↔ `profile_files`
  (src/utils/dataset_profiling.py:339-434): schema, row count, sample.
- :func:`compare_schemas` ↔ (dataset_profiling.py:438-469):
  union/intersection + presence matrix.
- :func:`quick_column_stats` ↔ (dataset_profiling.py:472-545): nulls +
  (approx) distinct per column — ONE wide aggregation, which Spark
  executes as a single scan with partial aggregation; the streaming
  `collect(streaming=True)` of the reference is Spark's native
  partitioned execution.
- :func:`create_profile_report` ↔ src/utils/reporting.py:36-71 —
  JSON artifact written driver-side from the tiny aggregated result.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import TABLES, load_table, load_tables
from ..registry import register


def profile_table(df: DataFrame, name: str = "", sample_rows: int = 5) -> dict[str, Any]:
    """Schema + row count + sample for one table (no full materialize:
    count comes from parquet footers where possible, sample is limit n)."""
    return {
        "name": name,
        "n_rows": df.count(),
        "n_cols": len(df.columns),
        "columns": [{"name": f.name, "type": f.dataType.simpleString()} for f in df.schema.fields],
        "sample": [r.asDict() for r in df.limit(sample_rows).collect()],
    }


def compare_schemas(dfs: dict[str, DataFrame]) -> dict[str, Any]:
    """Union/intersection of column sets + presence matrix (reference
    compare_schemas) — metadata-only, no jobs."""
    col_sets = {name: set(df.columns) for name, df in dfs.items()}
    union = sorted(set().union(*col_sets.values())) if col_sets else []
    inter = sorted(set.intersection(*col_sets.values())) if col_sets else []
    return {
        "union": union,
        "intersection": inter,
        "presence": {c: {n: c in s for n, s in col_sets.items()} for c in union},
    }


def quick_column_stats(df: DataFrame, cols: tuple[str, ...], approx: bool = False) -> DataFrame:
    """(column_name, n_nulls, n_distinct) — one aggregation pass,
    unpivoted with stack(). `approx=True` swaps exact distinct for
    HLL++ approx_count_distinct (the 100-TB default; exact kept for
    oracle comparison)."""
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).alias(f"{c}__nulls"),
            distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', `{c}__nulls`, `{c}__distinct`" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)"
    ).orderBy("column_name")


def create_profile_report(
    spark: SparkSession, sf_dir: str, out_path: str, tables: tuple[str, ...] = TABLES
) -> dict[str, Any]:
    """JSON profile artifact across tables (reference create_profile_report)."""
    dfs = load_tables(spark, sf_dir, tables)
    report = {
        "sf_dir": sf_dir,
        "tables": {n: profile_table(df, n) for n, df in dfs.items()},
        "schema_comparison": compare_schemas(dfs),
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2, default=str)
    return report


# --- registered driver queries ----------------------------------------


@register(
    "table_profile",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in sorted(TABLES)
    )
    + " ORDER BY table_name",
    doc="Row counts across every catalog table (reference profile_files "
    "/ fast row count S7; parquet footer metadata makes these scans "
    "cheap in Spark).",
    tags=("profiling", "reference"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in sorted(TABLES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("table_name")


@register(
    "column_stats_orders",
    oracle=" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, "
        # CAST: DuckDB SUM(INTEGER) yields HUGEINT (int128) which the
        # driver's serialization can't hash; Spark's SUM(int) is bigint
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
        f"COUNT(DISTINCT {c}) AS n_distinct FROM orders"
        for c in sorted(
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
        )
    )
    + " ORDER BY column_name",
    doc="Null + distinct counts per orders column in one aggregation "
    "pass (reference quick_column_stats, dataset_profiling.py:472-545).",
    tags=("profiling", "reference"),
)
def column_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return quick_column_stats(
        o,
        ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    )


@register(
    "totalprice_histogram",
    oracle="""
        WITH b AS (
            SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders
        )
        SELECT LEAST(9, CAST(FLOOR((o_totalprice - mn) / (mx - mn) * 10)
                   AS INTEGER)) AS bucket,
               mn + LEAST(9, CAST(FLOOR((o_totalprice - mn) / (mx - mn) * 10)
                   AS INTEGER)) * ((mx - mn) / 10.0) AS bucket_lo,
               COUNT(*) AS n_rows
        FROM orders CROSS JOIN b
        GROUP BY 1, 2
        ORDER BY 1
    """,
    doc="Equi-width 10-bucket histogram of order totals - the "
    "distribution-profiling primitive. One tiny bounds agg broadcast "
    "back over the scan, integer bucket ids (deterministic: identical "
    "IEEE expression on both engines), counts aggregated engine-side. "
    "Two scans total regardless of data size; no driver-side values.",
    tags=("profiling", "extension"),
)
def totalprice_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    bucket = F.least(
        F.lit(9),
        F.floor((F.col("o_totalprice") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 10).cast("int"),
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(
            bucket.alias("bucket"),
            (F.col("mn") + bucket * ((F.col("mx") - F.col("mn")) / F.lit(10.0))).alias("bucket_lo"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("bucket")
    )
