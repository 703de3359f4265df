"""Upsert / MERGE for incremental dataset maintenance.

A training-data pipeline is rarely write-once: crawls re-fetch pages,
labels get corrected, late partitions land. Warehouses spell this
``MERGE INTO``; without a transactional table format the engine-level
primitive is a keyed full-outer join with source-wins semantics —
which is exactly what MERGE compiles to underneath (minus the
transaction log).

Semantics of :func:`merge_upsert`:
- key matched in both        -> source's non-null column values win
  (per-column coalesce; a NULL in source keeps the target value)
- key only in source         -> insert
- key only in target         -> keep unchanged

Scale notes (100 TB posture):
- The merge is ONE shuffle of each side on the key columns. If the
  target is stored bucketed on the key (sinks/writers.py:
  write_bucketed_table), the target side doesn't shuffle at all and
  the merge cost is proportional to the (small) source delta plus a
  co-located join.
- Source-wins-per-column via coalesce never widens rows or explodes
  cardinality: output rows == |target ∪ source keys| exactly.
- eqNullSafe on keys keeps NULL-keyed rows from silently cross-joining.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

DEC = "decimal(18,2)"


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """Keyed upsert: full-outer join, source's non-null values win.

    ``source`` must share ``target``'s schema (same columns). Column
    order of the result follows ``target``.
    """
    t, s = target.alias("t"), source.alias("s")
    cond = reduce(
        operator.and_,
        [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys],
    )
    joined = t.join(s, cond, "full_outer")
    out = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c) for c in target.columns
    ]
    return joined.select(*out)


@register(
    "orders_merge_upsert",
    oracle="""
        WITH target AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        ), source AS (
            SELECT o_orderkey, o_orderstatus,
                   price + CAST(1 AS DECIMAL(18,2)) AS price
            FROM target WHERE o_orderkey % 100 = 0
            UNION ALL
            SELECT o_orderkey + 100000000, o_orderstatus, price
            FROM target WHERE o_orderkey % 100 = 0
        ), merged AS (
            SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
                   COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
                   COALESCE(s.price, t.price) AS price
            FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
        )
        SELECT o_orderstatus, COUNT(*) AS n_rows,
               CAST(SUM(price) AS DOUBLE) AS total_price
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="MERGE/upsert exercised end-to-end: a deterministic delta "
    "(price bump on every 100th order + the same rows re-keyed as "
    "inserts) merged into orders, verified by post-merge aggregate. "
    "Updates use exact decimal addition - no cross-engine rounding.",
    tags=("merge", "join", "extension"),
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast(DEC).alias("price"),
    )
    base = t.filter(F.col("o_orderkey") % 100 == 0)
    updates = base.withColumn("price", F.col("price") + F.lit(1).cast(DEC))
    inserts = base.select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        "o_orderstatus",
        "price",
    )
    merged = merge_upsert(t, updates.unionByName(inserts), ["o_orderkey"])
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )
