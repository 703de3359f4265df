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


# ---------------------------------------------------------------------------
# SCD Type-2: versioned dimension history.
#
# merge_upsert overwrites; a warehouse dimension usually must NOT —
# analytics joined against the dimension as-of an order date need the
# attribute values that were current THEN. The standard answer is a
# slowly-changing-dimension type-2 table: one row per (key, version)
# with [valid_from, valid_to) batch stamps and an is_current flag.
# ---------------------------------------------------------------------------


def scd2_apply(
    target: DataFrame, delta: DataFrame, keys: list[str], attrs: list[str], batch_id: int
) -> DataFrame:
    """Apply one delta batch to an SCD2 history table.

    ``target`` columns: keys + attrs + (valid_from, valid_to,
    is_current); ``delta`` columns: keys + attrs. Semantics:

    - key in both, any attr differs (null-safe) -> close the current
      row (valid_to = batch_id, is_current = false) and insert the
      delta row as the new current version (valid_from = batch_id);
    - key in both, all attrs identical          -> no-op (an idempotent
      re-send never mints a spurious version);
    - key only in delta                         -> insert as current;
    - key only in target / historical rows      -> unchanged.

    Scale: two joins of the (small) delta against the current slice —
    both broadcast when the delta is nightly-sized — plus unions; the
    history slice is never joined, only unioned. Output rows ==
    |target| + |changed| + |new| exactly. With the target stored
    bucketed on the key the current-slice join is co-located.
    """
    cur = target.filter(F.col("is_current"))
    hist = target.filter(~F.col("is_current"))
    out_cols = [*keys, *attrs, "valid_from", "valid_to", "is_current"]
    attr_diff = ~reduce(
        operator.and_,
        [F.col(f"t.{a}").eqNullSafe(F.col(f"s.{a}")) for a in attrs],
    )

    # Current side: ONE left join against the delta; a changed row is
    # closed in-place by projection (no semi/anti split — keeps the
    # plan at one join and one union branch per side, which matters
    # when batches chain: the two-batch script's plan went from ~20
    # joins / 10 union branches to 4 joins / 6 branches).
    changed = F.coalesce(F.col("s._d"), F.lit(False)) & attr_diff
    cur_out = (
        cur.alias("t")
        .join(delta.withColumn("_d", F.lit(True)).alias("s"), keys, "left")
        .select(
            *keys,
            *[F.col(f"t.{a}").alias(a) for a in attrs],
            F.col("t.valid_from").alias("valid_from"),
            F.when(changed, F.lit(batch_id).cast("int"))
            .otherwise(F.col("t.valid_to"))
            .alias("valid_to"),
            (~changed).alias("is_current"),
        )
    )
    # Delta side: one left join against the current keys; keep only
    # rows that version (changed) or insert (new key) — an identical
    # re-send matches with no attr diff and is dropped.
    matched = F.coalesce(F.col("t._t"), F.lit(False))
    delta_out = (
        delta.alias("s")
        .join(
            cur.select(*keys, *attrs).withColumn("_t", F.lit(True)).alias("t"),
            keys,
            "left",
        )
        .filter((matched & attr_diff) | ~matched)
        .select(
            *keys,
            *[F.col(f"s.{a}").alias(a) for a in attrs],
            F.lit(batch_id).cast("int").alias("valid_from"),
            F.lit(None).cast("int").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        hist.select(*out_cols)
        .unionByName(cur_out.select(*out_cols))
        .unionByName(delta_out.select(*out_cols))
    )


# Deterministic two-batch change script over the customer dim, shared
# by the Spark query and the oracle:
#   batch 1: %10==0 -> acctbal += 100.00 (change); %10==3 -> identical
#            re-send (must NOT version); %10==7 -> re-keyed insert.
#   batch 2: %10==0 -> acctbal += 50.00 again (second version chain);
#            %10==3 -> mktsegment rotated (first real change).
_SCD2_VSUM = (
    "CAST(SUM(('0x' || substr(md5(c_custkey || ':' || valid_from || ':' "
    "|| COALESCE(valid_to, -1) || ':' || is_current), 1, 15))::BIGINT"
    "::DECIMAL(38,0)) % 1099511627776 AS BIGINT)"
)


_SCD2_T2_CTES = """t0 AS (
            SELECT c_custkey, c_nationkey, c_mktsegment,
                   CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal,
                   0 AS valid_from, CAST(NULL AS INT) AS valid_to,
                   TRUE AS is_current
            FROM customer
        ),
        d1 AS (
            SELECT c_custkey, c_nationkey, c_mktsegment,
                   acctbal + CAST(100 AS DECIMAL(18,2)) AS acctbal
            FROM t0 WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey, c_nationkey, c_mktsegment, acctbal
            FROM t0 WHERE c_custkey % 10 = 3
            UNION ALL
            SELECT c_custkey + 1000000000, c_nationkey, c_mktsegment, acctbal
            FROM t0 WHERE c_custkey % 10 = 7
        ),
        ch1 AS (
            SELECT t.c_custkey FROM t0 t JOIN d1 s ON t.c_custkey = s.c_custkey
            WHERE t.is_current AND NOT (
                t.c_nationkey IS NOT DISTINCT FROM s.c_nationkey
                AND t.c_mktsegment IS NOT DISTINCT FROM s.c_mktsegment
                AND t.acctbal IS NOT DISTINCT FROM s.acctbal)
        ),
        t1 AS (
            SELECT * FROM t0 WHERE c_custkey NOT IN (SELECT c_custkey FROM ch1)
            UNION ALL
            SELECT c_custkey, c_nationkey, c_mktsegment, acctbal,
                   valid_from, 1 AS valid_to, FALSE
            FROM t0 WHERE c_custkey IN (SELECT c_custkey FROM ch1)
            UNION ALL
            SELECT c_custkey, c_nationkey, c_mktsegment, acctbal,
                   1, NULL, TRUE
            FROM d1 WHERE c_custkey IN (SELECT c_custkey FROM ch1)
            UNION ALL
            SELECT c_custkey, c_nationkey, c_mktsegment, acctbal,
                   1, NULL, TRUE
            FROM d1 WHERE c_custkey NOT IN (SELECT c_custkey FROM t0)
        ),
        d2 AS (
            SELECT c_custkey, c_nationkey, c_mktsegment,
                   acctbal + CAST(50 AS DECIMAL(18,2)) AS acctbal
            FROM t1 WHERE is_current AND c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey, c_nationkey, 'SEG' || CAST(c_custkey % 5 AS VARCHAR),
                   acctbal
            FROM t1 WHERE is_current AND c_custkey % 10 = 3
        ),
        cur1 AS (SELECT * FROM t1 WHERE is_current),
        ch2 AS (
            SELECT t.c_custkey FROM cur1 t JOIN d2 s ON t.c_custkey = s.c_custkey
            WHERE NOT (
                t.c_nationkey IS NOT DISTINCT FROM s.c_nationkey
                AND t.c_mktsegment IS NOT DISTINCT FROM s.c_mktsegment
                AND t.acctbal IS NOT DISTINCT FROM s.acctbal)
        ),
        t2 AS (
            SELECT * FROM t1 WHERE NOT is_current
            UNION ALL
            SELECT * FROM cur1 WHERE c_custkey NOT IN (SELECT c_custkey FROM ch2)
            UNION ALL
            SELECT c_custkey, c_nationkey, c_mktsegment, acctbal,
                   valid_from, 2 AS valid_to, FALSE
            FROM cur1 WHERE c_custkey IN (SELECT c_custkey FROM ch2)
            UNION ALL
            SELECT c_custkey, c_nationkey, c_mktsegment, acctbal,
                   2, NULL, TRUE
            FROM d2 WHERE c_custkey IN (SELECT c_custkey FROM ch2)
            UNION ALL
            SELECT c_custkey, c_nationkey, c_mktsegment, acctbal,
                   2, NULL, TRUE
            FROM d2 WHERE c_custkey NOT IN (SELECT c_custkey FROM cur1)
        )"""


def _customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-batch SCD2 history over customer (Spark twin of
    ``_SCD2_T2_CTES``): columns c_custkey, c_nationkey, c_mktsegment,
    acctbal, valid_from, valid_to, is_current."""
    keys, attrs = ["c_custkey"], ["c_nationkey", "c_mktsegment", "acctbal"]
    t0 = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.col("c_acctbal").cast(DEC).alias("acctbal"),
        F.lit(0).cast("int").alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    base = t0.select(*keys, *attrs)
    d1 = (
        base.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("acctbal", F.col("acctbal") + F.lit(100).cast(DEC))
        .unionByName(base.filter(F.col("c_custkey") % 10 == 3))
        .unionByName(
            base.filter(F.col("c_custkey") % 10 == 7).withColumn(
                "c_custkey", F.col("c_custkey") + 1000000000
            )
        )
    )
    # Cut lineage between batches (the pagerank/bpe_learn pattern):
    # t2's plan references t1 ~10 times (hist/current slices, semi +
    # anti joins, and d2 derives from it too); without the checkpoint
    # Catalyst re-analyzes a ~50-join tree and the query spends its
    # wall in planning, not data (46.6 s -> ~2 s at sf0.01).
    t1 = scd2_apply(t0, d1, keys, attrs, batch_id=1).localCheckpoint(eager=True)
    cur1 = t1.filter(F.col("is_current")).select(*keys, *attrs)
    d2 = (
        cur1.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("acctbal", F.col("acctbal") + F.lit(50).cast(DEC))
        .unionByName(
            cur1.filter(F.col("c_custkey") % 10 == 3).withColumn(
                "c_mktsegment",
                F.concat(F.lit("SEG"), (F.col("c_custkey") % 5).cast("string")),
            )
        )
    )
    return scd2_apply(t1, d2, keys, attrs, batch_id=2)


@register(
    "scd2_customer_history",
    oracle=f"""
        WITH {_SCD2_T2_CTES}
        SELECT c_mktsegment,
               COUNT(*)::BIGINT AS n_versions,
               COUNT(*) FILTER (WHERE is_current)::BIGINT AS n_current,
               COUNT(*) FILTER (WHERE NOT is_current)::BIGINT AS n_closed,
               CAST(SUM(acctbal) FILTER (WHERE is_current) AS DOUBLE)
                   AS current_acctbal,
               {_SCD2_VSUM} AS version_sum
        FROM t2 GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="SCD Type-2 dimension maintenance exercised end-to-end: two "
    "deterministic delta batches against the customer dim (an attribute "
    "change, an idempotent re-send that must NOT version, a re-keyed "
    "insert, then a second change chaining versions), verified by a "
    "per-segment rollup whose version_sum pins every (key, valid_from, "
    "valid_to, is_current) tuple order-independently.",
    tags=("merge", "scd2", "extension"),
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_mktsegment, n_versions, n_current, n_closed, current_acctbal,
    version_sum) after two SCD2 delta batches over customer."""
    t2 = _customer_history(spark, sf_dir)
    version_sum = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "",
                        F.col("c_custkey").cast("string"),
                        F.lit(":"),
                        F.col("valid_from").cast("string"),
                        F.lit(":"),
                        F.coalesce(F.col("valid_to"), F.lit(-1)).cast("string"),
                        F.lit(":"),
                        F.col("is_current").cast("string"),
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .cast("decimal(38,0)")
    )
    return (
        t2.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
            F.count(F.when(F.col("is_current"), 1)).cast("bigint").alias("n_current"),
            F.count(F.when(~F.col("is_current"), 1)).cast("bigint").alias("n_closed"),
            F.sum(F.when(F.col("is_current"), F.col("acctbal")))
            .cast("double")
            .alias("current_acctbal"),
            (F.sum(version_sum) % F.lit(1099511627776))
            .cast("bigint")
            .alias("version_sum"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (CDC-style): what changed between two table versions?
#
# The regression primitive for pipeline reruns and versioned snapshots
# (sinks/versioned.py): given version A and version B of a keyed
# table, classify every key as added / removed / changed / unchanged
# and count which columns changed — without ever collecting rows.
# ---------------------------------------------------------------------------


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """Row-level diff of two keyed snapshots.

    Returns one row per key in either side with ``change_kind`` in
    {'added','removed','changed','unchanged'} plus one boolean
    ``chg_<col>`` per compared column (null-safe inequality; false for
    added/removed rows). ONE full-outer shuffle join on the keys —
    co-located (no shuffle) when both versions are stored bucketed on
    the key, which is how 100 TB table versions should be laid out.
    """
    o = old.select(*keys, *compare_cols).alias("o")
    n = new.select(*keys, *compare_cols).alias("n")
    cond = reduce(
        operator.and_,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    in_old = reduce(operator.or_, [F.col(f"o.{k}").isNotNull() for k in keys])
    in_new = reduce(operator.or_, [F.col(f"n.{k}").isNotNull() for k in keys])
    chg = [
        (~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))).alias(f"chg_{c}")
        for c in compare_cols
    ]
    any_chg = reduce(
        operator.or_, [~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols]
    )
    kind = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(any_chg, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    key_out = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys
    ]
    both = in_old & in_new
    return j.select(
        *key_out,
        kind.alias("change_kind"),
        *[F.when(both, c).otherwise(F.lit(False)).alias(f"chg_{compare_cols[i]}")
          for i, c in enumerate(chg)],
    )


@register(
    "orders_snapshot_diff",
    oracle="""
        WITH v1 AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        ),
        v2 AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 100 = 50 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus,
                   CASE WHEN o_orderkey % 100 = 0
                        THEN price + CAST(1 AS DECIMAL(18,2))
                        ELSE price END AS price
            FROM v1 WHERE o_orderkey % 97 <> 13
            UNION ALL
            SELECT o_orderkey + 10000000000, o_orderstatus, price
            FROM v1 WHERE o_orderkey % 100 = 0
        ),
        d AS (
            SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                   CASE WHEN n.o_orderkey IS NULL THEN 'removed'
                        WHEN o.o_orderkey IS NULL THEN 'added'
                        WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus)
                             OR NOT (o.price IS NOT DISTINCT FROM n.price)
                        THEN 'changed' ELSE 'unchanged' END AS change_kind,
                   (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                    AND NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus))
                       AS chg_status,
                   (o.o_orderkey IS NOT NULL AND n.o_orderkey IS NOT NULL
                    AND NOT (o.price IS NOT DISTINCT FROM n.price)) AS chg_price
            FROM v1 o FULL OUTER JOIN v2 n ON o.o_orderkey = n.o_orderkey
        )
        SELECT change_kind,
               COUNT(*)::BIGINT AS n_rows,
               COUNT(*) FILTER (WHERE chg_status)::BIGINT AS n_status_changed,
               COUNT(*) FILTER (WHERE chg_price)::BIGINT AS n_price_changed,
               CAST(SUM(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                        ::BIGINT::DECIMAL(38,0)) % 1099511627776 AS BIGINT)
                   AS key_sum
        FROM d GROUP BY change_kind ORDER BY change_kind
    """,
    doc="CDC-style snapshot diff exercised end-to-end: version 2 of "
    "orders is a deterministic edit script (drop every 97th key, bump "
    "price on %100==0, flip status on %100==50, insert re-keyed rows); "
    "the diff classifies every key and counts per-column changes, with "
    "an order-independent key checksum per change kind. ONE full-outer "
    "join on the key — co-located under bucketed layout.",
    tags=("merge", "cdc", "extension"),
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(change_kind, n_rows, n_status_changed, n_price_changed, key_sum)
    between two deterministic versions of orders."""
    v1 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast(DEC).alias("price"),
    )
    kept = v1.filter(F.col("o_orderkey") % 97 != 13)
    v2 = kept.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 100 == 50, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.when(F.col("o_orderkey") % 100 == 0, F.col("price") + F.lit(1).cast(DEC))
        .otherwise(F.col("price"))
        .alias("price"),
    ).unionByName(
        v1.filter(F.col("o_orderkey") % 100 == 0).select(
            # inserted keys offset ABOVE any reachable orderkey (TPC-H max
            # orderkey = 6M*sf, so +3e8 collides with real keys once
            # sf >= ~50, fanning out the full-outer join at sf100); 1e10
            # is unreachable at any SF this engine targets — same rule as
            # scd2's +1e9 custkey offset.
            (F.col("o_orderkey") + 10_000_000_000).alias("o_orderkey"),
            "o_orderstatus",
            "price",
        )
    )
    d = snapshot_diff(v1, v2, ["o_orderkey"], ["o_orderstatus", "price"])
    key_sum = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        .cast("decimal(38,0)")
    )
    return (
        d.groupBy("change_kind")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count(F.when(F.col("chg_o_orderstatus"), 1))
            .cast("bigint")
            .alias("n_status_changed"),
            F.count(F.when(F.col("chg_price"), 1)).cast("bigint").alias("n_price_changed"),
            (F.sum(key_sum) % F.lit(1099511627776)).cast("bigint").alias("key_sum"),
        )
        .orderBy("change_kind")
    )


@register(
    "orders_scd2_asof",
    oracle=f"""
        WITH {_SCD2_T2_CTES},
        o AS (
            SELECT o_custkey, o_orderkey % 3 AS asof_batch,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        )
        SELECT h.c_mktsegment AS segment_asof,
               COUNT(*)::BIGINT AS n_orders,
               CAST(SUM(o.price) AS DOUBLE) AS revenue
        FROM o JOIN t2 h
          ON o.o_custkey = h.c_custkey
         AND h.valid_from <= o.asof_batch
         AND (h.valid_to IS NULL OR h.valid_to > o.asof_batch)
        GROUP BY h.c_mktsegment ORDER BY segment_asof
    """,
    doc="The SCD2 payoff query — point-in-time dimension join: each "
    "order is attributed to the customer attributes that were current "
    "AT ITS AS-OF BATCH (deterministically o_orderkey % 3), via an "
    "equi-join on the key plus the [valid_from, valid_to) interval "
    "filter. A %10==3 customer's orders split across the old and the "
    "rotated segment depending on as-of time — the thing a "
    "current-only dimension gets wrong. Scale: the history dim stays "
    "dimension-sized (broadcast), the interval test is a post-join "
    "filter, never a range shuffle.",
    tags=("merge", "scd2", "join", "extension"),
)
def orders_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(segment_asof, n_orders, revenue): orders attributed to the
    customer segment current at each order's as-of batch."""
    h = _customer_history(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_orderkey") % 3).alias("asof_batch"),
        F.col("o_totalprice").cast(DEC).alias("price"),
    )
    j = o.join(
        F.broadcast(h),
        (F.col("o_custkey") == F.col("c_custkey"))
        & (F.col("valid_from") <= F.col("asof_batch"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("asof_batch"))),
    )
    return (
        j.groupBy(F.col("c_mktsegment").alias("segment_asof"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
        .orderBy("segment_asof")
    )
