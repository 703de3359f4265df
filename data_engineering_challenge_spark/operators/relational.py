"""The reference's analytic query set, transposed to the testdata star
schema (mapping in FIXTURES.md §B).

Reference queries (all delegated to PostgreSQL there, executed by
Catalyst here):
- revenue per day            -> reference src/sql/queries/revenue_split_per_day.sql:1-6
- top-10 products by units   -> src/sql/queries/top_10_products_units_sold.sql:1-7
- tx count + distinct/store  -> src/sql/queries/number_transactions_per_store.sql:1-7
- dataset timeframe          -> src/sql/queries/transactions_timeframe.sql:1-4
- margin, 2 calendar months  -> src/sql/queries/total_margin_signature_last_2_months.sql:1-21
- margin, rolling 60 days    -> src/sql/queries/total_margin_signature_last_2_months_in_days.sql:1-11
- duplicate-group audit      -> notebooks/profiling.ipynb cells 26-29

Scale notes (100 TB posture):
- `part` is the dim side -> explicit ``F.broadcast`` so the fact scan
  never shuffles for the join (reference used a B-tree FK index,
  src/db/sql/schema.sql:43; broadcast-hash is the Spark analogue).
- Scalar window bounds (max date) are computed as a 1-row DataFrame and
  cross-joined broadcast — no ``.collect()`` round-trip, the whole plan
  stays on executors.
- Aggregations are partial+final hash aggs (map-side combine) for free.
- Money/quantity doubles are cast to DECIMAL *before* SUM: decimal
  addition is exact and order-independent, so results are identical
  regardless of partitioning — and identical to the DuckDB oracle.
- Decimal stays INTERNAL: every final projection casts the exact
  decimal aggregate to double on both engines. At gate scale the
  unscaled sums are < 2^53, so the decimal→double conversion is the
  same exact IEEE value on both sides; emitting DecimalType would
  instead expose engine-specific scale/trailing-zero rendering to
  the driver's hash (the round-1 failure class).
- Top-k is ORDER BY + LIMIT, which Catalyst plans as
  TakeOrderedAndProject (per-partition top-k then merge on driver) —
  no global sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

DEC = "decimal(18,2)"  # exact money math; Postgres NUMERIC analogue (SURVEY §1.3)


@register(
    "revenue_per_day",
    oracle="""
        SELECT CAST(o_orderdate AS DATE) AS order_date,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        FROM orders
        GROUP BY 1
        ORDER BY 1
    """,
    doc="GROUP BY day + SUM (reference revenue_split_per_day.sql).",
    tags=("reference", "agg"),
)
def revenue_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_revenue"))
        .orderBy("order_date")
    )


@register(
    "top10_units",
    oracle="""
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_units_sold
        FROM lineitem
        GROUP BY l_partkey
        ORDER BY total_units_sold DESC, l_partkey
        LIMIT 10
    """,
    doc="Top-10 by units sold (reference top_10_products_units_sold.sql); "
    "stable tie-break on key so LIMIT is deterministic.",
    tags=("reference", "topk"),
)
def top10_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_units_sold"))
        .orderBy(F.desc("total_units_sold"), F.asc("l_partkey"))
        .limit(10)
    )


@register(
    "tx_per_store",
    oracle="""
        SELECT l_suppkey,
               COUNT(l_orderkey) AS n_tx,
               COUNT(DISTINCT l_orderkey) AS n_unique_tx
        FROM lineitem
        GROUP BY l_suppkey
        ORDER BY l_suppkey
    """,
    doc="COUNT + COUNT(DISTINCT) per group (reference number_transactions_per_store.sql).",
    tags=("reference", "agg"),
)
def tx_per_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_suppkey")
        .agg(
            F.count("l_orderkey").alias("n_tx"),
            F.countDistinct("l_orderkey").alias("n_unique_tx"),
        )
        .orderBy("l_suppkey")
    )


@register(
    "timeframe",
    oracle="""
        SELECT CAST(MIN(o_orderdate) AS DATE) AS first_order_date,
               CAST(MAX(o_orderdate) AS DATE) AS last_order_date
        FROM orders
    """,
    doc="Ungrouped MIN/MAX (reference transactions_timeframe.sql).",
    tags=("reference", "agg"),
)
def timeframe(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_order_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order_date"),
    )


def _promo_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim) with the 'signature product' predicate.

    `p_type = 'PROMO'` plays the role of `signature_product IS TRUE`
    (reference schema src/db/sql/schema.sql:6). Filter applied before
    the join so Catalyst prunes the dim build side too.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    # No broadcast HINT: part scales with SF, and a hint overrides
    # Spark's 8 GiB broadcast ceiling check unsafely (the sf100 probe
    # failed exactly here at 13.7 GiB). Catalyst/AQE still broadcasts
    # whenever the filtered dim is actually small — the plan test
    # asserts BroadcastHashJoin at test SF without the hint. Hints are
    # reserved for cardinality-BOUNDED frames (region/nation, 1-row
    # bounds, centroid/threshold tables).
    return l.join(p, l.l_partkey == p.p_partkey, "inner")


@register(
    "margin_signature_2months",
    oracle="""
        WITH anchor AS (
            SELECT date_trunc('month', CAST(MAX(l_shipdate) AS DATE)) AS m
            FROM lineitem
        ),
        month_window AS (
            SELECT CAST(m - INTERVAL 1 MONTH AS DATE) AS start_d,
                   CAST(m + INTERVAL 1 MONTH AS DATE) AS end_d
            FROM anchor
        )
        SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
                   AS total_margin
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN month_window ON TRUE
        WHERE p_type = 'PROMO'
          AND CAST(l_shipdate AS DATE) >= start_d
          AND CAST(l_shipdate AS DATE) < end_d
    """,
    doc="Filtered SUM over a 2-calendar-month half-open window anchored at "
    "trunc(max(date),'month') (reference total_margin_signature_last_2_months.sql). "
    "Margin NOT multiplied by quantity (reference README.md:198).",
    tags=("reference", "join", "window-filter"),
)
def margin_signature_2months(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # 1-row bounds frame, broadcast cross join — no driver collect.
    bounds = (
        l.agg(F.trunc(F.max(F.col("l_shipdate").cast("date")), "month").alias("m"))
        .select(F.add_months("m", -1).alias("start_d"), F.add_months("m", 1).alias("end_d"))
    )
    d = F.col("l_shipdate").cast("date")
    return (
        _promo_join(spark, sf_dir)
        .crossJoin(F.broadcast(bounds))
        .filter((d >= F.col("start_d")) & (d < F.col("end_d")))
        .agg(
            F.coalesce(F.sum(F.col("l_extendedprice").cast(DEC)), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_margin")
        )
    )


@register(
    "margin_signature_60days",
    oracle="""
        SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
                   AS total_margin
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND CAST(l_shipdate AS DATE)
              BETWEEN (SELECT CAST(MAX(l_shipdate) AS DATE) - 60 FROM lineitem)
                  AND (SELECT CAST(MAX(l_shipdate) AS DATE) FROM lineitem)
    """,
    doc="Rolling closed 60-day window variant (reference "
    "total_margin_signature_last_2_months_in_days.sql, scalar subquery bounds).",
    tags=("reference", "join", "window-filter"),
)
def margin_signature_60days(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    bounds = l.agg(F.max(F.col("l_shipdate").cast("date")).alias("end_d")).select(
        F.date_sub("end_d", 60).alias("start_d"), "end_d"
    )
    d = F.col("l_shipdate").cast("date")
    return (
        _promo_join(spark, sf_dir)
        .crossJoin(F.broadcast(bounds))
        .filter(d.between(F.col("start_d"), F.col("end_d")))
        .agg(
            F.coalesce(F.sum(F.col("l_extendedprice").cast(DEC)), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_margin")
        )
    )


@register(
    "dup_groups",
    oracle="""
        SELECT l_partkey, l_suppkey, l_quantity, COUNT(*) AS n_dup
        FROM lineitem
        GROUP BY l_partkey, l_suppkey, l_quantity
        HAVING COUNT(*) > 1
        ORDER BY n_dup DESC, l_partkey, l_suppkey, l_quantity
    """,
    doc="Duplicate-group audit: group by a column subset, keep groups with "
    "count>1 (reference notebook cells 26-29; README.md:192 — 76 dup groups).",
    tags=("reference", "dedup"),
)
def dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    keys = ["l_partkey", "l_suppkey", "l_quantity"]
    return (
        l.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
        .orderBy(F.desc("n_dup"), *keys)
    )


@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))), 2) AS DOUBLE)
                   AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))
                   * (1 + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary — the flagship multi-agg scan. "
    "Inputs are exact 2-decimal values, so price/discount/tax are cast "
    "to DECIMAL *before* multiplying: every op is exact decimal math, "
    "identical across engines and partitionings (a double product cast "
    "to decimal would tie-break differently in Spark vs DuckDB). The "
    "scale-6 product sums are HALF_UP-rounded back to scale 2 BEFORE "
    "the double cast: above ~1e10 a scale-6 decimal exceeds double's "
    "53-bit mantissa and DuckDB's int128/10^6 conversion double-rounds "
    "(1-ulp divergence, first seen at sf1), while a scale-2 decimal "
    "under 2^53×10⁻² converts with a single rounding in both engines.",
    tags=("flagship", "agg"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice").cast(DEC)
    disc_price = ep * (F.lit(1) - F.col("l_discount").cast("decimal(3,2)"))
    charge = disc_price * (F.lit(1) + F.col("l_tax").cast("decimal(3,2)"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "sales_cube",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag) AS g_flag,
               GROUPING(l_linestatus) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
    doc="CUBE over (returnflag, linestatus) with per-column GROUPING "
    "flags — all four grouping sets in one pass (Spark expands the "
    "cube map-side; still a single shuffle).",
    tags=("agg", "cube"),
)
def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@register(
    "parts_shipped_both_years",
    oracle="""
        SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1997
        INTERSECT
        SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1998
        ORDER BY l_partkey
    """,
    doc="Row-level INTERSECT (set semantics): parts shipped in both "
    "1997 and 1998. Catalyst plans intersect as a left-semi aggregate "
    "join — one shuffle per side on the compared columns.",
    tags=("setop",),
)
def parts_shipped_both_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    y = F.year("l_shipdate")
    a = l.filter(y == 1997).select("l_partkey")
    b = l.filter(y == 1998).select("l_partkey")
    return a.intersect(b).orderBy("l_partkey")


@register(
    "supplier_shipments_lost_yoy",
    oracle="""
        SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1997
        EXCEPT ALL
        SELECT l_suppkey FROM lineitem WHERE year(l_shipdate) = 1998
        ORDER BY l_suppkey
    """,
    doc="Row-level EXCEPT ALL (bag semantics): per-supplier shipment "
    "multiplicity lost year-over-year — exceptAll keeps the count "
    "difference per key, unlike set EXCEPT.",
    tags=("setop",),
)
def supplier_shipments_lost_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    y = F.year("l_shipdate")
    a = l.filter(y == 1997).select("l_suppkey")
    b = l.filter(y == 1998).select("l_suppkey")
    return a.exceptAll(b).orderBy("l_suppkey")


@register(
    "shipping_priority_top10",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
               CAST(o_orderdate AS DATE) AS order_date
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
          AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
        GROUP BY l_orderkey, order_date
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shape: 3-way join (customer segment filter pushed to "
    "the dim scan, broadcast; orders-lineitem co-keyed), grouped "
    "revenue, distributed top-10. Exercises Catalyst's multi-join "
    "planning with mixed broadcast/shuffle strategies.",
    tags=("join", "topk", "agg"),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-01-01").cast("date")
    )
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # customer scales with SF: no hint (AQE decides)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_date")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-way star join — region→nation→customer dims "
    "broadcast down onto the orders-lineitem fact spine, supplier "
    "joined with the local-supplier condition (s_nationkey = "
    "c_nationkey). One fact shuffle on orderkey; every dim is a "
    "broadcast hash join.",
    tags=("join", "agg"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    cust_in_region = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        # customer/supplier scale with SF — no broadcast hints (the
        # bounded nation x region frame above keeps its hint); AQE
        # broadcasts them whenever they are genuinely small
        .join(cust_in_region, o.o_custkey == F.col("c_custkey"))
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "customers_without_orders",
    oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders
            WHERE o_custkey IS NOT NULL AND year(CAST(o_orderdate AS DATE)) = 1995
        )
        ORDER BY c_custkey
    """,
    doc="Anti join (NOT IN / left_anti): customers with no 1995 order. "
    "Catalyst plans left_anti as a broadcast/hash anti join — no "
    "full materialization of the complement.",
    tags=("join", "setop"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year(F.col("o_orderdate").cast("date")) == 1995
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@register(
    "suppliers_of_promo_parts",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_type = 'PROMO'
        )
        ORDER BY s_suppkey
    """,
    doc="Semi join (IN / left_semi): suppliers that shipped at least one "
    "signature (PROMO) part — existence check without duplication.",
    tags=("join", "setop"),
)
def suppliers_of_promo_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    promo_supp = l.join(p, l.l_partkey == p.p_partkey).select("l_suppkey")  # part scales with SF: no hint
    return (
        s.join(promo_supp, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "quantity_quartiles",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.50) AS q50,
               quantile_cont(l_quantity, 0.75) AS q75,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (ordered-set "
    "aggregate). Order statistics are accumulation-free — unlike "
    "avg/stddev of doubles they are bit-identical across engines and "
    "partitionings. Spark sorts within the aggregation buffer; at "
    "scale, approx_percentile is the sketch-based alternative.",
    tags=("agg", "percentile"),
)
def quantity_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.25).alias("q25"),
            F.percentile("l_quantity", 0.50).alias("q50"),
            F.percentile("l_quantity", 0.75).alias("q75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )
