"""Remaining TPC-H-shape relational queries over the star schema:
Q6, Q7, Q8, Q9, Q10, Q12, Q15, Q18, Q19 analogues.

The reference's relational surface is six 2-table SQL queries
(`/root/reference/src/db/queries/*.sql` — revenue per day, top units,
tx per store, timeframe, margin signatures); rounds 1-5 added the
Q1/Q3/Q4/Q5/Q13/Q14/Q17/Q21/Q22 shapes. This module completes the
classic decision-support operator set that the synthetic star schema
can express (no partsupp table -> Q2/Q11/Q16/Q20 are out of scope;
no l_shipmode/commitdate -> Q12 is re-keyed on ship-lag buckets).

Scale posture (100 TB):
- Every query keeps the lineitem/orders fact spine on ONE shuffle key
  chain (orderkey, then custkey/suppkey aggregations over the joined
  frame); dims are filtered before the join so AQE broadcasts the
  survivors. Fixed-size dims (nation, region) keep explicit broadcast
  hints; SF-scaled dims (part, supplier, customer) never do — the
  sf100 probe showed a hint overrides Spark's broadcast ceiling
  unsafely (see relational.py margin note).
- Q15's "suppliers achieving the max" is a 1-row broadcast bounds
  frame cross-joined back onto the per-supplier aggregate — the
  equality test runs on the EXACT decimal sum, never on a double.
- Q18's HAVING runs on the per-order aggregate *before* the customer
  join: the join input is |big orders|, not |lineitem|.
- Q19's disjunction is a single OR predicate evaluated inside the
  joined scan — one part join feeds all three arms; Catalyst derives
  the common `p_size >= 1 AND l_quantity <= 30`-style bounds for
  partition pruning.
- Money math follows the repo-wide discipline (relational.py:22):
  cast to DECIMAL before SUM (exact, partitioning-invariant), cast
  the final aggregate to DOUBLE on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

DEC = "decimal(18,2)"

# Revenue expression shared by most queries: exact decimal
# extendedprice * (1 - discount).
def _rev() -> F.Column:
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l_discount AS DECIMAL(3,2)))"
)


@register(
    "forecast_revenue_change",
    oracle="""
        SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(3,2))), 0) AS DOUBLE)
               AS revenue_change
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
          AND l_discount >= 0.045 AND l_discount <= 0.075
          AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: single-table predicate revenue scan — the "
    "canonical pushdown query (every filter reaches the parquet "
    "scan; no join, no shuffle beyond the final 1-row reduce). The "
    "discount band uses mid-gap bounds (0.045/0.075) so double "
    "representability can never flip a boundary row between engines.",
    tags=("agg", "pushdown", "extension"),
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    amount = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(
        "decimal(3,2)"
    )
    return (
        l.filter(
            (d >= F.lit("1997-01-01").cast("date"))
            & (d < F.lit("1998-01-01").cast("date"))
            & (F.col("l_discount") >= 0.045)
            & (F.col("l_discount") <= 0.075)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(F.sum(amount), F.lit(0).cast("decimal(22,4)"))
            .cast("double")
            .alias("revenue_change")
        )
    )


@register(
    "volume_shipping",
    oracle=f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(vol) AS DOUBLE) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(CAST(l_shipdate AS DATE)) AS l_year,
                   {_REV_SQL} AS vol
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        )
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations per "
    "ship year. The nation pair predicate is applied to the supplier "
    "and customer DIMS before the fact joins (each shrinks to ~1/25), "
    "so the disjunction never evaluates per lineitem row; the "
    "surviving dims broadcast under AQE.",
    tags=("join", "agg", "extension"),
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "nation_market_share",
    oracle=f"""
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                             ELSE 0 END) AS DOUBLE)
                   / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        FROM (
            SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
                   {_REV_SQL} AS vol,
                   n2.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region    ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        )
        GROUP BY o_year
        ORDER BY o_year
    """,
    doc="TPC-H Q8 shape: one nation's share of ECONOMY-part revenue "
    "sold to EUROPE-region customers, per order year — a conditional-"
    "sum ratio over a 7-table star join. Both sums aggregate the same "
    "exact decimal volume; the single division runs on the two "
    "double-cast totals per year (denominator > 0 whenever the group "
    "exists). part/supplier/customer join without hints (AQE "
    "broadcasts the filtered survivors); nation x region keeps its "
    "fixed-size hint.",
    tags=("join", "agg", "extension"),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf_dir, "nation")
    cust_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey"
    )
    c = load_table(spark, sf_dir, "customer").join(
        F.broadcast(cust_nations), F.col("c_nationkey") == F.col("n_nationkey")
    )
    supp_nation = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    s = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    vol = _rev()
    zero = F.lit(0).cast("decimal(23,4)")
    joined = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == F.col("c_custkey"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "product_type_profit",
    oracle=f"""
        SELECT n_name AS nation, o_year,
               CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS profit
        FROM (
            SELECT n_name, year(CAST(o_orderdate AS DATE)) AS o_year,
                   {_REV_SQL}
                   - CAST(p_retailprice AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(4,1))
                     * CAST(0.5 AS DECIMAL(2,1)) AS amount
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%bolt%'
        )
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit on 'bolt' parts per supplier nation "
    "and order year. The schema has no partsupp/supplycost, so cost "
    "is re-keyed to half the part's retail price x quantity — same "
    "join graph and arithmetic shape (revenue minus cost inside the "
    "sum), all in exact decimal, rounded once at the end. The LIKE "
    "filter shrinks part before the join (no hint; AQE broadcasts).",
    tags=("join", "agg", "extension"),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    amount = _rev() - (
        F.col("p_retailprice").cast(DEC)
        * F.col("l_quantity").cast("decimal(4,1)")
        * F.lit(0.5).cast("decimal(2,1)")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "returned_item_customers",
    oracle=f"""
        SELECT c_custkey, c_name,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1998-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10 shape: customers who returned the most revenue in a "
    "quarter — 4-way join, grouped revenue, distributed top-20 "
    "(TakeOrderedAndProject; ties broken on c_custkey so the LIMIT "
    "edge is deterministic on both engines). The quarter filter "
    "prunes orders at the scan; the returnflag filter prunes "
    "lineitem at the scan.",
    tags=("join", "topk", "agg", "extension"),
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1998-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-04-01").cast("date"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "late_shipment_priority",
    oracle="""
        SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) > 90 THEN 'late'
                    WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) > 30 THEN 'slow'
                    ELSE 'fast' END AS ship_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_count
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        GROUP BY ship_bucket
        ORDER BY ship_bucket
    """,
    doc="TPC-H Q12 shape re-keyed on ship lag (the schema has no "
    "l_shipmode): line counts by order priority class per "
    "order-to-ship latency bucket. The classic dual conditional "
    "aggregate — one fact-fact join on orderkey, one hash agg over "
    "three buckets, no second shuffle.",
    tags=("join", "agg", "extension"),
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    lag = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(lag > 90, F.lit("late")).when(lag > 30, F.lit("slow")).otherwise("fast")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "top_supplier_by_revenue",
    oracle=f"""
        WITH srev AS (
            SELECT l_suppkey,
                   SUM({_REV_SQL}) AS total_rev
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
              AND CAST(l_shipdate AS DATE) < DATE '1997-07-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM supplier
        JOIN srev ON s_suppkey = l_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM srev)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: the supplier(s) with maximum half-year "
    "revenue. The max is a 1-row aggregate of the per-supplier frame, "
    "broadcast cross-joined back for the equality test — which runs "
    "on the EXACT decimal sum (never the double cast), so float "
    "representation can't drop a tied supplier. No driver collect.",
    tags=("join", "agg", "subquery", "extension"),
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate").cast("date")
    srev = (
        l.filter(
            (d >= F.lit("1997-01-01").cast("date"))
            & (d < F.lit("1997-07-01").cast("date"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    best = srev.agg(F.max("total_rev").alias("best_rev"))
    return (
        srev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "large_volume_customers",
    oracle="""
        WITH big AS (
            SELECT l_orderkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
        )
        SELECT c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               o_totalprice,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc="TPC-H Q18 shape: orders whose total quantity exceeds 300 "
    "(large-volume customers), top-100 by order value. The HAVING "
    "runs on the per-order aggregate BEFORE any join — the customer "
    "join input is |big orders| (~0.1% of orders), not |lineitem|. "
    "Exact decimal HAVING threshold; raw stored o_totalprice in the "
    "output (no recomputation to diverge).",
    tags=("join", "agg", "topk", "extension"),
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "brand_size_disjunction_revenue",
    oracle=f"""
        SELECT CAST(COALESCE(SUM({_REV_SQL}), 0) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: revenue under an OR-of-ANDs predicate mixing "
    "part attributes (brand, size) and line attributes (quantity). "
    "One part join feeds all three arms; Catalyst pushes the "
    "part-only disjunction (brand/size) down to the part scan and "
    "the derived quantity bounds to the lineitem scan.",
    tags=("join", "agg", "pushdown", "extension"),
)
def brand_size_disjunction_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    arm1 = (
        (F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
        & q.between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
        & q.between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#5") & F.col("p_size").between(1, 15)
        & q.between(20, 30)
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(arm1 | arm2 | arm3)
        .agg(
            F.coalesce(F.sum(_rev()), F.lit(0).cast("decimal(23,4)"))
            .cast("double")
            .alias("revenue")
        )
    )
