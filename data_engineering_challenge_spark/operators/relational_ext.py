"""Extended relational surface: outer joins, pivot/unpivot, grouping
sets, and correlated-subquery shapes (TPC-H Q4/Q13/Q14/Q17 analogues).

The reference's relational surface stops at inner equi-joins and plain
GROUP BY (SURVEY.md §2.3-§2.4: src/sql/queries/*.sql are 2-table inner
joins at most). A drop-in engine needs the rest of the standard SQL
operator set; these register it over the same testdata star schema.

Scale notes (100 TB posture):
- Q13-shape left-outer is fact-side (orders) joined *to* customer on
  the customer key: both sides shuffle on the join key once, then the
  two-level aggregation reuses the first groupBy's hash partitioning
  (no second shuffle for the re-aggregation by c_count beyond the
  small distribution frame).
- The full-outer trade balance pre-aggregates BOTH sides to one row
  per nation before joining — outer-joining two 25-row aggregates
  instead of two raw fact tables. At 100 TB the pre-agg is the whole
  ballgame: the outer join never sees raw rows.
- PIVOT with an explicit value list needs no value-discovery job and
  one scan: Spark's two-stage pivot agg first reduces to
  |groups x values| rows with a partial+final hash agg, so every later
  exchange moves a handful of rows. Never call pivot() without the
  value list at scale: Spark must first run a distinct() job (an extra
  full scan + shuffle) to discover values.
- GROUPING SETS compiles to Expand (one replicated row per grouping
  set) feeding one hash agg — a single shuffle regardless of how many
  levels are requested.
- The Q17 shape joins lineitem to its own per-part aggregate. The
  threshold comparison (qty < 0.2*avg) is re-expressed in exact
  integer arithmetic (5*qty*cnt < sum_qty) so the result is invariant
  to partitioning and float summation order — the kind of rewrite that
  keeps a 100-TB answer stable run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

DEC = "decimal(18,2)"

# idle_customers_balance: a customer is "idle" with no order on/after
# this date (orders span 1995-01..2001-08 at every sf; this cutoff
# leaves a non-trivial idle cohort — 55 customers / 23 nations at
# sf0.01 — so the driver hash check exercises real rows)
IDLE_CUTOFF = "2000-01-01"


@register(
    "customer_order_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: LEFT OUTER JOIN keeping order-less customers "
    "(COUNT over nulls = 0), then a second-level distribution agg.",
    tags=("join", "outer", "extension"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count() skips nulls -> 0
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "nation_trade_balance",
    oracle="""
        WITH cust AS (
            SELECT c_nationkey AS nationkey,
                   SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS cust_bal,
                   COUNT(*) AS n_cust
            FROM customer WHERE c_nationkey >= 5 GROUP BY 1
        ), supp AS (
            SELECT s_nationkey AS nationkey,
                   SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS supp_bal,
                   COUNT(*) AS n_supp
            FROM supplier WHERE s_nationkey < 10 GROUP BY 1
        )
        SELECT CAST(COALESCE(cust.nationkey, supp.nationkey) AS INTEGER) AS nationkey,
               CAST(cust_bal AS DOUBLE) AS cust_bal, n_cust,
               CAST(supp_bal AS DOUBLE) AS supp_bal, n_supp
        FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
        ORDER BY nationkey
    """,
    doc="FULL OUTER JOIN of two per-nation aggregates with disjoint key "
    "ranges (customer side >=5, supplier side <10) so both unmatched "
    "directions are exercised; nulls surface on the missing side.",
    tags=("join", "outer", "extension"),
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") >= 5)
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 10)
    cust = c.groupBy(F.col("c_nationkey").alias("c_nk")).agg(
        F.sum(F.col("c_acctbal").cast(DEC)).alias("cust_bal"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    supp = s.groupBy(F.col("s_nationkey").alias("s_nk")).agg(
        F.sum(F.col("s_acctbal").cast(DEC)).alias("supp_bal"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    return (
        cust.join(supp, cust.c_nk == supp.s_nk, "full_outer")
        .select(
            F.coalesce("c_nk", "s_nk").cast("int").alias("nationkey"),
            F.col("cust_bal").cast("double").alias("cust_bal"),
            "n_cust",
            F.col("supp_bal").cast("double").alias("supp_bal"),
            "n_supp",
        )
        .orderBy("nationkey")
    )


@register(
    "orders_status_priority_pivot",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="PIVOT (long->wide) with an explicit value list: order counts by "
    "priority x status. Explicit values avoid the value-discovery "
    "distinct() job (an extra scan + shuffle at scale).",
    tags=("pivot", "extension"),
)
def orders_status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["O", "F", "P"]).count()
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    ).orderBy("o_orderpriority")


@register(
    "order_measures_unpivot",
    oracle="""
        WITH agg AS (
            SELECT o_orderpriority,
                   COUNT(*) AS n_orders,
                   COUNT(DISTINCT o_custkey) AS n_customers
            FROM orders GROUP BY 1
        )
        SELECT o_orderpriority, 'n_orders' AS measure, n_orders AS value FROM agg
        UNION ALL
        SELECT o_orderpriority, 'n_customers', n_customers FROM agg
        ORDER BY o_orderpriority, measure
    """,
    doc="UNPIVOT (wide->long, melt): per-priority measures to "
    "(key, measure, value) rows via DataFrame.unpivot.",
    tags=("pivot", "extension"),
)
def order_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "n_customers"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("o_orderpriority", "measure")


@register(
    "acctbal_grouping_sets",
    oracle="""
        SELECT r_name, n_name,
               CAST(GROUPING(r_name) AS INTEGER) AS g_region,
               CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
               COUNT(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        ORDER BY g_region, g_nation, r_name, n_name
    """,
    doc="GROUPING SETS ((region,nation),(region),()) with GROUPING() "
    "flags - one Expand + one hash agg, a single shuffle for all three "
    "levels (vs three separate groupBys at 100 TB).",
    tags=("agg", "grouping-sets", "extension"),
)
def acctbal_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        c.c_nationkey == F.col("n_nationkey"),
    )
    return (
        joined.groupingSets(
            [["r_name", "n_name"], ["r_name"], []], "r_name", "n_name"
        )
        .agg(
            F.grouping("r_name").cast("int").alias("g_region"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select("r_name", "n_name", "g_region", "g_nation", "total_bal", "n_customers")
        .orderBy("g_region", "g_nation", "r_name", "n_name")
    )


@register(
    "small_parts_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS below_avg_revenue,
               COUNT(*) AS n_lines
        FROM lineitem l1
        JOIN (
            SELECT l_partkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   COUNT(*) AS cnt
            FROM lineitem GROUP BY l_partkey
        ) a ON l1.l_partkey = a.l_partkey
        WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty
    """,
    doc="TPC-H Q17 shape: lineitems below 20% of their part's average "
    "quantity (correlated-scalar-subquery semantics, decorrelated to a "
    "self-agg join). qty < 0.2*avg is rewritten exactly as "
    "5*qty*cnt < sum_qty in integer space - partitioning-invariant.",
    tags=("join", "subquery", "extension"),
)
def small_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("bigint")
    per_part = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        l.join(per_part, l.l_partkey == per_part.pk)
        .filter(qty * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("below_avg_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "orders_with_discounted_lines",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a line-level predicate, "
    "planned as a left-semi hash join (each order counted once no "
    "matter how many qualifying lines).",
    tags=("join", "semi", "subquery", "extension"),
)
def orders_with_discounted_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "promo_revenue_share",
    oracle="""
        SELECT CAST(COALESCE(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2))) END),
                   0) AS DOUBLE) AS promo_revenue,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue,
               100.0 * CAST(COALESCE(SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(3,2))) END), 0) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                   AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
    """,
    doc="TPC-H Q14 shape: conditional (CASE-gated) aggregate ratio - "
    "promo revenue share for one month. Sums are exact decimals; the "
    "ratio divides the two exact sums as doubles (deterministic).",
    tags=("agg", "join", "extension"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-09-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-10-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(3,2)")
    )
    promo = F.coalesce(
        F.sum(F.when(F.col("p_type").like("PROMO%"), rev)), F.lit(0).cast(DEC)
    )
    total = F.sum(rev)
    return (
        l.join(p, l.l_partkey == p.p_partkey)  # part scales with SF: no hint
        .agg(
            promo.cast("double").alias("promo_revenue"),
            total.cast("double").alias("total_revenue"),
            (F.lit(100.0) * promo.cast("double") / total.cast("double")).alias(
                "promo_share_pct"
            ),
        )
    )


@register(
    "tx_per_store_salted",
    oracle="""
        SELECT l_suppkey,
               COUNT(DISTINCT l_orderkey) AS n_distinct_l_orderkey
        FROM lineitem
        GROUP BY l_suppkey
        ORDER BY l_suppkey
    """,
    doc="The A3 count-distinct re-planned through the skew-mitigation "
    "path (operators/skew.py:salted_count_distinct): the distinct runs "
    "on (group, salt-of-value), spreading any hot group over 8 "
    "reducers, then per-salt partials sum. The oracle is the plain "
    "COUNT(DISTINCT) - salting must be semantically invisible.",
    tags=("agg", "skew", "extension"),
)
def tx_per_store_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .skew import salted_count_distinct

    l = load_table(spark, sf_dir, "lineitem")
    return salted_count_distinct(l, "l_suppkey", "l_orderkey").orderBy("l_suppkey")


@register(
    "segment_event_value_salted",
    oracle="""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    doc="Fact-dim join re-planned through the skew-mitigation path "
    "(operators/skew.py:salted_join): the events fact side gets a "
    "deterministic row-content salt, the customer dim replicates once "
    "per salt value, and the join key becomes (user_id, salt) so a "
    "pathologically hot user spreads over 8 reducers instead of "
    "funnelling one. The oracle is the plain unsalted join - salting "
    "must be semantically invisible (the same contract as "
    "tx_per_store_salted; the Zipf spread pin lives in "
    "tests/test_dedup_skew_cap.py). Value sums are exact decimal math "
    "re-rounded to scale 2 before the double cast (the pricing_summary "
    "rule - per-segment sums pass 2^53/10^4 around sf100).",
    tags=("join", "skew", "extension"),
)
def segment_event_value_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .skew import salted_join

    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(e, c, "user_id", "c_custkey")
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "blamed_suppliers",
    oracle="""
        WITH per_order AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supps,
                   COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                       THEN l_suppkey END) AS n_ret
            FROM lineitem GROUP BY l_orderkey
        ),
        r AS (SELECT DISTINCT l_orderkey, l_suppkey
              FROM lineitem WHERE l_returnflag = 'R')
        SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM r JOIN per_order USING (l_orderkey)
        WHERE n_supps >= 2 AND n_ret = 1
        GROUP BY l_suppkey
        ORDER BY numwait DESC, l_suppkey
        LIMIT 20
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): supplier "
    "had a returned line on a multi-supplier order where NO other "
    "supplier's lines were returned — the EXISTS + NOT-EXISTS "
    "correlated pair rewritten as one per-order aggregation "
    "(n_supps>=2 AND n_ret=1) joined back to the returned lines: two "
    "shuffles on l_orderkey total, no repeated correlated scans of "
    "lineitem. Top-k with a key tie-break plans as "
    "TakeOrderedAndProject.",
    tags=("join", "subquery", "topk", "extension"),
)
def blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    # r11 (guide §2.3 aggregate before you shuffle): the old plan's two
    # COUNT(DISTINCT ...) in one aggregate planned an Expand that
    # multiplied every lineitem row 3x before the exchange, and the
    # returned-pairs side re-scanned lineitem for a separate distinct.
    # Both reduce to ONE (l_orderkey, l_suppkey) pair dedup with a
    # has_ret flag (partial-agged map-side): n_supps = pairs per order,
    # n_ret = flagged pairs per order, r = flagged pairs. The two
    # consumers shuffle identically, so Spark reuses the exchange —
    # one pass over lineitem, no Expand. count("l_suppkey") keeps
    # COUNT(DISTINCT)'s NULL exclusion.
    p = (
        l.select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_returnflag") == "R").alias("r"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("r").alias("has_ret"))
    )
    per_order = p.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("n_supps"),
        F.count(F.when(F.col("has_ret"), F.col("l_suppkey"))).alias("n_ret"),
    )
    r = p.filter(F.col("has_ret")).select("l_orderkey", "l_suppkey")
    return (
        r.join(per_order, "l_orderkey")
        .filter((F.col("n_supps") >= 2) & (F.col("n_ret") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("l_suppkey"))
        .limit(20)
    )


@register(
    "idle_customers_balance",
    oracle=f"""
        WITH thr AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                       / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM customer, thr
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= DATE '{IDLE_CUTOFF}')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    doc="TPC-H Q22 shape (well-funded customers gone idle — no order "
    "since the cutoff): scalar-subquery threshold (exact decimal sum "
    "/ count — partition-invariant, unlike a float AVG) + anti-join "
    "against the date-filtered orders, aggregated per nation. The "
    "threshold is a 1-row broadcast frame (no collect round-trip); "
    "the date predicate pushes into the orders parquet scan BEFORE "
    "the anti-join (smaller build side); the anti-join plans as a "
    "broadcast/shuffled left-anti hash join, never a per-row probe. "
    "(Q22's literal 'never ordered' predicate is empty on this "
    "synthetic data — every customer has ordered — so the driver row "
    "would only ever compare 0 vs 0; the idle-window variant keeps "
    "the identical plan shape while making the hash check exercise "
    "real threshold/anti-join/decimal arithmetic.)",
    tags=("join", "anti", "subquery", "extension"),
)
def idle_customers_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(IDLE_CUTOFF).cast("date")
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )
