"""Scale-factor testdata generator — measure the engine ABOVE sf0.1.

The driver ships deterministic testdata up to sf0.1 (~600k lineitem
rows, 17 MB total). Every 100-TB claim in SCALING.md is extrapolated
from that; this tool generates the same star schema at arbitrary sf
(sf1 ≈ 6M lineitem rows, sf10 ≈ 60M, …) so the suite and the oracle
sweep can be RUN at scale instead of argued at scale.

Design (the generator itself is a scale exhibit):
- Fully distributed: every table derives from `spark.range(n)` +
  hash-based column expressions (xxhash64 → pmod buckets). The driver
  materializes nothing; generating 10^9 rows costs the cluster one
  embarrassingly parallel pass per table.
- Deterministic & partition-invariant: all values are pure functions
  of the row id (content-addressed, like sources/synthetic.py — no
  RNG, because seeds don't survive re-partitioning).
- 100% JVM-side: text synthesis uses transform/sequence/array_join,
  embeddings use transform + aggregate-normalize. No Python in any
  generation path.
- Mirrors the driver data's SHAPE at sf0.1 (schemas byte-compatible,
  value domains and key distributions measured from
  /root/testdata/sf0.1 — row counts, date spans, dup/near-dup rate,
  label-clustered embeddings, EU of the same five mktsegments, …), so
  per-query timings at sf1 are comparable to BENCH_r*.json at sf0.1.
  Values are NOT bit-identical to the driver's seed-42 stream; every
  correctness check re-runs Spark vs DuckDB on the same files, so
  parity does not depend on matching the driver's RNG.

Usage:
    python tools/gen_sf.py --sf 1 --out /root/repo/.data/sf1
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_challenge_spark.session import get_session

REGIONS = ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
STATUSES = ("F", "O", "P")
RETURNFLAGS = ("A", "N", "R")
LINESTATUSES = ("O", "F")
PTYPES = ("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
PART_ADJ = ("large", "hot", "blue", "old", "cold", "red", "small", "dim")
PART_NOUN = ("ring", "bolt", "plate", "gear", "cog", "tube", "wire", "pin")
# the sf0.1 corpus vocabulary (31 engine-flavoured words)
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
LANGS = ("en", "en", "fr", "es", "de", "zh")  # en ~2x the rest, as at sf0.1

ORDERS_EPOCH = "1995-01-01"
ORDERS_SPAN_DAYS = 2404  # .. 2001-08-01, the driver's span
EVENTS_EPOCH = "2024-01-01"
EVENTS_SPAN_SECONDS = 30 * 24 * 3600  # one month of stream
EMB_DIM = 64
N_LABELS = 10

# exact-dup / near-dup stripes for the dedup operator families
# (sf0.1 driver data: 8 exact-dup pairs in 5000 docs ≈ 1/600)
DUP_STRIPE = 613
NEAR_STRIPE = 617


def _h(*cols) -> F.Column:
    """Deterministic 64-bit hash of the given columns/literals."""
    from pyspark.sql import Column

    return F.xxhash64(*[c if isinstance(c, Column) else F.lit(c) for c in cols])


def _u(*cols) -> F.Column:
    """Uniform double in [0,1) derived from a hash (content-addressed)."""
    return (F.pmod(_h(*cols), F.lit(1_000_000)).cast("double")) / 1_000_000.0


def _pick(options: tuple[str, ...], *cols) -> F.Column:
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(_h(*cols), F.lit(len(options))) + 1).cast("int"))


def counts_for(sf: float) -> dict[str, int]:
    return {
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "events": int(1_000_000 * sf),
        "documents": int(50_000 * sf),
        # driver scaling is sub-linear for embeddings (500 @0.01 →
        # 2000 @0.1 = 4× per decade): 8000·sf^log10(4)
        "embeddings": int(8_000 * sf**0.602),
        "event_users": int(15_000 * sf),
    }


def _range(spark: SparkSession, n: int, id_col: str) -> DataFrame:
    # ~500k rows per generation task: enough tasks to fill the cluster,
    # few enough that task overhead stays negligible
    parts = max(8, math.ceil(n / 500_000))
    return spark.range(0, n, 1, parts).withColumnRenamed("id", id_col)


def gen_region(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, r) for i, r in enumerate(REGIONS)], "r_regionkey bigint, r_name string"
    )


def gen_nation(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(25)],
        "n_nationkey bigint, n_name string, n_regionkey int",
    )


def gen_customer(spark: SparkSession, n: int) -> DataFrame:
    df = _range(spark, n, "c_custkey")
    k = F.col("c_custkey")
    return df.select(
        k,
        F.format_string("Customer#%09d", k).alias("c_name"),
        F.pmod(_h(k, "cn"), F.lit(25)).cast("int").alias("c_nationkey"),
        F.round(-999.99 + _u(k, "cb") * 10999.79, 2).alias("c_acctbal"),
        _pick(SEGMENTS, k, "cs").alias("c_mktsegment"),
    )


def gen_supplier(spark: SparkSession, n: int) -> DataFrame:
    df = _range(spark, n, "s_suppkey")
    k = F.col("s_suppkey")
    return df.select(
        k,
        F.format_string("Supplier#%09d", k).alias("s_name"),
        F.pmod(_h(k, "sn"), F.lit(25)).cast("int").alias("s_nationkey"),
        F.round(-999.99 + _u(k, "sb") * 10999.79, 2).alias("s_acctbal"),
    )


def gen_part(spark: SparkSession, n: int) -> DataFrame:
    df = _range(spark, n, "p_partkey")
    k = F.col("p_partkey")
    name = F.concat_ws(" ", _pick(PART_ADJ, k, "pa"), _pick(PART_NOUN, k, "pn"))
    return df.select(
        k,
        name.alias("p_name"),
        F.concat(F.lit("Brand#"), (F.pmod(_h(k, "pb"), F.lit(25)) + 1).cast("string")).alias(
            "p_brand"
        ),
        _pick(PTYPES, k, "pt").alias("p_type"),
        (F.pmod(_h(k, "ps"), F.lit(50)) + 1).cast("int").alias("p_size"),
        # 900.0 .. 999.9 in 0.1 steps, cycling with the key (driver shape)
        (900.0 + F.pmod(k, F.lit(1000)).cast("double") / 10.0).alias("p_retailprice"),
    )


def _ts_ntz(epoch: str, offset_seconds: F.Column) -> F.Column:
    return F.expr(
        f"cast(timestamp'{epoch} 00:00:00' as timestamp_ntz)"
    ) + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), offset_seconds)


def gen_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    df = _range(spark, n, "o_orderkey")
    k = F.col("o_orderkey")
    day = F.pmod(_h(k, "od"), F.lit(ORDERS_SPAN_DAYS))
    return df.select(
        k,
        F.pmod(_h(k, "oc"), F.lit(n_cust)).alias("o_custkey"),
        _pick(STATUSES, k, "os").alias("o_orderstatus"),
        F.round(1000.0 + _u(k, "op") * 499000.0, 2).alias("o_totalprice"),
        _ts_ntz(ORDERS_EPOCH, (day * 86400).cast("double")).alias("o_orderdate"),
        _pick(PRIORITIES, k, "opr").alias("o_orderpriority"),
    )


def gen_lineitem(orders: DataFrame, n_part: int, n_supp: int) -> DataFrame:
    ok = F.col("o_orderkey")
    # 1..7 lines/order (avg 4), ~1/55 of orders with no lines at all —
    # the driver data's lines-per-order shape (avg 4.08, some orderless)
    n_lines = F.when(F.pmod(_h(ok, "ln"), F.lit(55)) == 0, F.lit(0)).otherwise(
        (F.pmod(_h(ok, "lc"), F.lit(7)) + 1).cast("int")
    )
    base = orders.select(ok, F.col("o_orderdate"), n_lines.alias("n_lines")).filter(
        F.col("n_lines") > 0
    )
    ln = F.col("l_linenumber")
    exploded = base.select(
        ok.alias("l_orderkey"),
        "o_orderdate",
        F.explode(F.sequence(F.lit(1), F.col("n_lines"))).alias("l_linenumber"),
    )
    lk = F.col("l_orderkey")
    qty = (F.pmod(_h(lk, ln, "lq"), F.lit(50)) + 1).cast("double")
    price_per_unit = 900.0 + _u(lk, ln, "lp") * 1200.0
    return exploded.select(
        lk,
        F.pmod(_h(lk, ln, "lpk"), F.lit(n_part)).alias("l_partkey"),
        F.pmod(_h(lk, ln, "lsk"), F.lit(n_supp)).alias("l_suppkey"),
        ln.cast("int"),
        qty.alias("l_quantity"),
        F.round(qty * price_per_unit, 2).alias("l_extendedprice"),
        (F.pmod(_h(lk, ln, "ld"), F.lit(11)).cast("double") / 100.0).alias("l_discount"),
        (F.pmod(_h(lk, ln, "lt"), F.lit(9)).cast("double") / 100.0).alias("l_tax"),
        _pick(RETURNFLAGS, lk, ln, "lr").alias("l_returnflag"),
        _pick(LINESTATUSES, lk, ln, "ll").alias("l_linestatus"),
        (
            F.col("o_orderdate")
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                ((F.pmod(_h(lk, ln, "lsd"), F.lit(95)) + 1) * 86400).cast("double"),
            )
        ).alias("l_shipdate"),
    )


def gen_events(
    spark: SparkSession, n: int, n_users: int, hot_user_share: float = 0.0
) -> DataFrame:
    """`hot_user_share` > 0 makes user_id Zipf-pathological: that
    fraction of ALL events lands on user 0 (the hot key the salted
    count-distinct / AQE skew-join paths exist for), remainder uniform.
    Default 0 mirrors the driver data's uniform users."""
    df = _range(spark, n, "event_id")
    k = F.col("event_id")
    # exponential(mean 50) value: long-tailed like the driver stream
    u = F.greatest(_u(k, "ev"), F.lit(1e-6))
    uniform_user = F.pmod(_h(k, "eu"), F.lit(n_users))
    user = (
        F.when(_u(k, "ehot") < hot_user_share, F.lit(0)).otherwise(uniform_user)
        if hot_user_share > 0
        else uniform_user
    )
    return df.select(
        k,
        _ts_ntz(
            EVENTS_EPOCH,
            F.round(_u(k, "et") * float(EVENTS_SPAN_SECONDS), 3).cast("double"),
        ).alias("ts"),
        user.alias("user_id"),
        _pick(EVENT_TYPES, k, "ety").alias("event_type"),
        F.round(-50.0 * F.log(u), 2).alias("value"),
        F.format_string('{"k": %d}', F.pmod(_h(k, "ek"), F.lit(100))).alias("props"),
    )


def _doc_text(seed: F.Column, suffix: F.Column | None = None) -> F.Column:
    """Word-salad text as a pure JVM expression: per-position vocab pick."""
    n_words = (F.pmod(_h(seed, "dn"), F.lit(90)) + 8).cast("int")
    arr = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(arr, (F.pmod(_h(seed, j, "dw"), F.lit(len(VOCAB))) + 1).cast("int")),
    )
    text = F.array_join(words, " ")
    return text if suffix is None else F.concat(text, suffix)


def gen_documents(spark: SparkSession, n: int) -> DataFrame:
    df = _range(spark, n, "doc_id")
    k = F.col("doc_id")
    # dup stripe: doc k with k%613==0 (k>0) clones doc k-1's text
    # exactly; near stripe k%617==0 clones with one appended word —
    # feeds exact/minhash/simhash dedup with known-rate positives.
    seed = (
        F.when((F.pmod(k, F.lit(DUP_STRIPE)) == 0) & (k > 0), k - 1)
        .when((F.pmod(k, F.lit(NEAR_STRIPE)) == 0) & (k > 0), k - 1)
        .otherwise(k)
    )
    is_near = (F.pmod(k, F.lit(NEAR_STRIPE)) == 0) & (k > 0) & (F.pmod(k, F.lit(DUP_STRIPE)) != 0)
    text = F.when(is_near, _doc_text(seed, F.lit(" dup"))).otherwise(_doc_text(seed))
    # stage text once: n_chars reads the staged column instead of
    # re-evaluating the per-position vocab transform (no sibling CSE)
    return df.select(
        k,
        text.alias("text"),
        _pick(LANGS, seed, "dl").alias("lang"),
        F.concat(F.lit("src"), F.pmod(_h(k, "ds"), F.lit(20)).cast("string")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))


def gen_embeddings(spark: SparkSession, n: int) -> DataFrame:
    df = _range(spark, n, "vec_id")
    k = F.col("vec_id")
    label = F.pmod(_h(k, "el"), F.lit(N_LABELS)).cast("int")
    # label-clustered unit vectors: center(label) + 0.35·noise, then
    # L2-normalize — same structure the driver's embeddings show
    # (10 labels, unit norm), so IVF purity / semantic dedup stay
    # meaningful. All JVM-side: transform + aggregate.
    dims = F.sequence(F.lit(1), F.lit(EMB_DIM))
    raw = F.transform(
        dims,
        lambda j: (
            (F.pmod(_h(label, j, "ec"), F.lit(2001)).cast("double") - 1000.0) / 1000.0
            + 0.35 * ((F.pmod(_h(k, j, "en"), F.lit(2001)).cast("double") - 1000.0) / 1000.0)
        ),
    )
    # stage raw, then norm, in separate projections: Catalyst does not
    # CSE sibling expressions, so inlining norm inside the per-element
    # transform would rebuild the whole raw array (and its hashes) for
    # EVERY one of the 64 output elements — O(d^2) hash work per row
    staged = df.select(
        k, label.alias("label"), raw.alias("raw")
    ).select(
        "vec_id",
        "label",
        "raw",
        F.sqrt(F.aggregate("raw", F.lit(0.0), lambda acc, x: acc + x * x)).alias("nrm"),
    )
    unit = F.transform("raw", lambda x: (x / F.col("nrm")).cast("float"))
    return staged.select("vec_id", unit.alias("embedding"), "label")


def write_table(df: DataFrame, out_dir: str, name: str) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    df.write.mode("overwrite").parquet(path)


def generate(
    spark: SparkSession,
    sf: float,
    out_dir: str,
    hot_user_share: float = 0.0,
    tables: tuple[str, ...] | None = None,
) -> None:
    """`tables=None` writes the full star schema; a subset writes only
    those tables (ad-hoc probes — e.g. a skewed events table alone)."""
    c = counts_for(sf)
    os.makedirs(out_dir, exist_ok=True)
    want = set(tables) if tables else None

    def w(name, thunk):
        if want is None or name in want:
            write_table(thunk(), out_dir, name)

    w("region", lambda: gen_region(spark))
    w("nation", lambda: gen_nation(spark))
    w("customer", lambda: gen_customer(spark, c["customer"]))
    w("supplier", lambda: gen_supplier(spark, c["supplier"]))
    w("part", lambda: gen_part(spark, c["part"]))
    orders = gen_orders(spark, c["orders"], c["customer"])
    w("orders", lambda: orders)
    w("lineitem", lambda: gen_lineitem(orders, c["part"], c["supplier"]))
    w("events", lambda: gen_events(spark, c["events"], c["event_users"], hot_user_share))
    w("documents", lambda: gen_documents(spark, c["documents"]))
    w("embeddings", lambda: gen_embeddings(spark, c["embeddings"]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--hot-user-share", type=float, default=0.0,
        help="fraction of events assigned to user 0 (Zipf skew rehearsal)",
    )
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset of tables to generate (default: all)",
    )
    args = ap.parse_args()
    spark = get_session("gen-sf", cpus=args.cpus)
    generate(
        spark, args.sf, args.out, args.hot_user_share,
        tuple(args.tables.split(",")) if args.tables else None,
    )
    print(f"wrote sf{args.sf} to {args.out}")


if __name__ == "__main__":
    main()
