"""Market-basket cap (operators/analytics_ext.py MAX_BASKET).

A basket with n distinct parts contributes C(n,2) pairs to the
copurchase self-join; one degenerate mega-order is the key that
breaks the stage at corpus scale. The cap drops oversized baskets on
BOTH engines (it is part of the operator's semantics, oracle-verified
at the registered scales where it never binds). Here we craft a
corpus where it DOES bind and assert Spark and the DuckDB oracle
agree on the capped result.
"""

from __future__ import annotations

import pandas as pd

from data_engineering_challenge_spark import testing
from data_engineering_challenge_spark.operators.analytics_ext import (
    MAX_BASKET,
    MIN_SUPPORT,
    copurchase_pairs,
)
from data_engineering_challenge_spark.registry import all_queries


def _write_corpus(root):
    rows = []
    # one mega-basket above the cap: C(n,2) pairs, all of which must
    # vanish from the result
    mega = MAX_BASKET + 5
    for p in range(mega):
        rows.append({"l_orderkey": 1, "l_partkey": p})
    # two normal baskets sharing the pair (10_000, 10_001) so the
    # MIN_SUPPORT gate keeps exactly that pair
    for ok in (2, 3):
        rows.append({"l_orderkey": ok, "l_partkey": 10_000})
        rows.append({"l_orderkey": ok, "l_partkey": 10_001})
    df = pd.DataFrame(rows)
    df["l_orderkey"] = df["l_orderkey"].astype("int64")
    df["l_partkey"] = df["l_partkey"].astype("int64")
    df.to_parquet(root / "lineitem.parquet", index=False)
    return str(root)


def test_basket_cap_binds_and_matches_oracle(spark, tmp_path):
    sf_dir = _write_corpus(tmp_path)
    got = copurchase_pairs(spark, sf_dir)
    s_rows = sorted(tuple(r) for r in got.collect())
    # the mega-basket's parts never appear; only the supported pair does
    assert s_rows == [(10_000, 10_001, 2)]

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    d_cols, d_rows = testing.run_oracle(con, all_queries()["copurchase_pairs"].oracle)
    ok, detail = testing.compare(got.columns, s_rows, d_cols, d_rows)
    assert ok, detail


def test_without_cap_mega_basket_would_dominate(spark, tmp_path):
    # sanity: the guard is what removes the mega-basket (drop the
    # filter and the pair count explodes) — pins that the cap is load-
    # bearing rather than vacuous
    sf_dir = _write_corpus(tmp_path)
    from data_engineering_challenge_spark.catalog import load_table
    from pyspark.sql import functions as F

    po = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a, b = po.alias("a"), po.alias("b")
    uncapped = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        ).count()
    )
    n = MAX_BASKET + 5
    # C(n,2) mega-basket pairs + the supported pair once per its 2 orders
    assert uncapped == n * (n - 1) // 2 + 2
