"""Skew-mitigation utilities: salted joins and salted distinct counts.

AQE's skew-join splitting (on in session.py) handles moderate skew at
runtime; these explicit rewrites are the escape hatch for pathological
keys (the 100-TB posture in the brief: "skewed keys → salting or AQE
skew-join").

Both rewrites preserve exact semantics — tests assert equality with
the unsalted plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where hot fact keys would overload single reducers:
    the fact side gets a deterministic salt from its row content, the
    dim side replicates once per salt value, and the join runs on
    (key, salt) — each hot key now spreads over `n_salt` reducers.

    Dim replication costs |dim| × n_salt rows, which is why this is
    for fact-dim joins (dim small) — exactly the skew shape that hurts.
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    # shuffle_hash hint: the planner must NEVER broadcast the replicated
    # dim. Catalyst's size estimate ignores the explode's n_salt×
    # inflation, so at big SF it happily plans a broadcast that hits
    # Spark's hard 8 GiB HashedRelation ceiling (sf100 probe: customer
    # ×8 = 13.7 GiB → SparkException). A broadcast join would also make
    # the salt pointless — broadcast has no reducer skew to spread; the
    # operator's whole design is a shuffle join on (key, salt) with the
    # hot key fanned over n_salt reducers. Shuffle-hash (not sort-merge)
    # because each (key, salt) dim partition is small enough to hash.
    out = f.join(
        d.hint("shuffle_hash"),
        (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
        how,
    )
    return out.drop("__salt")


def salted_count_distinct(
    df: DataFrame, group_key: str, distinct_col: str, n_salt: int = 8
) -> DataFrame:
    """COUNT(DISTINCT x) per group without funneling each group through
    one reducer: stage 1 dedups (group, salt-of-x, x) — spreading a hot
    group across `n_salt` reducers — stage 2 sums per-salt distinct
    counts (sound because salt partitions the value space).
    """
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salt))
    stage1 = (
        df.select(group_key, F.col(distinct_col), salt.alias("__salt"))
        .distinct()
        .groupBy(group_key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return stage1.groupBy(group_key).agg(F.sum("__partial").alias(f"n_distinct_{distinct_col}"))
