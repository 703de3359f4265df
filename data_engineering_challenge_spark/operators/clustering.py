"""Lloyd's k-means over the embedding corpus — in integer fixed point.

The clustering seat of a training-data pipeline (DCLM/SemDeDup-style
curation clusters embeddings to balance mixtures, route dedup, and
prune redundancy; the reference repo has no analog). The engine
already trains a k-median IVF quantizer (`operators/similarity.py`);
this is the standard Lloyd alternative, and the interesting part is
making an ITERATIVE MEAN bit-exact across engines:

- vectors are quantized once to BIGINT fixed point,
  q_d = floor(x_d * 2^20) — floor of a double scaled by a power of
  two is exact in both engines;
- distances are exact BIGINT sums of squares (64 dims x (2^21)^2
  < 2^49 — no overflow);
- the argmin ties to the lowest cell id via tuple ordering
  (`least(struct(dist, cell))` / `ORDER BY dist, cell_id`);
- the centroid update is truncating integer division of exact sums
  (Spark-side sums collected K*DIM-bounded to the driver, divided
  with C-semantics trunc-div; DuckDB replays with `//`, which also
  truncates toward zero) — so every generation is bit-identical
  across engines, partition counts and summation orders, exactly
  like the fixed-point pagerank (`operators/graph.py`).

Scale posture (100 TB): per iteration ONE scan of the quantized
vectors (persisted once); the assignment is pure expression work
against K x DIM centroid literals — no join, no shuffle; the update
is a (cell, dim)-keyed partial aggregation whose result is K*DIM rows
(512 here) — the only driver traffic. Iterations are a fixed small
constant. The oracle replays all generations as unrolled CTEs
(the pagerank/Cholesky precedent).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register, track_persist

KM_K = 8  # cells
KM_ITERS = 4  # centroid updates; final stats vs the last generation
KM_DIM = 64
KM_SCALE = 1 << 20


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (C semantics — Spark `div` and
    DuckDB `//`; Python's // floors, which differs on negatives)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT))"
        ).alias("q"),
    )


def _assign_expr(centroids: list[tuple[int, list[int]]]) -> str:
    """least() over (dist, cell) structs — argmin, ties to lowest cell."""
    structs = []
    for cid, cvec in centroids:
        arr = "array(" + ",".join(f"{v}L" for v in cvec) + ")"
        dist = (
            f"aggregate(zip_with(q, {arr}, (a, b) -> (a-b)*(a-b)), "
            "0L, (acc, x) -> acc + x)"
        )
        structs.append(f"struct({dist} AS dist, CAST({cid} AS BIGINT) AS cell_id)")
    return f"least({', '.join(structs)})"


def kmeans_fit(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Run KM_ITERS Lloyd updates; return (quantized vectors persisted,
    final centroids as [(cell_id, [int dims])]). Empty input -> ([], [])."""
    q = track_persist(_quantized(spark, sf_dir))
    seed_rows = q.orderBy("vec_id").limit(KM_K).collect()
    centroids = [(i, list(r["q"])) for i, r in enumerate(seed_rows)]
    if not centroids:
        return q, []
    for _ in range(KM_ITERS):
        assigned = q.select(
            F.expr(_assign_expr(centroids)).alias("pick"), "q"
        ).select(F.col("pick.cell_id").alias("cell_id"), "q")
        stats = (
            assigned.select("cell_id", F.posexplode("q").alias("dim", "val"))
            .groupBy("cell_id", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # K*DIM rows — bounded driver traffic by design
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cell.setdefault(r["cell_id"], {})[r["dim"]] = (r["s"], r["n"])
        centroids = [
            (
                cid,
                [
                    _tdiv(*by_cell[cid][d]) for d in range(KM_DIM)
                ]
                if cid in by_cell
                else cvec,  # empty cell keeps its previous centroid
            )
            for cid, cvec in centroids
        ]
    return q, centroids


def _oracle_sql() -> str:
    """Unrolled-CTE replay of quantize -> (assign -> update) x ITERS ->
    final assignment stats (the fixed-point pagerank protocol)."""
    parts = [
        f"""q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {KM_SCALE}) AS BIGINT)) AS q
            FROM embeddings
        ),
        c0 AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, q AS c
            FROM q ORDER BY vec_id LIMIT {KM_K}
        )"""
    ]
    for i in range(1, KM_ITERS + 1):
        parts.append(
            f"""a{i} AS (
            SELECT vec_id, q, cell_id FROM (
                SELECT v.vec_id, v.q, c.cell_id,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY CAST(list_sum(list_transform(range(1, {KM_DIM + 1}),
                               i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))) AS BIGINT),
                               c.cell_id
                       ) AS rn
                FROM q v, c{i - 1} c
            ) WHERE rn = 1
        ),
        c{i} AS (
            SELECT p.cell_id, COALESCE(u.c, p.c) AS c
            FROM c{i - 1} p LEFT JOIN (
                SELECT cell_id, list(m ORDER BY dim) AS c FROM (
                    SELECT cell_id, dim, SUM(val) // COUNT(*) AS m
                    FROM (
                        SELECT a.cell_id, t.range AS dim, a.q[t.range] AS val
                        FROM a{i} a, range(1, {KM_DIM + 1}) t
                    ) GROUP BY cell_id, dim
                ) GROUP BY cell_id
            ) u ON p.cell_id = u.cell_id
        )"""
        )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f""",
        final AS (
            SELECT vec_id, cell_id, dist FROM (
                SELECT v.vec_id, c.cell_id,
                       CAST(list_sum(list_transform(range(1, {KM_DIM + 1}),
                           i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))) AS BIGINT) AS dist,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY CAST(list_sum(list_transform(range(1, {KM_DIM + 1}),
                               i -> (v.q[i] - c.c[i]) * (v.q[i] - c.c[i]))) AS BIGINT),
                               c.cell_id
                       ) AS rn
                FROM q v, c{KM_ITERS} c
            ) WHERE rn = 1
        )
        SELECT f.cell_id,
               COUNT(*)::BIGINT AS n_vectors,
               CAST(SUM(f.dist) AS BIGINT) AS inertia,
               ('0x' || substr(md5(array_to_string(c.c, ',')), 1, 15))::BIGINT
                   AS centroid_sig
        FROM final f JOIN c{KM_ITERS} c ON f.cell_id = c.cell_id
        GROUP BY f.cell_id, c.c ORDER BY f.cell_id
    """
    )


@register(
    "kmeans_embeddings",
    oracle=_oracle_sql(),
    doc="Lloyd's k-means over the embedding corpus in INTEGER FIXED "
    "POINT: vectors quantized to floor(x * 2^20), exact BIGINT "
    "distances, argmin ties to lowest cell, centroid update by "
    "truncating division of exact sums — every generation bit-identical "
    "across engines/partitionings (the fixed-point pagerank protocol; "
    "oracle replays all generations as unrolled CTEs). Per iteration: "
    "one scan, no join (centroids are K x DIM literals), one "
    "(cell, dim)-keyed partial agg with K*DIM rows of driver traffic.",
    tags=("embeddings", "clustering", "iterative", "extension"),
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell_id, n_vectors, inertia, centroid_sig) after KM_ITERS
    Lloyd updates from the lowest-vec_id seeds."""
    q, centroids = kmeans_fit(spark, sf_dir)
    if not centroids:
        return spark.createDataFrame(
            [],
            "cell_id bigint, n_vectors bigint, inertia bigint, centroid_sig bigint",
        )
    final = q.select(F.expr(_assign_expr(centroids)).alias("pick")).select(
        F.col("pick.cell_id").alias("cell_id"), F.col("pick.dist").alias("dist")
    )
    sig_expr = None
    for cid, cvec in centroids:
        sig = int(
            hashlib.md5(",".join(str(v) for v in cvec).encode()).hexdigest()[:15], 16
        )
        branch = F.when(F.col("cell_id") == cid, F.lit(sig))
        sig_expr = branch if sig_expr is None else sig_expr.when(
            F.col("cell_id") == cid, F.lit(sig)
        )
    return (
        final.groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum("dist").cast("bigint").alias("inertia"),
        )
        .withColumn("centroid_sig", sig_expr.cast("bigint"))
        .orderBy("cell_id")
    )
