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
    if len(structs) == 1:  # least() needs >1 args; K=1 is a degenerate fit
        return structs[0]
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


def _km_ctes() -> str:
    """Unrolled-CTE replay of quantize -> (assign -> update) x ITERS ->
    final assignment (the fixed-point pagerank protocol); shared by
    the rollup and purity oracles."""
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
        )"""
    )


def _oracle_sql() -> str:
    """kmeans_embeddings oracle: the CTE chain + per-cell rollup."""
    return (
        _km_ctes()
        + f"""
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


def _purity_sql() -> str:
    """kmeans_label_purity oracle: final assignment joined to the
    planted labels; majority label per cell via (count desc, label
    asc) ordering, purity as one final division of exact counts."""
    return (
        _km_ctes()
        + """,
        lab AS (
            SELECT f.cell_id, e.label
            FROM final f JOIN embeddings e ON f.vec_id = e.vec_id
        ),
        cnts AS (
            SELECT cell_id, label, COUNT(*)::BIGINT AS cnt
            FROM lab GROUP BY cell_id, label
        ),
        tot AS (
            SELECT cell_id, SUM(cnt)::BIGINT AS n_vectors FROM cnts
            GROUP BY cell_id
        ),
        maj AS (
            SELECT cell_id, label AS majority_label, cnt AS majority_cnt
            FROM (
                SELECT cell_id, label, cnt,
                       row_number() OVER (
                           PARTITION BY cell_id ORDER BY cnt DESC, label
                       ) AS rn
                FROM cnts
            ) WHERE rn = 1
        )
        SELECT t.cell_id, t.n_vectors,
               CAST(m.majority_label AS INT) AS majority_label,
               CAST(m.majority_cnt AS DOUBLE) / CAST(t.n_vectors AS DOUBLE)
                   AS purity
        FROM tot t JOIN maj m ON t.cell_id = m.cell_id
        ORDER BY t.cell_id
    """
    )


@register(
    "kmeans_label_purity",
    oracle=_purity_sql(),
    doc="Cluster-quality gate for the fixed-point k-means (the "
    "ivf_cell_purity pattern applied to Lloyd cells): per cell, the "
    "majority planted label (ties to lowest label) and its share of "
    "the cell's vectors — exact counts, one final division. The "
    "go/no-go audit before using k-means cells to route dedup or "
    "balance mixtures (SemDeDup/DCLM practice). Same bit-exact "
    "generations as kmeans_embeddings; the only extra work is one "
    "vec_id join to the labels and a cells-x-labels-sized rollup.",
    tags=("embeddings", "clustering", "quality", "extension"),
)
def kmeans_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cell_id, n_vectors, majority_label, purity) of the final
    k-means assignment against the planted labels."""
    q, centroids = kmeans_fit(spark, sf_dir)
    if not centroids:
        return spark.createDataFrame(
            [],
            "cell_id bigint, n_vectors bigint, majority_label int, purity double",
        )
    assign = q.select(
        "vec_id", F.expr(_assign_expr(centroids)).alias("pick")
    ).select("vec_id", F.col("pick.cell_id").alias("cell_id"))
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    cnts = (
        assign.join(lab, "vec_id")
        .groupBy("cell_id", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    per_cell = cnts.groupBy("cell_id").agg(
        F.sum("cnt").cast("bigint").alias("n_vectors"),
        # majority: highest count, ties to lowest label — max of
        # (cnt, -label) recovers both without a window shuffle
        F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m"),
    )
    return per_cell.select(
        "cell_id",
        "n_vectors",
        (-F.col("m.neg")).cast("int").alias("majority_label"),
        (F.col("m.cnt").cast("double") / F.col("n_vectors").cast("double")).alias(
            "purity"
        ),
    ).orderBy("cell_id")
