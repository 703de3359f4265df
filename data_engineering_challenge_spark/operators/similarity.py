"""Similarity search over the `embeddings` table (array<float>[64]).

North-star extensions (SURVEY.md §7.4): brute-force cosine top-k as
the exact baseline, sign-LSH bucketed search as the scale path.

Scale design (100 TB posture):
- The query set is a *selection* (vec_id % 50 == 0), kept small and
  broadcast, so the corpus side streams once: cost O(|corpus| × |Q|)
  without any corpus shuffle. At real scale |Q| is a user batch and
  this is exactly the shape you want (corpus scan × broadcast probe).
- Norms are computed once per side, not per pair.
- Top-k per query = row_number over (query partition, score desc) on
  the already-reduced (query × corpus) score set.
- ann_lsh_topk buckets both sides by 16 sign bits (deterministic md5
  hyperplanes), equi-joins on the bucket, and reranks exactly inside
  buckets — the join key turns O(|Q|×N) into O(collisions); on a
  cluster the bucket join shuffles only bucket-ids + vectors.
- Everything is bit-identical to the DuckDB oracle: folds are
  sequential, formulas parenthesized identically, hyperplanes shared
  literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.vectors import as_double, cosine, dot, hyperplanes, norm
from ..registry import register

QUERY_MOD = 50  # vec_id % 50 == 0 → the query subset
TOP_K = 5
LSH_BANDS = 4  # 4 independent 8-bit sign-LSH bucketings; candidates = union
PLANES_PER_BAND = 8
DIM = 64

_DOT_SQL = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"


def _emb_with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    return e.select("vec_id", v.alias("v"), norm(v).alias("nrm"))


_CORPUS_SQL = f"""
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               sqrt({_DOT_SQL.format(a='CAST(embedding AS DOUBLE[])', b='CAST(embedding AS DOUBLE[])')}) AS nrm
        FROM embeddings
"""


@register(
    "ann_topk",
    oracle=f"""
        WITH e AS ({_CORPUS_SQL}),
        q AS (SELECT * FROM e WHERE vec_id % {QUERY_MOD} = 0),
        scored AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   {_DOT_SQL.format(a='q.v', b='e.v')} / (q.nrm * e.nrm) AS cosine_sim
            FROM q JOIN e ON q.vec_id <> e.vec_id
        )
        SELECT query_id, neighbor_id, cosine_sim, rnk FROM (
            SELECT query_id, neighbor_id, cosine_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine_sim DESC, neighbor_id
                   ) AS rnk
            FROM scored
        )
        WHERE rnk <= {TOP_K}
        ORDER BY query_id, rnk
    """,
    doc="Brute-force cosine top-5 for the query subset (vec_id % 50 = 0) "
    "— the exact ANN baseline: broadcast queries × one corpus scan.",
    tags=("similarity", "extension"),
)
def ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb_with_norm(spark, sf_dir)
    q = e.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        e.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("query_id", "rnk")
    )


def _band_bucket_sql(vec: str, band: int) -> str:
    """8-bit sign-LSH bucket id for one band in DuckDB SQL."""
    planes = hyperplanes(LSH_BANDS * PLANES_PER_BAND, DIM)
    terms = []
    for j in range(PLANES_PER_BAND):
        w_ = planes[band * PLANES_PER_BAND + j]
        arr = "[" + ", ".join(f"{x}.0" for x in w_) + "]"
        proj = f"list_sum(list_transform(range(1, {DIM + 1}), i -> {vec}[i] * ({arr})[i]))"
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _band_bucket_col(vec_col: F.Column, band: int) -> F.Column:
    planes = hyperplanes(LSH_BANDS * PLANES_PER_BAND, DIM)
    b = F.lit(0)
    for j in range(PLANES_PER_BAND):
        w_ = planes[band * PLANES_PER_BAND + j]
        arr = F.array(*[F.lit(float(x)) for x in w_])
        b = b + F.when(dot(vec_col, arr) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b


@register(
    "ann_lsh_topk",
    oracle=f"""
        WITH e AS ({_CORPUS_SQL}),
        q_ids AS (SELECT vec_id FROM e WHERE vec_id % {QUERY_MOD} = 0),
        buckets AS (
            {" UNION ALL ".join(f"SELECT vec_id, {b} AS band, {_band_bucket_sql('v', b)} AS bucket FROM e" for b in range(LSH_BANDS))}
        ),
        cand AS (
            SELECT DISTINCT qb.vec_id AS query_id, eb.vec_id AS neighbor_id
            FROM buckets qb
            JOIN q_ids ON q_ids.vec_id = qb.vec_id
            JOIN buckets eb ON qb.band = eb.band AND qb.bucket = eb.bucket
                           AND qb.vec_id <> eb.vec_id
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   {_DOT_SQL.format(a='q.v', b='e.v')} / (q.nrm * e.nrm) AS cosine_sim
            FROM cand
            JOIN e q ON q.vec_id = query_id
            JOIN e ON e.vec_id = neighbor_id
        )
        SELECT query_id, neighbor_id, cosine_sim, rnk FROM (
            SELECT query_id, neighbor_id, cosine_sim,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY cosine_sim DESC, neighbor_id
                   ) AS rnk
            FROM scored
        )
        WHERE rnk <= {TOP_K}
        ORDER BY query_id, rnk
    """,
    doc="Banded sign-LSH ANN: 4 bands × 8 deterministic md5-derived "
    "hyperplanes; candidates = union of same-(band,bucket) pairs; exact "
    "cosine rerank inside candidates. The approximate scale path (bucket "
    "equi-join instead of a full cross product); identical approximation "
    "in the oracle.",
    tags=("similarity", "lsh", "extension"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb_with_norm(spark, sf_dir)
    band_arr = F.array(*[_band_bucket_col(F.col("v"), b) for b in range(LSH_BANDS)])
    buckets = e.select("vec_id", F.posexplode(band_arr).alias("band", "bucket"))
    qb = buckets.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), "band", "bucket"
    )
    cand = (
        buckets.join(
            F.broadcast(qb),
            (qb.band == buckets.band)
            & (qb.bucket == buckets.bucket)
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    qe = e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    scored = (
        cand.join(F.broadcast(qe), "query_id")
        .join(e.select(F.col("vec_id").alias("neighbor_id"), "v", "nrm"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias("cosine_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("query_id", "rnk")
    )
