"""Iterative graph operator: connected components via distributed
min-label propagation — the clustering step a dedup pipeline runs over
its near-dup pair lists (pairs → clusters → one canonical doc each).

Scale design (100 TB posture):
- Each iteration is one shuffle: edges ⋈ labels (hash on node id) →
  min-aggregate → label update. No driver-side graph state — the
  driver only sees the scalar `changed` count per iteration.
- Convergence in O(component diameter) iterations; near-dup clusters
  are star-like (diameter 2-3). A hard cap guards pathological chains.
- Labels persist per iteration and the previous generation unpersists
  — memory is O(|nodes|), lineage stays flat (no 50-deep plan).
- Every CHECKPOINT_EVERY iterations the generation is
  localCheckpoint(eager)-ed: the logical plan itself (not just the
  computed data) is truncated, so a pathological high-diameter graph
  cannot grow an unbounded plan tree / stack-overflow the analyzer.

The oracle is a DuckDB recursive CTE computing min reachable label —
the declarative specification of the same fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..catalog import load_table
from ..functions.text import normalize_text
from ..registry import register, track_cached

MAX_ITERATIONS = 50
CHECKPOINT_EVERY = 10  # truncate logical-plan lineage every N iterations

from ..functions.text import NORM_SQL as _NORM_SQL  # noqa: E402 — oracle twin of normalize_text


def connected_components(
    nodes: DataFrame, edges: DataFrame, max_iterations: int = MAX_ITERATIONS
) -> DataFrame:
    """(node, component) for an undirected graph; component = min node
    id reachable. `nodes`: one column `node`; `edges`: columns (a, b).
    """
    # materialize the symmetric edge list once — every iteration joins
    # against it, and re-deriving the near-dup self-joins per round
    # would dominate the loop
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    labels = nodes.select("node", F.col("node").alias("lbl")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    labels.count()
    gen = labels  # persisted backing store of the current generation
    for it in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_gen = labels.join(neighbor_min, labels.node == neighbor_min.a, "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
            F.col("lbl").alias("old_lbl"),
        )
        if (it + 1) % CHECKPOINT_EVERY == 0:
            # truncate the logical plan: high-diameter graphs otherwise
            # grow an O(iterations)-deep plan tree even though the DATA
            # is cached per generation (analyzer cost, stack depth)
            new_gen = new_gen.localCheckpoint(eager=True)
        else:
            new_gen = new_gen.persist(StorageLevel.MEMORY_AND_DISK)
        # the count below materializes new_gen; only THEN may the previous
        # generation be dropped — unpersisting the parent before the child
        # is cached would force every later iteration to recompute the
        # whole lineage chain (quadratic work in iteration count)
        changed = new_gen.filter(F.col("lbl") != F.col("old_lbl")).count()
        gen.unpersist()
        gen = new_gen
        labels = new_gen.select("node", "lbl")  # narrow view over the cache
        if changed == 0:
            break
    sym.unpersist()
    track_cached(gen)  # drained by the next registered-query invocation
    return labels.select("node", F.col("lbl").alias("component"))


def connected_components_bipartite(
    assignments: DataFrame, max_iterations: int = MAX_ITERATIONS
) -> DataFrame:
    """(node, component) where nodes are connected iff they share an
    attribute. `assignments`: columns (node, attr).

    Alternating min-label propagation over the bipartite node↔attr
    graph: attr label = min over its nodes, node label = min over its
    attrs. Crucially this NEVER materializes node-node edges — a hot
    attribute (k nodes sharing one bucket) costs k rows, not k². This
    is the formulation that survives boilerplate-heavy corpora where
    per-bucket pair explosion kills the edge-list approach.
    """
    a = assignments.select("node", "attr").persist(StorageLevel.MEMORY_AND_DISK)
    a.count()
    labels = (
        a.select("node").distinct().select("node", F.col("node").alias("lbl"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    gen = labels  # persisted backing store of the current generation
    for it in range(max_iterations):
        attr_min = (
            a.join(labels, "node").groupBy("attr").agg(F.min("lbl").alias("albl"))
        )
        node_min = a.join(attr_min, "attr").groupBy("node").agg(F.min("albl").alias("nlbl"))
        new_gen = labels.join(node_min, "node", "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
            F.col("lbl").alias("old_lbl"),
        )
        if (it + 1) % CHECKPOINT_EVERY == 0:
            # plan-lineage truncation for pathological diameters (see
            # connected_components)
            new_gen = new_gen.localCheckpoint(eager=True)
        else:
            new_gen = new_gen.persist(StorageLevel.MEMORY_AND_DISK)
        # materialize new_gen via the count BEFORE dropping the previous
        # generation — unpersisting the parent first would force each
        # later iteration to recompute the full lineage chain
        changed = new_gen.filter(F.col("lbl") != F.col("old_lbl")).count()
        gen.unpersist()
        gen = new_gen
        labels = new_gen.select("node", "lbl")  # narrow view over the cache
        if changed == 0:
            break
    a.unpersist()
    track_cached(gen)  # drained by the next registered-query invocation
    return labels.select("node", F.col("lbl").alias("component"))


@register(
    "dedup_clusters",
    oracle=f"""
        WITH RECURSIVE
        n AS (SELECT doc_id, {_NORM_SQL} AS norm FROM documents),
        f AS (
            SELECT doc_id, md5(norm) AS fp,
                   CASE WHEN length(norm) >= 8 THEN
                       list_min(list_transform(range(1, length(norm) - 6),
                                i -> md5(norm[i:i+7])))
                   ELSE md5(norm) END AS msf
            FROM n
        ),
        e AS (
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM f a JOIN f b
              ON (a.fp = b.fp OR a.msf = b.msf) AND a.doc_id <> b.doc_id
        ),
        reach AS (
            SELECT doc_id AS node, doc_id AS lbl FROM documents
            UNION
            SELECT e.a, r.lbl FROM reach r JOIN e ON e.b = r.node
        )
        SELECT node AS doc_id,
               MIN(lbl) AS cluster_id,
               (node = MIN(lbl)) AS is_canonical
        FROM reach
        GROUP BY node
        ORDER BY doc_id
    """,
    doc="Dedup clustering: connected components over the near-dup graph "
    "(edges = same exact content fingerprint OR same min-shingle "
    "fingerprint), one canonical doc per cluster (min doc_id). Spark "
    "side is iterative min-label propagation (one shuffle per round, "
    "converges in diameter rounds); the oracle is the recursive-CTE "
    "fixpoint of the same relation.",
    tags=("dedup", "graph", "iterative", "extension"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    shingle_hashes = F.transform(
        F.sequence(F.lit(1), F.length("norm") - 7),
        lambda i: F.md5(F.col("norm").substr(i, F.lit(8)).cast("binary")),
    )
    f = d.select("doc_id", norm.alias("norm")).select(
        "doc_id",
        F.md5(F.col("norm").cast("binary")).alias("fp"),
        F.when(F.length("norm") >= 8, F.array_min(shingle_hashes))
        .otherwise(F.md5(F.col("norm").cast("binary")))
        .alias("msf"),
    )
    # bipartite doc↔attribute assignments: attr = tagged fp or msf value
    assignments = f.select(
        F.col("doc_id").alias("node"),
        F.explode(
            F.array(F.concat(F.lit("fp:"), "fp"), F.concat(F.lit("msf:"), "msf"))
        ).alias("attr"),
    )
    comp = connected_components_bipartite(assignments)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    ).orderBy("doc_id")
