"""Result invariance under shuffle-partition count.

The external harness owns its session, so nothing guarantees our
default partitioning: every result must be bit-identical whether a
shuffle fans out over 2 or 32 partitions. The engine's guarantees come
from design rules (decimal-internal sums, order statistics instead of
float means, explicit tie-break sorts); this test pins them for a
representative query from each family that aggregates, windows,
banding-joins, or iterates."""

from __future__ import annotations

import pytest

from data_engineering_challenge_spark import registry

REPRESENTATIVES = (
    "revenue_per_day",      # decimal-internal grouped sums
    "pricing_summary",      # multi-aggregate + avg-from-exact-sum
    "tx_per_store",         # count + count-distinct
    "minhash_lsh_pairs",    # banding join + windowed bucket cap
    "dedup_savings",        # two-level re-aggregation
    "pack_sequences",       # per-shard running-sum window
    "semantic_dedup",       # broadcast argmax + cell pair join
    "tfidf_top_terms",      # join + per-group top-k window
    "bm25_topk",            # fixed-order per-term score sum
    "ann_pq_topk",          # argmin encode + ADC lookup sum
    "incremental_dedup",    # frozen-index scan + delta banding join
    "bpe_learn",            # iterative argmax + fold re-segmentation
    "dedup_retention_plan", # CC labels + max_by retention policy
    "ann_ivfpq_topk",       # stored-index probe + ADC rerank (r8)
    "bpe_apply",            # linear re-segmentation encode (r8)
    "duplicate_spans",      # gh-window dup test + gaps-and-islands merge (r8)
    "source_token_drift",   # exact-integer L1 drift, one final division (r8)
    "hll_rollup_check",     # merge-order-invariant sketch union (r8)
    "incremental_duplicate_spans",  # frozen-index probe + island windows (r8)
    "copurchase_pagerank",  # iterative integer fixed-point propagation (r8)
)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_result_invariant_under_shuffle_partitions(name, spark, sf_dir):
    spec = registry.all_queries()[name]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        spark.catalog.clearCache()
        low = sorted(map(tuple, spec.fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.catalog.clearCache()
        high = sorted(map(tuple, spec.fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert low == high, f"{name} varies with shuffle partitioning"
