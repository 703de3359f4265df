"""Physical-plan regression tests: the properties that make queries
survive a 100× scale-up, asserted at sf0.001 (SURVEY.md §4)."""

from __future__ import annotations

import pytest

from data_engineering_challenge_spark import registry
from data_engineering_challenge_spark.plans import (
    count_exchanges,
    physical_plan,
)
from data_engineering_challenge_spark.plans.checks import read_columns, scans_of


def _plan(spark, sf_dir, name: str) -> str:
    return physical_plan(registry.all_queries()[name].fn(spark, sf_dir))


def test_top10_is_distributed_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top10_units")
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT 10
    assert count_exchanges(plan) == 1  # exactly the partial->final agg shuffle
    (scan,) = scans_of(plan, "lineitem")
    assert read_columns(scan) == {"l_partkey", "l_quantity"}  # column pruning


def test_pricing_summary_single_shuffle_and_pruned_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    # one agg shuffle + the final ORDER BY's range exchange over ~6 rows
    assert count_exchanges(plan) <= 2
    assert "partial_sum" in plan  # map-side combine
    (scan,) = scans_of(plan, "lineitem")
    assert read_columns(scan) == {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    }


@pytest.mark.parametrize("name", ["margin_signature_2months", "margin_signature_60days"])
def test_margin_broadcasts_dim_and_pushes_promo_filter(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan  # dim side broadcast, fact never shuffles
    assert "SortMergeJoin" not in plan
    (scan,) = scans_of(plan, "part.parquet")
    assert "EqualTo(p_type,PROMO)" in scan.get("PushedFilters", "")
    # fact scan reads only join key + measure + date (a second slim
    # lineitem scan feeds the 1-row bounds aggregate)
    fact_scans = [
        s for s in scans_of(plan, "lineitem") if "l_extendedprice" in read_columns(s)
    ]
    assert len(fact_scans) == 1
    assert read_columns(fact_scans[0]) == {"l_partkey", "l_extendedprice", "l_shipdate"}


def test_revenue_per_day_pruned_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "revenue_per_day")
    (scan,) = scans_of(plan, "orders")
    assert read_columns(scan) == {"o_orderdate", "o_totalprice"}


def test_ann_topk_broadcasts_queries_not_corpus(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ann_topk")
    assert "BroadcastNestedLoopJoin" in plan  # query batch broadcast
    assert "CartesianProduct" not in plan  # never a partitioned cross product


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    from data_engineering_challenge_spark.catalog import load_table
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") == 42).select("o_custkey")
    (scan,) = scans_of(physical_plan(df), "orders")
    assert "EqualTo(o_orderkey,42)" in scan.get("PushedFilters", "")
    assert read_columns(scan) == {"o_orderkey", "o_custkey"}


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """The §4 design decision replacing the reference's B-tree date
    index: month-partitioned parquet must give partition-pruned reads."""
    from data_engineering_challenge_spark.catalog import load_table
    from data_engineering_challenge_spark.sinks.writers import write_partitioned_parquet
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_month")
    write_partitioned_parquet(o, out, date_col="o_orderdate")
    back = spark.read.parquet(out).filter(F.col("part_month") == "1997-03")
    plan = physical_plan(back)
    (scan,) = scans_of(plan, "orders_by_month")
    assert "part_month" in scan.get("PartitionFilters", "")
    assert back.count() == o.filter(
        F.date_format("o_orderdate", "yyyy-MM") == "1997-03"
    ).count()


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    """TPC-H Q5 shape: at test SF every join (all dims AND the fact
    spine) ends up BroadcastHashJoin in the FINAL adaptive plan — no
    live SortMergeJoin. Round 6 removed the explicit broadcast HINTS
    from SF-scaled dims (customer/supplier — a hint bypasses Spark's
    8 GiB broadcast ceiling and the sf100 probe died on exactly that),
    so the broadcast decision is AQE's from actual runtime sizes; this
    asserts AQE actually makes it when the dims are genuinely small."""
    from data_engineering_challenge_spark.plans import (
        executed_adaptive_plan,
        live_operator_count,
    )

    q = registry.all_queries()["local_supplier_volume"].fn(spark, sf_dir)
    final = executed_adaptive_plan(q)
    assert "isFinalPlan=true" in final
    assert live_operator_count(final, "BroadcastHashJoin") >= 4
    assert live_operator_count(final, "SortMergeJoin") == 0
    plan = _plan(spark, sf_dir, "local_supplier_volume")
    (scan,) = scans_of(plan, "region")
    assert "EqualTo(r_name,ASIA)" in scan.get("PushedFilters", "")
    # orders date-range predicate reaches the parquet scan
    (oscan,) = scans_of(plan, "orders")
    assert "o_orderdate" in oscan.get("PushedFilters", "") or "o_orderdate" in str(
        oscan.get("ReadSchema", "")
    )


def test_shipping_priority_is_distributed_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "shipping_priority_top10")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # customer dim broadcast
    (cscan,) = scans_of(plan, "customer")
    assert "EqualTo(c_mktsegment,BUILDING)" in cscan.get("PushedFilters", "")


def test_grouping_sets_is_single_expand_and_agg(spark, sf_dir):
    # All three grouping levels must come from ONE Expand feeding ONE
    # hash-agg pipeline (one shuffle), not three separate groupBys.
    plan = _plan(spark, sf_dir, "acctbal_grouping_sets")
    assert "Expand" in plan
    (scan,) = scans_of(plan, "customer")
    assert read_columns(scan) == {"c_nationkey", "c_acctbal"}
    assert "BroadcastHashJoin" in plan  # nation/region dims never shuffle


def test_pivot_is_single_pass_no_value_discovery(spark, sf_dir):
    # With an explicit value list there is NO value-discovery job and
    # no extra scan: Spark's two-stage pivot agg first reduces to
    # |groups x values| rows (partial+final), so the later exchanges
    # move ~15 rows. One scan, <=3 exchanges (first agg, pivot agg,
    # ORDER BY).
    plan = _plan(spark, sf_dir, "orders_status_priority_pivot")
    assert count_exchanges(plan) <= 3
    (scan,) = scans_of(plan, "orders")
    assert read_columns(scan) == {"o_orderpriority", "o_orderstatus"}


def test_exists_shape_plans_as_semi_join(spark, sf_dir):
    # Correlated EXISTS must become a (left) semi join, never a full
    # join + dedup.
    plan = _plan(spark, sf_dir, "orders_with_discounted_lines")
    assert "LeftSemi" in plan
    (scan,) = scans_of(plan, "lineitem")
    assert read_columns(scan) == {"l_orderkey", "l_discount"}


def test_outer_join_sides_preaggregated(spark, sf_dir):
    # The full-outer trade balance joins two per-nation AGGREGATES:
    # both aggs must appear below the join, so the outer join sees ~25
    # rows per side, not raw customer/supplier rows.
    plan = _plan(spark, sf_dir, "nation_trade_balance")
    assert "FullOuter" in plan
    # tree children print BELOW their parent: the outer join consuming
    # the aggregates means the join line comes first
    join_at = plan.index("SortMergeJoin") if "SortMergeJoin" in plan else plan.index("ShuffledHashJoin")
    assert join_at < plan.index("HashAggregate")


# Queries whose WHOLE POINT is an Arrow-batched Python stage
_PYTHON_BY_DESIGN = {
    "multimodal_meta",       # mapInPandas decode plumbing
    "multimodal_frames",     # mapInPandas 1->N
    "user_value_trend",      # applyInPandas grouped model
    "bmp_roundtrip_audit",   # mapInPandas real BMP decode/resize/encode
    "png_roundtrip_audit",   # mapInPandas real PNG (zlib) decode/resize/encode
    "wav_roundtrip_audit",   # mapInPandas real WAV (RIFF/PCM) decode/resample/encode
    "phash_pairs",           # mapInPandas real BMP decode -> 8x8 luma aHash
    "incremental_phash_pairs",  # same Arrow pass, delta side only
    "wavhash_pairs",         # mapInPandas real WAV decode -> frame-energy hash
    "incremental_wavhash_pairs",  # same Arrow pass, delta side only
    "multimodal_retention_plan",  # composes the phash/wavhash Arrow passes
    "multimodal_retention_apply",  # anti-join against the same Arrow-pass plan
}
_PY_MARKERS = (
    "BatchEvalPython",  # row-at-a-time Python UDF — never acceptable
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonUDTF",
    "MapInArrow",
)


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin:
# each one broadcasts a provably-tiny side (a 1-row bounds frame, a
# query/probe batch, a centroid table) against a single corpus scan —
# the non-equi join SHAPE is the design, and the broadcast side stays
# O(small) at any corpus scale.
_BNLJ_BY_DESIGN = {
    "ann_topk",               # broadcast query batch x corpus scan
    "ann_ivf_topk",           # broadcast centroids x corpus scan
    "ann_ivf_trained_topk",   # broadcast centroids (trained) x corpus scan
    "ann_pq_topk",            # broadcast query ADC tables x code scan
    "ann_ivfpq_topk",         # broadcast centroids / ADC tables x scans
    "pq_reconstruction_error",  # 1-row stride frame + broadcast codebook
    "semantic_dedup",         # broadcast centroids x corpus scan
    "ivf_cell_purity",        # broadcast centroids x corpus scan
    "margin_signature_2months",  # 1-row date-bounds frame
    "margin_signature_60days",   # 1-row date-bounds frame
    "idle_customers_balance",    # 1-row avg-balance threshold frame
    "tfidf_top_terms",        # 1-row corpus-size frame
    "bm25_topk",              # 1-row n_docs/avgdl stats frame
    "totalprice_histogram",   # 1-row min/max bounds frame
    "build_vocab",            # 1-row total-token-count frame
    "session_gap_profile",    # 1-row total-gap-count frame
    "funnel_conversion",      # 1-row x 1-row count frames
    "truncated_ann_recall",   # broadcast query batch x corpus scan (ann_topk twin)
    "int8_quantization_audit",  # 1-row per-dim min/scale bounds frame
    "source_token_drift",     # broadcast top-100 / 1-row N frames x |sources| rollup
    "bigram_lm_score",        # 1-row context-vocabulary (V) frame
    "incremental_lm_score",   # 1-row context-vocabulary (V) frame (r11)
}


def test_scan_only_text_ops_have_no_joins(spark, sf_dir):
    """repetition_profile / pii_scrub / sample_mixture are one-scan
    column math: any Join node means a regression re-introduced a
    second pass over the corpus."""
    expected_cols = {
        "repetition_profile": {"doc_id", "text"},
        "pii_scrub": {"doc_id", "text"},
        "sample_mixture": {"doc_id", "lang"},  # never reads text at all
    }
    for name, want in expected_cols.items():
        plan = _plan(spark, sf_dir, name)
        assert "Join" not in plan, f"{name} grew a join:\n{plan[:800]}"
        (scan,) = scans_of(plan, "documents")
        cols = read_columns(scan)
        assert cols == want, f"{name} scan not pruned: {cols}"


def test_pack_sequences_windows_per_shard(spark, sf_dir):
    """Packing must hash-partition by source for the running-sum window
    (parallel across shards) — a global-window plan would funnel the
    corpus through a single partition."""
    plan = _plan(spark, sf_dir, "pack_sequences")
    assert "hashpartitioning(source" in plan, plan[:800]
    assert "SinglePartition" not in plan, "global window = serialized corpus"


def test_decontaminate_joins_on_gram_hash_only(spark, sf_dir):
    """The contamination join must key on the fixed-width gram hash —
    never the raw gram strings — and must not cross-product."""
    plan = _plan(spark, sf_dir, "decontaminate_split")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(gh" in plan, plan[:800]


def test_no_query_plans_a_partitioned_cross_product(spark, sf_dir):
    """CartesianProduct (a PARTITIONED cross product — both sides
    shuffled against each other) must never appear: at corpus scale it
    is quadratic I/O no matter how the cluster is sized. A
    BroadcastNestedLoopJoin is allowed only for the whitelisted
    tiny-side designs above; anywhere else it means a broadcast
    assumption silently broke (e.g. a bounds frame grew)."""
    offenders = {}
    for name, spec in sorted(registry.all_queries().items()):
        plan = physical_plan(spec.fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_BY_DESIGN:
            offenders[name] = "BroadcastNestedLoopJoin (not whitelisted)"
    assert not offenders, f"scale-breaking join shapes: {offenders}"


def test_no_query_smuggles_python_into_the_hot_path(spark, sf_dir):
    """Every registered query must stay JVM-side (whole-stage codegen)
    unless Python is its explicit purpose — and row-at-a-time
    BatchEvalPython is banned everywhere."""
    offenders = {}
    for name, spec in sorted(registry.all_queries().items()):
        plan = physical_plan(spec.fn(spark, sf_dir))
        hits = [m for m in _PY_MARKERS if m in plan]
        if name in _PYTHON_BY_DESIGN:
            assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
        elif hits:
            offenders[name] = hits
    assert not offenders, f"Python stages leaked into JVM-only queries: {offenders}"


def test_doc_sentences_is_jvm_side_and_udtf_twin_matches(spark, sf_dir):
    """The registered doc_sentences must be pure JVM (split+posexplode,
    no Python stage); the Python-UDTF API demo must produce the exact
    same rows — it exists to exercise the LATERAL table-function
    surface, not to run in the data path."""
    from data_engineering_challenge_spark.operators.text_analysis import (
        doc_sentences_udtf,
    )

    plan = _plan(spark, sf_dir, "doc_sentences")
    assert not any(m in plan for m in _PY_MARKERS), plan[:800]

    jvm = registry.all_queries()["doc_sentences"].fn(spark, sf_dir)
    py = doc_sentences_udtf(spark, sf_dir)
    assert [tuple(r) for r in jvm.collect()] == [tuple(r) for r in py.collect()]


def test_q6_scan_pushes_all_predicates_no_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "forecast_revenue_change")
    assert "Join" not in plan  # single-table scan-aggregate
    (scan,) = scans_of(plan, "lineitem")
    pushed = scan.get("PushedFilters", "")
    assert "LessThan(l_quantity,24" in pushed
    assert "GreaterThanOrEqual(l_discount,0.045)" in pushed
    assert read_columns(scan) == {
        "l_shipdate",
        "l_discount",
        "l_quantity",
        "l_extendedprice",
    }


def test_q10_is_distributed_top20_with_pruned_fact(spark, sf_dir):
    plan = _plan(spark, sf_dir, "returned_item_customers")
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT 20
    (scan,) = scans_of(plan, "lineitem")
    assert "EqualTo(l_returnflag,R)" in scan.get("PushedFilters", "")
    assert read_columns(scan) == {
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
    }


def test_q19_part_disjunction_pushes_to_part_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "brand_size_disjunction_revenue")
    (scan,) = scans_of(plan, "part.parquet")
    # the brand/size OR is a part-only predicate -> pushed to the scan
    assert "Or(" in scan.get("PushedFilters", "")
    (fact,) = scans_of(plan, "lineitem")
    # quantity bounds common to all arms reach the fact scan
    assert "l_quantity" in fact.get("PushedFilters", "")


def test_q18_having_runs_before_customer_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "large_volume_customers")
    # the per-order aggregate + HAVING appears below (after in text) the
    # customer join: lineitem scan reads only the two agg columns, and
    # the filter on the aggregated qty exists in the plan
    (scan,) = scans_of(plan, "lineitem")
    assert read_columns(scan) == {"l_orderkey", "l_quantity"}
    assert "TakeOrderedAndProject" in plan


def test_build_vocab_takes_topk_before_window(spark, sf_dir):
    """build_vocab must select the top-K vocabulary with
    TakeOrderedAndProject (per-partition heaps) BEFORE the rank/
    coverage window: Heaps-law vocabularies reach 1e8+ distinct tokens
    at 100 TB, so an unpartitioned window sort of the FULL vocab table
    is the plan this pins against. In plan text the window must appear
    above (earlier line than) the TakeOrdered that feeds it, i.e. the
    window's child contains the limit, never the raw aggregate."""
    plan = _plan(spark, sf_dir, "build_vocab")
    assert "TakeOrderedAndProject" in plan
    w = plan.index("Window")
    t = plan.index("TakeOrderedAndProject")
    # formatted plans print operators top-down (consumers first): the
    # window consumes the TakeOrdered output, so it must print earlier
    assert w < t, "window runs over the full vocabulary, not the top-K"


def test_ivfpq_query_path_reads_stored_codes(spark, sf_dir):
    """ann_ivfpq_topk's query path must read the versioned snapshot
    tables (codes/centroids/codebook published by build_pq_index), and
    raw embeddings only for the query subset — re-encoding the corpus
    per query batch is exactly what the stored index exists to avoid."""
    plan = _plan(spark, sf_dir, "ann_ivfpq_topk")
    assert "v=1" in plan  # snapshot scans resolve through the manifest
    # the raw table feeds only probes + query LUTs (two pruned scans);
    # an encode path would add explode/groupBy scans over embeddings
    assert plan.count("embeddings.parquet") <= 2


def test_vocab_coverage_broadcasts_vocab_probe(spark, sf_dir):
    """The frozen top-K vocabulary must broadcast into the corpus-side
    probe join — a shuffled join here would re-shuffle the exploded
    corpus tokens on the token key at 100 TB."""
    plan = _plan(spark, sf_dir, "vocab_coverage_audit")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", ["dedup_source_matrix", "truncated_ann_recall"])
def test_sf_scaled_small_frames_broadcast_via_aqe_not_hints(spark, sf_dir, name):
    """The pair / per-query-top-k frames in these queries are SF-SCALED,
    so they carry no static broadcast hint (a hint bypasses the 8 GiB
    ceiling — the round-6 salted_join lesson). This asserts AQE still
    makes the broadcast at runtime while the frames are genuinely
    small: no live SortMergeJoin survives in the final adaptive plan."""
    from data_engineering_challenge_spark.plans import (
        executed_adaptive_plan,
        live_operator_count,
    )

    q = registry.all_queries()[name].fn(spark, sf_dir)
    final = executed_adaptive_plan(q)
    assert "isFinalPlan=true" in final
    assert live_operator_count(final, "SortMergeJoin") == 0
