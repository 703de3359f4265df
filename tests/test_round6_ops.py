"""Focused pins for the round-6 operators: build_vocab,
embedding_norm_audit, session_gap_profile (fleet sweeps cover
empty-input / partition-invariance / plan gates; these pin the
operator-specific semantics)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_engineering_challenge_spark.operators.similarity import (
    UNIT_NORM_TOL,
    embedding_norm_audit,
)
from data_engineering_challenge_spark.operators.text_analysis import build_vocab
from data_engineering_challenge_spark.operators.windows import (
    SESSION_GAP_US,
    _gap_bucket_expr,
    session_gap_profile,
)


def test_build_vocab_coverage_curve(spark, sf_dir):
    rows = build_vocab(spark, sf_dir).collect()
    assert rows, "vocab must be non-empty on driver data"
    # rank is dense 1..n; tf non-increasing; coverage strictly
    # increasing and ending at 1.0 when the whole vocab fits the cap
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    tfs = [r.tf for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    covs = [r.coverage for r in rows]
    assert all(b > a for a, b in zip(covs, covs[1:]))
    assert abs(covs[-1] - 1.0) < 1e-12
    # df can never exceed tf (a doc containing the token contributes
    # at least one occurrence), and both are positive
    assert all(0 < r.df <= r.tf for r in rows)


def test_embedding_norm_audit_unit_band(spark, sf_dir):
    row = embedding_norm_audit(spark, sf_dir).collect()[0]
    assert row.n_vectors > 0
    # driver embeddings are fixed-dim
    assert row.n_dims_distinct == 1 and row.dim_min == row.dim_max
    assert 0 <= row.n_zero <= row.n_vectors
    assert 0 <= row.n_unit <= row.n_vectors
    assert row.min_norm <= row.max_norm
    # the unit band is consistent with the reported envelope: if every
    # vector is inside ±tol of 1, n_unit must equal n_vectors
    if 1 - UNIT_NORM_TOL <= row.min_norm and row.max_norm <= 1 + UNIT_NORM_TOL:
        assert row.n_unit == row.n_vectors


def test_gap_bucket_session_edge_alignment(spark):
    """A gap of exactly SESSION_GAP_US stays in-session under the
    sessionize rule (break on gap > threshold), so it must land in the
    in-session bucket; one microsecond more crosses the cut."""
    df = spark.createDataFrame(
        [(SESSION_GAP_US,), (SESSION_GAP_US + 1,), (999_999,), (7_200_000_000,)],
        "gap_us long",
    ).select("gap_us", _gap_bucket_expr(F.col("gap_us")).alias("b"))
    got = {r.gap_us: r.b for r in df.collect()}
    assert got[SESSION_GAP_US] == "3_5m_30m"
    assert got[SESSION_GAP_US + 1] == "4_30m_2h"
    assert got[999_999] == "0_lt_1s"
    assert got[7_200_000_000] == "4_30m_2h"


def test_session_gap_profile_shares_sum_to_one(spark, sf_dir):
    rows = session_gap_profile(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    # gap count per bucket is at least the distinct-user count only
    # when every user contributes one gap; the invariant that always
    # holds is n_users <= n_gaps and n_users >= 1
    assert all(1 <= r.n_users <= r.n_gaps for r in rows)


def test_session_gap_profile_synthetic_buckets(spark):
    """Three users with hand-placed gaps: the histogram is exact."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(uid, offset_us):
        nonlocal eid
        eid += 1
        return (eid, t0 + datetime.timedelta(microseconds=offset_us), uid)

    # user 1: gaps of 0.5 s and 90 s -> buckets 0 and 2... (90 s is 1m-5m? 90s >= 60s -> bucket 2)
    rows += [ev(1, 0), ev(1, 500_000), ev(1, 500_000 + 90_000_000)]
    # user 2: one gap of exactly the session threshold -> bucket 3
    rows += [ev(2, 0), ev(2, SESSION_GAP_US)]
    # user 3: one gap of 3 hours -> bucket 5
    rows += [ev(3, 0), ev(3, 3 * 3600 * 1_000_000)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz, user_id long")
    got = {
        r.gap_bucket: (r.n_gaps, r.n_users)
        for r in df.withColumn("prev_ts", F.lag("ts").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .withColumn("gap_us", F.expr("timestampdiff(MICROSECOND, prev_ts, ts)"))
        .filter(F.col("gap_us").isNotNull())
        .withColumn("gap_bucket", _gap_bucket_expr(F.col("gap_us")))
        .groupBy("gap_bucket")
        .agg(F.count(F.lit(1)).alias("n_gaps"), F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    assert got == {
        "0_lt_1s": (1, 1),
        "2_1m_5m": (1, 1),
        "3_5m_30m": (1, 1),
        "5_gt_2h": (1, 1),
    }


# ---- bm25_topk: hand-computed pin on a tiny constructed corpus ------

def test_bm25_matches_hand_computation(spark, tmp_path):
    from data_engineering_challenge_spark.operators.text_analysis import (
        BM25_B,
        BM25_K1,
        bm25_topk,
    )

    docs = [
        (0, "vector merge vector stream"),        # 3 matched terms, dl=4
        (1, "hash hash hash hash hash hash"),     # 1 term saturating, dl=6
        (2, "the a of and to in is it"),          # no query terms, dl=8
        (3, "vector"),                            # dl=1
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r.doc_id: r for r in bm25_topk(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 1, 3}, "doc 2 matches no query term"

    n_docs, avgdl = 4, (4 + 6 + 8 + 1) / 4.0
    df_ = {"vector": 2, "merge": 1, "stream": 1, "hash": 1}

    def score(tf, term, dl):
        idf = (n_docs - df_[term] + 0.5) / (df_[term] + 0.5)
        sat = (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl / avgdl))
        )
        return idf * sat

    exp0 = score(2, "vector", 4) + score(1, "merge", 4) + score(1, "stream", 4)
    exp1 = score(6, "hash", 6)
    exp3 = score(1, "vector", 1)
    assert abs(got[0].bm25_score - exp0) < 1e-12
    assert abs(got[1].bm25_score - exp1) < 1e-12
    assert abs(got[3].bm25_score - exp3) < 1e-12
    assert got[0].n_matched_terms == 3
    # rnk is dense over the returned rows, ordered by score desc
    by_rnk = sorted(got.values(), key=lambda r: r.rnk)
    assert [r.rnk for r in by_rnk] == [1, 2, 3]
    scores = [r.bm25_score for r in by_rnk]
    assert scores == sorted(scores, reverse=True)


def test_bm25_saturation_bounds(spark, sf_dir):
    """tf-saturation: the per-term factor is bounded by k1+1, so a doc
    matching a single term can never exceed idf_max * (k1+1)."""
    from data_engineering_challenge_spark.operators.text_analysis import (
        BM25_K1,
        BM25_QUERY_TERMS,
        bm25_topk,
    )

    rows = bm25_topk(spark, sf_dir).collect()
    assert rows and len(rows) <= 20
    # rational idf with df>=1 on n docs is < n+0.5/1.5; a loose but
    # structural ceiling: score < n_terms * idf_max * (k1+1)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    idf_max = (n_docs - 1 + 0.5) / 1.5
    ceiling = len(BM25_QUERY_TERMS) * idf_max * (BM25_K1 + 1.0)
    assert all(0 < r.bm25_score < ceiling for r in rows)
    assert all(1 <= r.n_matched_terms <= len(BM25_QUERY_TERMS) for r in rows)


# ---- ann_pq_topk: code-shape pin (recall gate lives in
# tests/test_ann_recall.py; strict value rows in the oracle sweeps) ---

def test_pq_topk_shape(spark, sf_dir):
    from data_engineering_challenge_spark.operators.similarity import (
        TOP_K,
        ann_pq_topk,
    )

    rows = ann_pq_topk(spark, sf_dir).collect()
    assert rows
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == min(TOP_K, len(rs))
        assert [r.rnk for r in sorted(rs, key=lambda r: r.rnk)] == list(
            range(1, len(rs) + 1)
        )
        assert all(r.neighbor_id != q for r in rs)
        scores = [r.pq_score for r in sorted(rs, key=lambda r: r.rnk)]
        assert scores == sorted(scores, reverse=True)


def test_pq_reconstruction_error_ordering(spark, sf_dir):
    """Order statistics must nest (median <= p90 <= max), errors are
    non-negative, and n_vectors is the corpus size."""
    from data_engineering_challenge_spark.operators.similarity import (
        pq_reconstruction_error,
    )

    row = pq_reconstruction_error(spark, sf_dir).collect()[0]
    n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert row.n_vectors == n
    assert 0.0 <= row.median_err <= row.p90_err <= row.max_err
