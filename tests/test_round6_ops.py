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
