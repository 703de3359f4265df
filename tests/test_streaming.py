"""Structured Streaming pipelines driven to completion against their
batch twins (memory sink + processAllAvailable)."""

from __future__ import annotations

from data_engineering_challenge_spark.operators.windows import events_hourly
from data_engineering_challenge_spark.streaming.pipelines import (
    dedup_events_stream,
    hourly_event_counts_stream,
    run_stream_to_memory,
)
from data_engineering_challenge_spark.testing import compare


def test_streaming_hourly_matches_batch(spark, sf_dir):
    s = hourly_event_counts_stream(spark, sf_dir)
    assert s.isStreaming
    # complete mode: a finite file source never advances the watermark
    # past the last events, so append would withhold the final windows
    run_stream_to_memory(s, "hourly_out", mode="complete")
    got = spark.sql("SELECT * FROM hourly_out")
    want = events_hourly(spark, sf_dir)
    ok, detail = compare(
        got.columns,
        [tuple(r) for r in got.collect()],
        want.columns,
        [tuple(r) for r in want.collect()],
    )
    assert ok, detail


def test_streaming_dedup(spark, sf_dir):
    s = dedup_events_stream(spark, sf_dir)
    run_stream_to_memory(s, "dedup_out", mode="append")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").first()
    assert got.n == got.d  # no duplicate event_ids survive
    assert got.n > 0


def test_stateful_user_totals_matches_batch(spark, sf_dir):
    import pytest

    from data_engineering_challenge_spark.catalog import load_table
    from data_engineering_challenge_spark.streaming.pipelines import user_totals_stream
    from pyspark.sql import functions as F

    s = user_totals_stream(spark, sf_dir)
    assert s.isStreaming
    run_stream_to_memory(s, "user_totals_out", mode="update")
    # last update per user = the totals after all data was consumed
    got = {
        r.user_id: r
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                   SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY n_events DESC) rk
                   FROM user_totals_out) WHERE rk = 1"""
        ).collect()
    }
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .collect()
    )
    assert len(got) == len(want)
    for w in want:
        g = got[w.user_id]
        assert g.n_events == w.n_events
        assert g.total_value == pytest.approx(w.total_value, rel=1e-9)
