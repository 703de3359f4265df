"""Skew-mitigation and bucketing utilities: semantics preserved,
shuffles eliminated where promised."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_challenge_spark.catalog import load_table
from data_engineering_challenge_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)
from data_engineering_challenge_spark.plans.checks import physical_plan
from data_engineering_challenge_spark.sinks.writers import write_bucketed_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    plain = sorted(
        map(tuple, l.join(p, l.l_partkey == p.p_partkey).collect())
    )
    salted = sorted(map(tuple, salted_join(l, p, "l_partkey", "p_partkey").collect()))
    assert salted == plain


def test_salted_count_distinct_matches_exact(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_suppkey: r.n
        for r in l.groupBy("l_suppkey").agg(F.countDistinct("l_orderkey").alias("n")).collect()
    }
    salted = {
        r.l_suppkey: r.n_distinct_l_orderkey
        for r in salted_count_distinct(l, "l_suppkey", "l_orderkey").collect()
    }
    assert salted == exact


def test_bucketed_join_runs_without_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key must sort-merge join with
    zero Exchange nodes — the pay-once-at-load co-location design."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed_table(o, "orders_b", "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    write_bucketed_table(l, "lineitem_b", "l_orderkey", n_buckets=8, sort_col="l_orderkey")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "(1) Exchange" not in plan  # no shuffle exchange at all
        import re

        assert not re.search(r"\(\d+\) Exchange\b", plan)
        # and it still computes the right thing
        assert joined.count() == o.join(l, o.o_orderkey == l.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(128 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_ivf_stride_scales_as_sqrt_n(spark):
    """The adaptive coarse-quantizer stride must grow ~sqrt(n): cells =
    n/stride ~ sqrt(n) keeps assignment n*sqrt(n) (a fixed stride makes
    it quadratic — the round-2 scale-killer). Pin the arithmetic at a
    corpus size where sqrt dominates the floor."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.operators.similarity import (
        _stride_centroids,
    )

    n = 40_000
    e = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0)).alias("v"),
        F.lit(1.0).alias("nrm"),
    )
    cells = _stride_centroids(e).count()
    # stride = max(23, floor(n / ceil(sqrt(n)))) = 200 -> 200 cells
    assert cells == n // 200
    # and a tiny corpus keeps the historical floor of 23
    tiny = spark.range(500).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0)).alias("v"),
        F.lit(1.0).alias("nrm"),
    )
    assert _stride_centroids(tiny).count() == len(range(0, 500, 23))


def test_trained_ivf_cells_at_search_balance_point(spark):
    """The TRAINED quantizer sizes cells at c* = sqrt(n*N_PROBE/
    QUERY_MOD) ~ sqrt(n)/4, not sqrt(n): training pays the n*c
    assignment three times (2 k-median rounds + final), so the cell
    count balances assignment against probe cost for the registered
    query fraction. Pin the arithmetic on both regimes."""
    import math

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.operators.similarity import (
        N_PROBE,
        QUERY_MOD,
        _trained_stride_centroids,
    )

    for n in (500, 40_000):
        e = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0)).alias("v"),
            F.lit(1.0).alias("nrm"),
        )
        c_star = max(1, math.ceil(math.sqrt(n * N_PROBE / QUERY_MOD)))
        stride = max(1, n // c_star)
        assert _trained_stride_centroids(e).count() == len(range(0, n, stride))


def test_persist_ledger_drains_exactly_tracked_frames(spark):
    """track_persist caches; drain_cache_ledger unpersists exactly the
    tracked frames (the bounded-cache contract that replaced blanket
    clearCache)."""
    from data_engineering_challenge_spark import registry

    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    registry.track_persist(df)
    df.count()
    assert df.storageLevel.useMemory or df.storageLevel.useDisk
    registry.drain_cache_ledger()
    assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
    assert not registry._CACHE_LEDGER


def test_salted_count_distinct_spreads_zipf_hot_key(spark):
    """Skew realism (VERDICT r3 stretch): the salted rewrite is only
    worth shipping if a Zipf-skewed hot key actually SPREADS. Build a
    pathological table (one group owns ~90% of rows), then pin the
    mechanism, not wall-clock (non-flaky on shared CI hardware):

    - correctness: salted == exact countDistinct on the skewed table;
    - spread: stage-1 of the salted plan keys on (group, salt), so the
      hot group's distinct values must land in every salt bucket with
      no bucket holding more than 2/n_salt of them. Removing the salt
      (the regression this guards) collapses the hot group into ONE
      reduce key and the assertion fails.
    """
    from pyspark.sql import functions as F

    n_salt = 8
    # Zipf-ish: group 0 has 90k rows / 30k distinct values; groups
    # 1..99 have ~100 rows each. Deterministic: id-derived.
    df = (
        spark.range(0, 100_000, 1, 16)
        .select(
            F.when(F.col("id") < 90_000, F.lit(0))
            .otherwise((F.col("id") % 99 + 1))
            .cast("long")
            .alias("grp"),
            F.pmod(F.col("id") * 2654435761, F.lit(30_000)).alias("val"),
        )
    )
    exact = {
        r.grp: r.n for r in df.groupBy("grp").agg(F.countDistinct("val").alias("n")).collect()
    }
    got = {
        r.grp: r[f"n_distinct_val"]
        for r in salted_count_distinct(df, "grp", "val", n_salt=n_salt).collect()
    }
    assert got == exact

    # mechanism pin: replicate stage-1's keying and measure the hot
    # group's per-salt distribution
    salt = F.pmod(F.hash(F.col("val")), F.lit(n_salt))
    hot = (
        df.filter(F.col("grp") == 0)
        .select("val", salt.alias("s"))
        .distinct()
        .groupBy("s")
        .count()
        .collect()
    )
    sizes = {r.s: r["count"] for r in hot}
    total = sum(sizes.values())
    assert len(sizes) == n_salt, f"hot group uses only salts {sorted(sizes)}"
    assert max(sizes.values()) <= 2 * total / n_salt, (
        f"hot group not spread: {sizes}"
    )


def test_spread_scan_spreads_small_scans_and_leaves_parallel_frames_alone(spark, sf_dir):
    """spread_scan must (a) raise a single-partition scan to session
    parallelism without changing content, and (b) be a NO-OP — no added
    exchange — when the frame already has >= cores partitions (the
    cluster-scale case)."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.catalog import load_table, spread_scan

    import pytest

    target = spark.sparkContext.defaultParallelism
    d = load_table(spark, sf_dir, "documents")
    if d.rdd.getNumPartitions() >= target:
        # a 1-2 core runner can't demonstrate the spread case (the
        # single-file scan already meets parallelism there)
        pytest.skip("scan already >= session parallelism on this machine")
    spread = spread_scan(d, spark, "doc_id")
    assert spread.rdd.getNumPartitions() == target
    assert sorted(r.doc_id for r in spread.select("doc_id").collect()) == sorted(
        r.doc_id for r in d.select("doc_id").collect()
    )

    wide = spark.range(0, 1000, 1, target).select(F.col("id").alias("doc_id"))
    assert spread_scan(wide, spark, "doc_id") is wide  # no-op, no shuffle


def test_sessionize_hybrid_hot_path_matches_lag_semantics(spark):
    """The segmented-scan branch of sessionize_skew_hybrid must produce
    EXACTLY the sessions of the plain lag formulation — including
    chunk-boundary stitching (events whose 30-min-gap predecessor lives
    in an earlier 1-hour chunk) and carried session starts across empty
    chunks. Built from a synthetic two-user frame with one 'hot' user
    whose events straddle many chunk boundaries; hot_threshold=10
    forces that user through the segmented path while the other takes
    the lag path."""
    import datetime

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.operators.windows import (
        _sessionize_lag,
        sessionize_hybrid_frame,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # hot user 1: bursts that cross hour-chunk boundaries, with
    # >30-min gaps between bursts and multi-hour empty stretches
    eid = 0
    for burst_start_min in (50, 130, 131, 480, 1500):  # minutes from base
        for j in range(12):  # 12 events 5 min apart → crosses an hour edge
            rows.append((1, base + datetime.timedelta(minutes=burst_start_min + 5 * j), eid))
            eid += 1
    # cold user 2: a few scattered events
    for m in (10, 20, 300, 301):
        rows.append((2, base + datetime.timedelta(minutes=m), eid)); eid += 1
    e = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")

    got = sessionize_hybrid_frame(e, hot_threshold=10)
    # reference: plain lag sessions, numbered the same way
    from pyspark.sql import Window as W

    ws = W.partitionBy("user_id").orderBy("session_start_tsd")
    want = (
        _sessionize_lag(e)
        .withColumn("session_id", F.row_number().over(ws).cast("bigint"))
        .select("user_id", "session_id", "n_events", "session_start", "session_end")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the hot path really ran: user 1 exceeds the threshold
    assert e.groupBy("user_id").count().filter("count > 10").count() == 1


def test_sessionize_events_registered_is_hybrid_and_lag_twin_matches(spark, sf_dir):
    """Round-5 reroute pin: the REGISTERED sessionize_events runs the
    skew-safe hybrid (no single-task lag window over the raw events in
    the no-hot-key plan is fine — uniform data takes the lag plan — but
    the registered fn must be the hybrid entry point), and the demoted
    sessionize_lag_plan stays an exact equivalence twin."""
    from data_engineering_challenge_spark.catalog import load_table
    from data_engineering_challenge_spark.operators.windows import (
        sessionize_events,
        sessionize_lag_plan,
    )

    got = sessionize_events(spark, sf_dir)
    want = sessionize_lag_plan(load_table(spark, sf_dir, "events"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sessionize_hybrid_keeps_null_user_rows(spark):
    """When hot keys exist, NULL-user events must still sessionize as
    their own partition (a bare ~isin(hot) is NULL for NULL user_id and
    would drop them from both branches)."""
    import datetime

    from data_engineering_challenge_spark.operators.windows import (
        sessionize_hybrid_frame,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for j in range(20):  # hot user
        rows.append((1, base + datetime.timedelta(minutes=5 * j), eid)); eid += 1
    for m in (10, 20, 300):  # NULL user: two sessions
        rows.append((None, base + datetime.timedelta(minutes=m), eid)); eid += 1
    e = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")

    got = sessionize_hybrid_frame(e, hot_threshold=10)
    null_rows = [tuple(r) for r in got.filter("user_id IS NULL").collect()]
    assert len(null_rows) == 2
    assert sorted(r[2] for r in null_rows) == [1, 2]  # n_events per session


def test_sessionize_hybrid_null_group_itself_hot(spark):
    """If the NULL-user group ITSELF exceeds hot_threshold, None must
    not enter the hot-key isin list: a None inside isin() makes
    ~isin evaluate to NULL for every cold non-null key, silently
    emptying the cold branch. NULL rows always take the lag path."""
    import datetime

    from data_engineering_challenge_spark.operators.windows import (
        sessionize_hybrid_frame,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for j in range(20):  # NULL group is hot (20 > threshold 10)
        rows.append((None, base + datetime.timedelta(minutes=5 * j), eid)); eid += 1
    for j in range(15):  # hot non-null user
        rows.append((1, base + datetime.timedelta(minutes=5 * j), eid)); eid += 1
    for m in (10, 20, 300):  # cold user 2: two sessions
        rows.append((2, base + datetime.timedelta(minutes=m), eid)); eid += 1
    e = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_id long")

    got = sessionize_hybrid_frame(e, hot_threshold=10)
    # cold user survives with both sessions
    cold = [tuple(r) for r in got.filter("user_id = 2").collect()]
    assert len(cold) == 2
    assert sorted(r[2] for r in cold) == [1, 2]
    # NULL group sessionizes as one 20-event session via the lag path
    null_rows = [tuple(r) for r in got.filter("user_id IS NULL").collect()]
    assert len(null_rows) == 1 and null_rows[0][2] == 20
    # hot user still present
    assert got.filter("user_id = 1").count() == 1


def test_asof_tie_purchases_resolve_to_highest_event_id(spark):
    """sf10 regression pin (round 5): two purchases for the same user at
    the SAME microsecond — the as-of result must carry the highest
    event_id's value on both engines (an undeduped right side makes both
    the union-merge window and DuckDB's native ASOF pick arbitrarily)."""
    import datetime

    import duckdb

    from data_engineering_challenge_spark import testing
    from data_engineering_challenge_spark.registry import all_queries

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 100, base, "purchase", 10.0, None),
        (1, 101, base, "purchase", 99.0, None),  # same ts, higher event_id wins
        (1, 200, base + datetime.timedelta(minutes=5), "click", 0.0, None),
    ]
    e = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string, value double, props string"
    )
    import tempfile, os
    d = tempfile.mkdtemp(prefix="asof_tie_")
    e.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))

    spec = all_queries()["clicks_asof_purchase"]
    got = spec.fn(spark, d)
    rows_got = [tuple(r) for r in got.collect()]
    assert len(rows_got) == 1 and rows_got[0][4] == 99.0, rows_got

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
    d_cols, d_rows = testing.run_oracle(con, spec.oracle)
    ok, detail = testing.compare(got.columns, rows_got, d_cols, d_rows)
    assert ok, detail
