"""Planted-fixture semantics for the round-9 session-2 operators:
event_transition_matrix (ordering + tie-break + row normalization)
and shard_balance_audit (assignment determinism + manifest sums)."""

from __future__ import annotations

import datetime
import hashlib
import os

from data_engineering_challenge_spark.operators.funnels import event_transition_matrix
from data_engineering_challenge_spark.operators.pipeline_ops import (
    N_EXPORT_SHARDS,
    shard_balance_audit,
)


def _events(spark, rows, path):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    ).selectExpr(
        "CAST(event_id AS BIGINT) event_id",
        "CAST(ts AS TIMESTAMP) ts",
        "CAST(user_id AS BIGINT) user_id",
        "event_type",
        "CAST(1.0 AS DOUBLE) value",
        "'{}' props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "events.parquet"))
    return path


def _t(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s)


def test_transition_matrix_counts_and_probabilities(spark, tmp_path_factory):
    rows = [
        # user 1: A -> B -> A   (ties broken by event_id: 10 < 11 at same ts)
        (10, _t(0), 1, "A"),
        (11, _t(0), 1, "B"),
        (12, _t(5), 1, "A"),
        # user 2: B -> A
        (20, _t(0), 2, "B"),
        (21, _t(1), 2, "A"),
        # user 3: single event -> no transitions
        (30, _t(0), 3, "A"),
    ]
    path = _events(spark, rows, str(tmp_path_factory.mktemp("trans")))
    out = {
        (r["prev_type"], r["next_type"]): r
        for r in event_transition_matrix(spark, path).collect()
    }
    assert set(out) == {("A", "B"), ("B", "A")}
    assert out[("A", "B")]["n_transitions"] == 1
    assert out[("B", "A")]["n_transitions"] == 2
    # row-normalized: A has 1 outgoing, B has 2 -> both rows p = 1.0
    assert out[("A", "B")]["p_next"] == 1.0
    assert out[("B", "A")]["p_next"] == 1.0


def test_transition_matrix_row_normalization_splits(spark, tmp_path_factory):
    rows = [
        (1, _t(0), 1, "A"), (2, _t(1), 1, "B"),
        (3, _t(0), 2, "A"), (4, _t(1), 2, "B"),
        (5, _t(0), 3, "A"), (6, _t(1), 3, "C"),
        (7, _t(0), 4, "A"), (8, _t(1), 4, "C"),
    ]
    path = _events(spark, rows, str(tmp_path_factory.mktemp("trans2")))
    out = {
        (r["prev_type"], r["next_type"]): r["p_next"]
        for r in event_transition_matrix(spark, path).collect()
    }
    assert out == {("A", "B"): 0.5, ("A", "C"): 0.5}


def _docs(spark, rows, path):
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"]).selectExpr(
        "CAST(doc_id AS BIGINT) doc_id",
        "text",
        "'en' lang",
        "source",
        "CAST(length(text) AS BIGINT) n_chars",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def test_shard_assignment_is_salted_md5_and_sums_pin_content(spark, tmp_path_factory):
    rows = [(i, f"tok{i} tok{i} tok{i}", "s") for i in range(40)]
    path = _docs(spark, rows, str(tmp_path_factory.mktemp("shards")))
    out = shard_balance_audit(spark, path).collect()

    def shard_of(doc_id):
        return int(hashlib.md5(f"shard{doc_id}".encode()).hexdigest()[:8], 16) % N_EXPORT_SHARDS

    expect_docs: dict[int, int] = {}
    for i in range(40):
        expect_docs[shard_of(i)] = expect_docs.get(shard_of(i), 0) + 1
    got = {r["shard_id"]: r for r in out}
    assert {k: v["n_docs"] for k, v in got.items()} == expect_docs
    # every doc is 3 tokens; load ratios scale with doc counts and
    # total load is conserved
    total_tokens = sum(r["n_tokens"] for r in out)
    assert total_tokens == 40 * 3
    # ratios are normalized by total_tokens * N_EXPORT_SHARDS, so they
    # sum to N_EXPORT_SHARDS over ALL output shards (load conservation)
    assert abs(sum(r["load_ratio"] for r in out) - N_EXPORT_SHARDS) < 1e-9
    for r in out:
        assert r["n_tokens"] == r["n_docs"] * 3
        assert r["load_ratio"] == r["n_tokens"] * N_EXPORT_SHARDS / total_tokens
