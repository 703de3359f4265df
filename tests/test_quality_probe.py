"""Trained quality probe (`operators/quality_probe.py`): solve parity,
planted-corpus separation, snapshot lifecycle."""

from __future__ import annotations

import math
import os
import random

import duckdb
import pytest
from pyspark.sql import Row

from data_engineering_challenge_spark.operators import quality_probe as qp
from data_engineering_challenge_spark.sinks.versioned import history


def _duck_solve(a, b, k):
    """Run the generated Cholesky CTE chain on literal moments."""
    cols = [f"{a[i][j]!r}::DOUBLE AS a_{i}_{j}" for i in range(k) for j in range(i, k)]
    cols += [f"{b[i]!r}::DOUBLE AS b_{i}" for i in range(k)]
    ctes, prev = [], "mom"
    for n, (alias, sql) in enumerate(qp._chol_steps(k)):
        ctes.append(f"c_{n} AS (SELECT *, {sql} AS {alias} FROM {prev})")
        prev = f"c_{n}"
    q = (
        f"WITH mom AS (SELECT {', '.join(cols)}), {', '.join(ctes)} "
        f"SELECT {', '.join(f'w_{i}' for i in range(k))} FROM {prev}"
    )
    return list(duckdb.sql(q).fetchone())


def test_chol_sql_matches_python_bit_for_bit():
    # 50 random SPD ridge systems: the generated SQL solve and the
    # driver solve must agree on every weight EXACTLY (same op order).
    rng = random.Random(7)
    k = qp.K
    for _ in range(50):
        x = [[rng.randint(0, 3000) for _ in range(k)] for _ in range(200)]
        y = [rng.randint(0, 1) for _ in range(200)]
        a = [
            [
                float(sum(r[i] * r[j] for r in x)) + (qp.RIDGE if i == j else 0.0)
                for j in range(k)
            ]
            for i in range(k)
        ]
        b = [float(sum(r[i] * yy for r, yy in zip(x, y))) for i in range(k)]
        wp = qp._chol_py(a, b)
        wd = _duck_solve(a, b, k)
        assert all(wp[i] == wd[i] for i in range(k)), (wp, wd)


def test_chol_py_solves_the_system():
    # sanity beyond parity: A w == b to fp tolerance on a known system
    a = [[4.0, 2.0, 0.6], [2.0, 5.0, 1.0], [0.6, 1.0, 3.0]]
    b = [1.0, 2.0, 3.0]
    w = qp._chol_py([row[:] for row in a], b)
    for i in range(3):
        assert math.isclose(sum(a[i][j] * w[j] for j in range(3)), b[i], rel_tol=1e-12)


def _planted_docs(spark, path: str) -> str:
    # 40 separable docs: "good" = long, lexically diverse, stopword-rich
    # English; "bad" = short repetitive foreign-marker soup.
    rows = []
    for i in range(20):
        body = " ".join(f"word{i}_{j}" for j in range(30))
        rows.append(
            Row(
                doc_id=i,
                text=f"the quick study of {body} and a review of it in depth",
                lang="en",
                source="gold",
            )
        )
    for i in range(20, 40):
        rows.append(
            Row(doc_id=i, text="le la le la le " * 3, lang="fr", source="crawl")
        )
    df = spark.createDataFrame(rows).selectExpr(
        "CAST(doc_id AS BIGINT) doc_id",
        "text",
        "lang",
        "source",
        "CAST(length(text) AS BIGINT) n_chars",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory) -> str:
    return _planted_docs(spark, str(tmp_path_factory.mktemp("quality_probe")))


def test_probe_separates_planted_labels(spark, planted_dir):
    # the separation gate: a linear probe on these features must
    # classify the planted corpus essentially perfectly
    rows = qp.quality_probe_eval(spark, planted_dir).collect()
    n_correct = sum(r["n"] for r in rows if r["y"] == r["pred"])
    n_total = sum(r["n"] for r in rows)
    assert n_total == 40
    assert n_correct / n_total >= 0.95, rows


def test_scores_order_good_above_bad(spark, planted_dir):
    w = qp._load_weights(spark, planted_dir)
    from data_engineering_challenge_spark.catalog import load_table

    d = load_table(spark, planted_dir, "documents")
    scored = qp._spark_score(qp._spark_features(d), w).select("doc_id", "score")
    got = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert min(got[i] for i in range(20)) > max(got[i] for i in range(20, 40))


def test_model_snapshot_lifecycle(spark, planted_dir):
    # first query call trains + publishes v1; rebuilding publishes v2;
    # _load_weights reads the latest
    table_dir = qp.quality_model_dir(planted_dir)
    qp._load_weights(spark, planted_dir)
    assert history(table_dir)["latest"] >= 1
    v = qp.build_quality_model(spark, planted_dir, table_dir)
    assert history(table_dir)["latest"] == v >= 2
    w = qp._load_weights(spark, planted_dir)
    assert len(w) == qp.K and all(isinstance(x, float) for x in w)


def test_empty_corpus_degrades_to_zero_weights(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("quality_empty"))
    _planted_docs(spark, path)
    import pyspark.sql.functions as F
    from data_engineering_challenge_spark.catalog import load_table

    empty = load_table(spark, path, "documents").filter(F.lit(False))
    w = qp.train_quality_probe(qp._spark_features(empty))
    assert w == [0.0] * qp.K  # A = λI, b = 0


def test_incremental_weights_bit_equal_full_retrain(spark, tmp_path, monkeypatch):
    # additive sufficient statistics: frozen corpus moments + fresh
    # delta moments solve to EXACTLY the full-retrain weights
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    sf = "/root/testdata/sf0.01"
    inc = {
        r["feature"]: r["weight"]
        for r in qp.incremental_quality_weights(spark, sf).collect()
    }
    from data_engineering_challenge_spark.catalog import load_table

    full = qp.train_quality_probe(
        qp._spark_features(load_table(spark, sf, "documents"))
    )
    assert inc == {qp.FEATURES[i][0]: full[i] for i in range(qp.K)}


def test_extend_quality_moments_idempotent(spark, tmp_path, monkeypatch):
    from data_engineering_challenge_spark.sinks.versioned import read_snapshot

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx2"))
    sf = "/root/testdata/sf0.01"
    tdir = qp.quality_moments_dir(sf)
    qp.build_quality_moments(spark, sf, tdir)
    v2 = qp.extend_quality_moments(spark, sf, tdir)
    v3 = qp.extend_quality_moments(spark, sf, tdir)
    assert (v2, v3) == (2, 3)
    rows2 = sorted(map(tuple, read_snapshot(spark, tdir, 2).collect()))
    rows3 = sorted(map(tuple, read_snapshot(spark, tdir, 3).collect()))
    assert rows2 == rows3
    # folded snapshot sums to the full-corpus moments
    full_row = qp._moment_row(
        qp._spark_features(
            __import__(
                "data_engineering_challenge_spark.catalog", fromlist=["load_table"]
            ).load_table(spark, sf, "documents")
        )
    )
    from decimal import Decimal

    folded = {}
    for r in read_snapshot(spark, tdir, 3).collect():
        folded[r["name"]] = folded.get(r["name"], Decimal(0)) + r["val"]
    assert folded == {n: Decimal(full_row[n]) for n in qp._MOMENT_NAMES}


def test_quality_score_stream_matches_batch(spark, planted_dir, tmp_path, monkeypatch):
    from data_engineering_challenge_spark.streaming.pipelines import (
        quality_score_stream,
        run_stream_to_memory,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_qs"))
    # the file-drop source needs documents.parquet as a FILE (the
    # symlink-staging path); re-stage the planted dir via pandas
    import pandas as pd

    from data_engineering_challenge_spark.catalog import load_table as _lt

    fdir = tmp_path / "planted_file"
    fdir.mkdir()
    _lt(spark, planted_dir, "documents").toPandas().to_parquet(
        fdir / "documents.parquet", index=False
    )
    planted_dir = str(fdir)
    stream = quality_score_stream(spark, planted_dir)
    run_stream_to_memory(stream, "quality_scores_t", "append")
    got = {
        r["doc_id"]: (r["score"], r["pred"])
        for r in spark.sql("SELECT * FROM quality_scores_t").collect()
    }
    from data_engineering_challenge_spark.catalog import load_table

    w = qp._load_weights(spark, planted_dir)
    batch = {
        r["doc_id"]: (r["score"], r["pred"])
        for r in qp._spark_score(
            qp._spark_features(load_table(spark, planted_dir, "documents")), w
        )
        .select("doc_id", "score", "pred")
        .collect()
    }
    assert got == batch and len(got) == 40
