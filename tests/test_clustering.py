"""Planted-fixture semantics for fixed-point Lloyd k-means
(`operators/clustering.py`): exact quantization, trunc-div centroid
means, tie-to-lowest-cell argmin, empty-cell guard."""

from __future__ import annotations

import os

import pytest

from data_engineering_challenge_spark.operators import clustering as km


def _embeddings(spark, rows, path, dim):
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).selectExpr(
        "CAST(vec_id AS BIGINT) vec_id",
        "CAST(embedding AS array<float>) embedding",
        "CAST(label AS INT) label",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )
    return path


def test_tdiv_is_truncating():
    assert km._tdiv(7, 3) == 2
    assert km._tdiv(-7, 3) == -2  # Python // would give -3
    assert km._tdiv(-6, 3) == -2
    assert km._tdiv(0, 5) == 0


def test_two_clusters_exact_centroids_and_inertia(spark, tmp_path_factory, monkeypatch):
    """Cluster A = {1.0, 1.25, 1.5}^4 (vec 0,2,4), cluster B =
    {100.0}^4 x3 (vec 1,3,5). Seeds (lowest 2 vec_ids) land one per
    cluster, so Lloyd converges in one update:

    A centroid_d = trunc((floor(1.0*S) + floor(1.25*S) + floor(1.5*S))/3)
                 = 1.25*S exactly; inertia = 2 vecs * 4 dims * (S/4)^2.
    B is three identical vectors: inertia 0.
    """
    monkeypatch.setattr(km, "KM_K", 2)
    monkeypatch.setattr(km, "KM_ITERS", 2)
    monkeypatch.setattr(km, "KM_DIM", 4)
    rows = [
        (0, [1.0] * 4, 0),
        (2, [1.25] * 4, 0),
        (4, [1.5] * 4, 0),
        (1, [100.0] * 4, 1),
        (3, [100.0] * 4, 1),
        (5, [100.0] * 4, 1),
    ]
    path = _embeddings(spark, rows, str(tmp_path_factory.mktemp("km2")), 4)
    out = {r["cell_id"]: r for r in km.kmeans_embeddings(spark, path).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_vectors"] == 3 and out[1]["n_vectors"] == 3
    s = km.KM_SCALE
    quarter = s // 4
    assert out[0]["inertia"] == 2 * 4 * quarter * quarter
    assert out[1]["inertia"] == 0


def test_empty_cell_keeps_centroid_and_ties_go_low(spark, tmp_path_factory, monkeypatch):
    """Two identical seed vectors: every vector is equidistant from
    both centroids, the tie sends all to cell 0, cell 1 stays empty
    (and silently keeps its centroid) — output is one row."""
    monkeypatch.setattr(km, "KM_K", 2)
    monkeypatch.setattr(km, "KM_ITERS", 2)
    monkeypatch.setattr(km, "KM_DIM", 4)
    rows = [(i, [5.0] * 4, 0) for i in range(6)]
    path = _embeddings(spark, rows, str(tmp_path_factory.mktemp("km1")), 4)
    out = km.kmeans_embeddings(spark, path).collect()
    assert len(out) == 1
    assert out[0]["cell_id"] == 0
    assert out[0]["n_vectors"] == 6
    assert out[0]["inertia"] == 0


def test_empty_input_returns_empty_frame(spark, tmp_path_factory):
    path = _embeddings(
        spark, spark.createDataFrame([], "vec_id long, embedding array<float>, label int").collect() or [],
        str(tmp_path_factory.mktemp("km0")), 64,
    ) if False else str(tmp_path_factory.mktemp("km0"))
    spark.createDataFrame([], "vec_id long, embedding array<float>, label int").write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "embeddings.parquet"))
    df = km.kmeans_embeddings(spark, path)
    assert df.columns == ["cell_id", "n_vectors", "inertia", "centroid_sig"]
    assert df.count() == 0


def test_quantization_is_floor_of_scaled_double(spark, tmp_path_factory):
    """floor(x * 2^20) must be exact for negatives too."""
    path = str(tmp_path_factory.mktemp("kmq"))
    rows = [(0, [-1.5, 0.5, -0.25, 1.0], 0)]
    _embeddings(spark, rows, path, 4)
    q = km._quantized(spark, path).collect()[0]["q"]
    s = km.KM_SCALE
    assert list(q) == [-3 * s // 2, s // 2, -s // 4, s]


def test_label_purity_on_separated_clusters(spark, tmp_path_factory, monkeypatch):
    """Two separated planted clusters with consistent labels -> both
    cells pure (1.0) with the planted majority labels."""
    monkeypatch.setattr(km, "KM_K", 2)
    monkeypatch.setattr(km, "KM_ITERS", 2)
    monkeypatch.setattr(km, "KM_DIM", 4)
    rows = [
        (0, [1.0] * 4, 7), (2, [1.25] * 4, 7), (4, [1.5] * 4, 7),
        (1, [100.0] * 4, 3), (3, [100.0] * 4, 3), (5, [100.0] * 4, 3),
    ]
    path = _embeddings(spark, rows, str(tmp_path_factory.mktemp("kmp")), 4)
    out = {r["cell_id"]: r for r in km.kmeans_label_purity(spark, path).collect()}
    assert out[0]["majority_label"] == 7 and out[0]["purity"] == 1.0
    assert out[1]["majority_label"] == 3 and out[1]["purity"] == 1.0
    assert out[0]["n_vectors"] == 3 and out[1]["n_vectors"] == 3


def test_label_purity_majority_ties_to_lowest_label(spark, tmp_path_factory, monkeypatch):
    """2-2 label split in one cell: the majority tie goes to the
    LOWEST label (both engines order by count desc, label asc)."""
    monkeypatch.setattr(km, "KM_K", 1)
    monkeypatch.setattr(km, "KM_ITERS", 1)
    monkeypatch.setattr(km, "KM_DIM", 4)
    rows = [(i, [5.0] * 4, 9 - (i % 2) * 4) for i in range(4)]  # labels 9,5,9,5
    path = _embeddings(spark, rows, str(tmp_path_factory.mktemp("kmt")), 4)
    out = km.kmeans_label_purity(spark, path).collect()
    assert len(out) == 1
    assert out[0]["majority_label"] == 5  # tie -> lowest label
    assert out[0]["purity"] == 0.5
