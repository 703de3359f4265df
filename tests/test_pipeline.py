"""Declarative pipeline runner: config-driven source→...→sink with
per-stage stats."""

from __future__ import annotations

import pytest

from data_engineering_challenge_spark.pipeline import run_pipeline


def test_synthetic_to_zorder_pipeline(spark, tmp_path):
    out = str(tmp_path / "docs")
    stats = run_pipeline(
        spark,
        {
            "source": {"format": "synthetic", "n_docs": 3000, "n_partitions": 8},
            "dedup": {"keys": ["text"]},
            "split": {"key": "doc_id", "column": "split"},
            "sink": {"mode": "zorder", "path": out, "cols": ["doc_id", "n_chars"], "n_files": 4},
        },
    )
    assert stats["rows_in"] == 3000
    assert 0 < stats["rows_out"] <= 3000
    sc = stats["split_counts"]
    assert set(sc) == {"train", "val", "test"}
    # 8/1/1 by content hash: train strictly dominates
    assert sc["train"] > 5 * max(sc["val"], sc["test"])
    back = spark.read.parquet(out)
    assert back.count() == stats["rows_out"]
    assert back.select("text").distinct().count() == stats["rows_out"]


def test_parquet_passthrough_pipeline(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders")
    stats = run_pipeline(
        spark,
        {
            "source": {"format": "parquet", "path": f"{sf_dir}/orders.parquet"},
            "sink": {"mode": "plain", "path": out},
        },
    )
    assert stats["rows_in"] == stats["rows_out"] > 0


def test_validation_gate_fails_closed(spark, tmp_path):
    # transactions contracts against a frame that violates them:
    # the gate must raise, not write garbage downstream
    import pyspark.sql.functions as F

    from data_engineering_challenge_spark import schemas
    from data_engineering_challenge_spark.sources.csv import clean_to_schema

    bad = spark.createDataFrame(
        [("not-a-pdv", "TIDx", "2024-01-01")],
        ["point_de_vente", "numero_transaction", "date_transaction"],
    )
    src = str(tmp_path / "bad_src")
    clean_to_schema(bad, schemas.TRANSACTIONS_SCHEMA).write.parquet(src)
    with pytest.raises(ValueError, match="validation gate"):
        run_pipeline(
            spark,
            {
                "source": {"format": "parquet", "path": src},
                "validate": {"table": "transactions", "max_invalid_fraction": 0.0},
                "sink": {"mode": "plain", "path": str(tmp_path / "out")},
            },
        )


def test_pipeline_cli_main(spark, tmp_path):
    import json
    import sys

    sys.path.insert(0, "tools")
    import pipeline as cli

    cfg = {
        "source": {"format": "synthetic", "n_docs": 300, "n_partitions": 4},
        "sink": {"mode": "plain", "path": str(tmp_path / "out")},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main([str(cfg_path)])
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["rows_in"] == stats["rows_out"] == 300


def test_incremental_nightly_stage(spark, tmp_path, monkeypatch):
    # delta-probe -> fold -> vacuum for both index families from one
    # JSON spec, and the re-run is idempotent (same probe rows, one
    # more version folded, retention bounded by vacuum_keep)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    cfg = {
        "incremental": {
            "sf_dir": "/root/testdata/sf0.01",
            "indexes": ["span", "minhash", "quality", "lm", "phash", "wavhash"],
            "probe_out": str(tmp_path / "probe"),
            "vacuum_keep": 2,
        }
    }
    night1 = run_pipeline(spark, cfg)
    assert set(night1) == {"span", "minhash", "quality", "lm", "phash", "wavhash"}
    for kind in ("span", "minhash", "quality", "lm", "phash", "wavhash"):
        assert night1[kind]["index_version"] == 2  # build v1 + fold v2
    assert night1["quality"]["probe_rows"] == 7  # the refreshed model
    assert night1["lm"]["probe_rows"] == 59  # per-(source, split) rollup
    night2 = run_pipeline(spark, cfg)
    for kind in ("span", "minhash", "quality", "lm", "phash", "wavhash"):
        # same delta re-probed against the same corpus rows -> same report
        assert night2[kind]["probe_rows"] == night1[kind]["probe_rows"]
        assert night2[kind]["index_version"] == 3  # idempotent re-fold
        assert len(night2[kind]["versions_retained"]) <= 2
        assert night2[kind]["vacuumed_versions"] == [1]


def test_incremental_unknown_kind_rejected(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="unknown incremental index kind"):
        run_pipeline(
            spark,
            {"incremental": {"sf_dir": "/root/testdata/sf0.01",
                             "indexes": ["bogus"],
                             "probe_out": str(tmp_path / "p")}},
        )


def test_span_dedup_and_quality_filter_stages(spark, tmp_path):
    # corpus source -> span rewrite -> trained-probe filter -> sink,
    # all from one config
    out = str(tmp_path / "clean")
    stats = run_pipeline(
        spark,
        {
            "source": {
                "format": "parquet",
                "path": "/root/testdata/sf0.01/documents.parquet",
            },
            "span_dedup": True,
            "quality_filter": {"min_score": 0.0},
            "sink": {"mode": "plain", "path": out},
        },
    )
    assert stats["rows_in"] == 500
    assert stats["span_docs_cut"] > 0
    assert stats["span_tokens_removed"] > 0
    # min_score 0.0 with scores in ~[0,1]: nearly everything survives,
    # and the count arithmetic is consistent
    assert stats["rows_out"] == stats["rows_in"] - stats["quality_dropped"]
    assert len(stats["quality_weights"]) == 7
    # the sunk corpus carries the CLEANED text: re-detecting removable
    # spans on it finds nothing
    from data_engineering_challenge_spark.operators.span_dedup import _spans_over

    sunk = spark.read.parquet(out)
    assert _spans_over(sunk.select("doc_id", "text"), removable_only=True).count() == 0
