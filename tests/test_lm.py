"""Planted-fixture semantics for the integer-bits bigram LM filter
(`operators/lm.py`).

The sf corpora are uniform synthetic text, so the oracle sweep pins
cross-engine exactness but not the MODEL semantics. Here a fluent doc
(bigrams common in train) and a gibberish doc (bigrams unseen in
train) are planted and the exact bits arithmetic asserted by hand.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.operators import lm


def _bucket(doc_id: int, n: int = 10) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n


def _ids_for(split: str, count: int, start: int = 0) -> list[int]:
    """First `count` doc_ids >= start landing in the given split."""
    want = (lambda b: b < 8) if split == "train" else (
        (lambda b: b == 8) if split == "val" else (lambda b: b == 9)
    )
    out, i = [], start
    while len(out) < count:
        if want(_bucket(i)):
            out.append(i)
        i += 1
    return out


def _docs(spark, rows, path):
    # single-FILE parquet (pandas), not a Spark directory: the stream
    # source helper symlinks the file into its drop dir, matching the
    # driver testdata's shape (see _stream_dir_for).
    import pandas as pd

    df = pd.DataFrame(
        [
            {
                "doc_id": int(doc_id),
                "text": text,
                "lang": "en",
                "source": source,
                "n_chars": len(text),
            }
            for doc_id, text, source in rows
        ]
    )
    df.to_parquet(os.path.join(path, "documents.parquet"), index=False)
    return path


# One train doc over a 40-token vocabulary: bigram (t_i, t_{i+1})
# each occurs once, context counts c1(t0..t38) = 1, V = 39 distinct
# contexts. V >= 32 matters: unseen bigrams then cost bits(V) = 5
# > the 4.95 flag threshold, so the gate is exercisable.
TRAIN_TEXT = " ".join(f"t{i}" for i in range(40))


@pytest.fixture(scope="module")
def lm_dir(spark, tmp_path_factory) -> str:
    train_id = _ids_for("train", 1)[0]
    test_ids = _ids_for("test", 2)
    rows = [
        (train_id, TRAIN_TEXT, "fluent"),
        # test: one fluent doc (bigrams seen in train), one gibberish
        (test_ids[0], "t0 t1 t2 t3", "fluent"),
        (test_ids[1], "zq xw zq xw", "gibberish"),
    ]
    return _docs(spark, rows, str(tmp_path_factory.mktemp("lm")))


def test_gibberish_scores_strictly_higher(spark, lm_dir):
    out = {
        (r["source"], r["split"]): r
        for r in lm.bigram_lm_score(spark, lm_dir).collect()
    }
    fluent = out[("fluent", "test")]
    gib = out[("gibberish", "test")]
    assert gib["avg_bits"] > fluent["avg_bits"]
    # threshold sanity: the gibberish doc trips the gate, fluent doesn't
    assert gib["n_flagged"] == 1
    assert fluent["n_flagged"] == 0


def test_exact_bits_arithmetic(spark, lm_dir):
    """Hand-computed add-one bigram surprisal on the planted corpus.

    Train: c12(t_i, t_{i+1}) = 1, c1(t_i) = 1, V = 39.

    Fluent test doc "t0 t1 t2 t3" (3 seen bigrams):
      each: bits(1+39) - bits(1+1) = 5 - 1 = 4 -> doc_bits = 12.

    Gibberish test doc "zq xw zq xw" (3 unseen bigrams, unseen
    contexts): each: bits(0+39) - bits(0+1) = 5 - 0 = 5 -> 15.
    """
    out = {
        (r["source"], r["split"]): r
        for r in lm.bigram_lm_score(spark, lm_dir).collect()
    }
    fluent = out[("fluent", "test")]
    assert fluent["total_bigrams"] == 3
    assert fluent["total_bits"] == 12
    gib = out[("gibberish", "test")]
    assert gib["total_bigrams"] == 3
    assert gib["total_bits"] == 15


def test_short_docs_excluded(spark, tmp_path_factory):
    train_id = _ids_for("train", 1)[0]
    rows = [(train_id, "single", "s")]  # 1 token -> no bigrams
    path = _docs(spark, rows, str(tmp_path_factory.mktemp("lm_short")))
    assert lm.bigram_lm_score(spark, path).count() == 0


def test_bits_helper_is_floor_log2(spark):
    df = spark.range(1, 1025).select(
        "id", lm._bits(F.col("id")).alias("b")
    )
    import math

    for r in df.collect():
        assert r["b"] == math.floor(math.log2(r["id"]))


def test_frozen_score_matches_inline_retrain(spark, lm_dir, tmp_path, monkeypatch):
    """The stored snapshot is a pure function of the train split: the
    frozen-model rollup must equal the inline train-from-scratch one."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_lm"))
    inline = sorted(tuple(r) for r in lm.bigram_lm_score(spark, lm_dir).collect())
    frozen = sorted(tuple(r) for r in lm.bigram_lm_frozen_score(spark, lm_dir).collect())
    assert frozen == inline
    # second call reuses the published snapshot (no retrain) — identical
    frozen2 = sorted(tuple(r) for r in lm.bigram_lm_frozen_score(spark, lm_dir).collect())
    assert frozen2 == frozen


def test_lm_score_stream_matches_batch_and_restarts(spark, lm_dir, tmp_path, monkeypatch):
    from data_engineering_challenge_spark.streaming.pipelines import run_lm_score_stream

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_lms"))
    out = str(tmp_path / "lm_scores")
    ckpt = str(tmp_path / "ckpt_lm")
    run_lm_score_stream(spark, lm_dir, out, ckpt)
    got = {
        r["doc_id"]: (r["doc_bits"], r["n_bigrams"], r["flagged"])
        for r in spark.read.parquet(out).collect()
    }
    c12, c1, vctx = lm.load_lm_model(spark, lm_dir)
    docs = spark.read.parquet(os.path.join(lm_dir, "documents.parquet"))
    batch = {
        r["doc_id"]: (r["doc_bits"], r["n_bigrams"], r["flagged"])
        for r in lm.lm_doc_scores(
            docs.select("doc_id", "source", "text"), c12, c1, vctx
        ).collect()
    }
    assert got == batch
    assert any(f for _, _, f in got.values())  # the gibberish doc is flagged
    # restart with no new data: landing table byte-stable
    run_lm_score_stream(spark, lm_dir, out, ckpt)
    got2 = {
        r["doc_id"]: (r["doc_bits"], r["n_bigrams"], r["flagged"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == got


def test_incremental_lm_equals_full_retrain(spark, lm_dir, tmp_path, monkeypatch):
    """Frozen corpus counts + fresh delta counts must reproduce the
    full-retrain rollup exactly (counts are additive sufficient
    statistics; vctx derives from the folded c1 table)."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_ilm"))
    full = sorted(tuple(r) for r in lm.bigram_lm_score(spark, lm_dir).collect())
    incr = sorted(tuple(r) for r in lm.incremental_lm_score(spark, lm_dir).collect())
    assert incr == full


def test_lm_fold_is_idempotent_and_matches_frozen_path(
    spark, lm_dir, tmp_path, monkeypatch
):
    """extend_lm_counts twice == once (is_delta replacement), and the
    FOLDED snapshot scores identically to the pre-fold refreshed model."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx_fold"))
    from data_engineering_challenge_spark.sinks.versioned import read_snapshot

    table_dir = lm.lm_counts_dir(lm_dir)
    lm.build_lm_corpus_counts(spark, lm_dir, table_dir)
    v2 = lm.extend_lm_counts(spark, lm_dir, table_dir)
    v3 = lm.extend_lm_counts(spark, lm_dir, table_dir)
    assert (v2, v3) == (2, 3)
    s2 = sorted(
        tuple(r) for r in read_snapshot(spark, table_dir, version=2).collect()
    )
    s3 = sorted(
        tuple(r) for r in read_snapshot(spark, table_dir, version=3).collect()
    )
    assert s2 == s3  # night-two replay replaces, never double-counts
    # folded counts == full-train counts: score with them and compare
    c12, c1 = lm._folded_model(
        read_snapshot(spark, table_dir).select("kind", "key", "cnt")
    )
    vctx = c1.count()
    docs = spark.read.parquet(os.path.join(lm_dir, "documents.parquet"))
    folded = {
        r["doc_id"]: (r["doc_bits"], r["n_bigrams"])
        for r in lm.lm_doc_scores(
            docs.select("doc_id", "source", "text"), c12, c1, vctx
        ).collect()
    }
    cf12, cf1, cfv = lm.load_lm_model(spark, lm_dir)
    fullm = {
        r["doc_id"]: (r["doc_bits"], r["n_bigrams"])
        for r in lm.lm_doc_scores(
            docs.select("doc_id", "source", "text"), cf12, cf1, cfv
        ).collect()
    }
    assert folded == fullm
