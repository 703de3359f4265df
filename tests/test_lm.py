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
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"]).selectExpr(
        "CAST(doc_id AS BIGINT) doc_id",
        "text",
        "'en' AS lang",
        "source",
        "CAST(length(text) AS BIGINT) n_chars",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
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
