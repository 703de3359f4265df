"""Candidate-volume gate on the exact n-gram Jaccard verifier
(operators/dedup.py NGRAM_MAX_CANDIDATES).

Any exact AllPairs-family verifier is candidate-quadratic when gram
document frequency grows linearly with the corpus (fixed-vocabulary
corpora). The gate estimates the raw prefix-self-join volume — sum
over prefix-hash h of C(df(h), 2) — with one aggregate BEFORE the
join and fails fast with a routing message instead of launching a
shuffle that cannot finish. Here we craft exactly that corpus (every
doc drawn from a tiny fixed vocabulary, so prefix hashes collide
across the whole corpus) and pin both the trip and the inertness on
the registered fixture.
"""

from __future__ import annotations

import pandas as pd
import pytest

from data_engineering_challenge_spark.operators.dedup import (
    NGRAM_MAX_CANDIDATES,
    ngram_jaccard_pairs,
)

# 40 docs over a 6-word vocabulary: every doc shares most of its
# 3-grams with every other doc, so the rarest-first prefix still
# collides corpus-wide and the raw candidate estimate approaches
# C(40, 2) * prefix_len — hundreds of pairs from 40 docs, the
# fixed-vocab blowup shape in miniature.
_VOCAB = "alpha beta gamma delta epsilon zeta".split()


@pytest.fixture(scope="module")
def fixed_vocab_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixedvocab")
    rows = []
    for i in range(40):
        # rotate the vocabulary so docs are near-dups but not identical
        words = [_VOCAB[(i + j) % len(_VOCAB)] for j in range(12)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    pd.DataFrame(rows).to_parquet(root / "documents.parquet", index=False)
    return str(root)


def test_gate_trips_on_fixed_vocab_blowup(spark, fixed_vocab_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NGRAM_MAX_CAND", "50")
    with pytest.raises(RuntimeError) as exc:
        ngram_jaccard_pairs(spark, fixed_vocab_dir)
    msg = str(exc.value)
    assert "candidate volume" in msg
    # the message must route the caller to the linear-time path
    assert "minhash_lsh_pairs" in msg
    assert "sample_docs" in msg


def test_gate_inert_below_bound(spark, fixed_vocab_dir, monkeypatch):
    """With the default bound the tiny corpus is far below the gate and
    the verifier runs to completion (rotated near-dups overlap on
    grams but none reaches J >= 0.8 — the result is a well-defined,
    possibly empty frame, not an exception)."""
    monkeypatch.delenv("SPARK_GRAFT_NGRAM_MAX_CAND", raising=False)
    out = ngram_jaccard_pairs(spark, fixed_vocab_dir)
    assert out.columns == ["doc_a", "doc_b", "jaccard"]
    assert out.count() >= 0


def test_default_bound_admits_sf1_scale():
    """Provenance pin: the measured raw estimates are 122k at sf0.1 and
    16.2M at sf1 (SCALING.md). The default bound must admit the sf1
    corpus (the largest SF the exact verifier is registered to run
    full) with headroom, and reject the extrapolated sf10-full decade
    (~1.6e9)."""
    assert NGRAM_MAX_CANDIDATES >= 5 * 16_201_187
    assert NGRAM_MAX_CANDIDATES < 1_600_000_000
