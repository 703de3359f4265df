"""Planted-fixture semantics for exact substring (span-level) dedup
(`operators/span_dedup.py`).

The sf corpora only contain generator near-dups, so the oracle sweep
can't pin the *merge* semantics (overlap vs adjacency vs split, the
within-doc exclusion, the hot-gram cap). Each phenomenon is planted
here and the exact span arithmetic asserted.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from data_engineering_challenge_spark.operators import span_dedup as sd

# 20 shared tokens -> 13 duplicated 8-gram positions (1..13), one
# maximal span of exactly 20 tokens in each sharing doc.
SHARED20 = " ".join(f"w{i}" for i in range(20))
# 8 shared tokens -> exactly one duplicated 8-gram position.
SHARED8 = " ".join(f"s{i}" for i in range(8))


def _docs(spark, rows, path):
    df = spark.createDataFrame(rows).selectExpr(
        "CAST(doc_id AS BIGINT) doc_id",
        "text",
        "lang",
        "source",
        "CAST(length(text) AS BIGINT) n_chars",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    return path


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory) -> str:
    rows = [
        # docs 0/1: identical 20-token block at different offsets
        Row(doc_id=0, text=f"{SHARED20} unique tail zero", lang="en", source="a"),
        Row(doc_id=1, text=f"lead one {SHARED20} and more", lang="en", source="a"),
        # doc 2: TWO separated copies of the 8-token block also in doc 3
        # -> the gap between position islands exceeds K, two spans
        Row(
            doc_id=2,
            text=f"{SHARED8} x0 x1 x2 x3 x4 x5 x6 x7 x8 {SHARED8}",
            lang="en",
            source="b",
        ),
        Row(doc_id=3, text=f"opener tokens {SHARED8} closer", lang="en", source="b"),
        # doc 4: within-doc repetition ONLY (no cross-doc partner) ->
        # must NOT surface (min(doc)==max(doc) for its grams)
        Row(
            doc_id=4,
            text=" ".join(["r0 r1 r2 r3 r4 r5 r6 r7"] * 2),
            lang="en",
            source="c",
        ),
        # doc 5: too short for any 8-gram
        Row(doc_id=5, text="tiny doc", lang="en", source="c"),
    ]
    return _docs(spark, rows, str(tmp_path_factory.mktemp("span_dedup")))


def test_duplicate_spans_merge_and_exclusions(spark, corpus_dir):
    got = {r["doc_id"]: r for r in sd.duplicate_spans(spark, corpus_dir).collect()}
    assert set(got) == {0, 1, 2, 3}, "within-doc-only and short docs excluded"
    # docs 0/1: one maximal span covering the 20 shared tokens
    for d in (0, 1):
        assert got[d]["n_spans"] == 1
        assert got[d]["dup_tokens"] == 20
        assert got[d]["longest_span"] == 20
    # doc 2: the two 8-token copies are 9 positions apart (gap > K) -> 2 spans
    assert got[2]["n_spans"] == 2
    assert got[2]["dup_tokens"] == 16
    assert got[2]["longest_span"] == 8
    # doc 3: single 8-token span
    assert got[3]["n_spans"] == 1 and got[3]["dup_tokens"] == 8


def test_adjacent_islands_merge_into_one_span(spark, tmp_path_factory):
    # doc 6 shares tokens 1-8 with doc 7 and tokens 9-16 with doc 8;
    # the duplicated gram positions are 1 and 9 (gap == K) -> the two
    # runs are contiguous in doc 6 and must merge into ONE 16-token span.
    left = " ".join(f"l{i}" for i in range(8))
    right = " ".join(f"r{i}" for i in range(8))
    rows = [
        Row(doc_id=6, text=f"{left} {right}", lang="en", source="a"),
        Row(doc_id=7, text=f"pad tokens {left} tail words", lang="en", source="a"),
        Row(doc_id=8, text=f"{right} closing filler words", lang="en", source="a"),
    ]
    path = _docs(spark, rows, str(tmp_path_factory.mktemp("span_merge")))
    got = {r["doc_id"]: r for r in sd.duplicate_spans(spark, path).collect()}
    assert got[6]["n_spans"] == 1
    assert got[6]["dup_tokens"] == 16
    assert got[6]["longest_span"] == 16


def test_savings_rollup(spark, corpus_dir):
    got = {r["source"]: r for r in sd.span_dedup_savings(spark, corpus_dir).collect()}
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert a["n_docs"] == 2 and a["docs_with_dup_spans"] == 2
    assert a["total_tokens"] == 23 + 24  # doc0: 20+3, doc1: 20+4
    assert a["dup_tokens"] == 40
    assert a["dup_token_frac"] == pytest.approx(40 / 47)
    c = got["c"]
    assert c["docs_with_dup_spans"] == 0 and c["dup_tokens"] == 0


def test_hot_gram_cap_drops_boilerplate(spark, tmp_path_factory, monkeypatch):
    # With the cap forced to 2, a gram occurring at 3 corpus positions
    # is boilerplate and produces no spans.
    rows = [
        Row(doc_id=10, text=f"{SHARED8} ending words here", lang="en", source="a"),
        Row(doc_id=11, text=f"{SHARED8} other trailing text", lang="en", source="a"),
        Row(doc_id=12, text=f"{SHARED8} third copy tokens", lang="en", source="a"),
    ]
    path = _docs(spark, rows, str(tmp_path_factory.mktemp("span_cap")))
    assert sd.duplicate_spans(spark, path).count() == 3  # sanity: cap not binding
    monkeypatch.setattr(sd, "MAX_SPAN_GRAM_POSTINGS", 2)
    assert sd.duplicate_spans(spark, path).count() == 0


def test_removal_plan_keeps_owner_copy(spark, corpus_dir):
    got = {r["doc_id"]: r for r in sd.span_removal_plan(spark, corpus_dir).collect()}
    # ownership = lowest doc_id sharing the gram: doc0 and doc2 are
    # owners and must NOT appear; doc1 and doc3 get cut
    assert set(got) == {1, 3}
    assert got[1]["tokens_removed"] == 20 and got[1]["n_cut_spans"] == 1
    assert got[1]["n_tokens"] == 24
    assert got[1]["removed_frac"] == pytest.approx(20 / 24)
    assert got[3]["tokens_removed"] == 8


def test_span_source_matrix_counts_cross_source_grams(spark, tmp_path_factory):
    rows = [
        Row(doc_id=20, text=f"{SHARED20} from feed one", lang="en", source="feedA"),
        Row(doc_id=21, text=f"copying {SHARED20} verbatim", lang="en", source="feedB"),
        Row(doc_id=22, text=f"{SHARED8} only here", lang="en", source="feedC"),
        Row(doc_id=23, text=f"also {SHARED8} appears", lang="en", source="feedC"),
    ]
    path = _docs(spark, rows, str(tmp_path_factory.mktemp("span_matrix")))
    got = {
        (r["source_a"], r["source_b"]): r["shared_grams"]
        for r in sd.span_source_matrix(spark, path).collect()
    }
    # 20 shared tokens -> 13 duplicated 8-gram starts shared A<->B;
    # the C<->C pair is same-source and must NOT appear
    assert got == {("feedA", "feedB"): 13}


def test_apply_span_removal_cuts_non_owner_copies(spark, corpus_dir):
    from data_engineering_challenge_spark.catalog import load_table

    docs = load_table(spark, corpus_dir, "documents")
    got = {r["doc_id"]: r for r in sd.apply_span_removal(docs).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}, "every doc passes through"
    # doc 0 owns SHARED20 (lowest doc_id) — byte-identical passthrough
    assert got[0]["tokens_removed"] == 0
    assert got[0]["text"] == f"{SHARED20} unique tail zero"
    # doc 1 loses the 20 shared tokens, keeps its unique lead/tail
    assert got[1]["tokens_removed"] == 20
    assert got[1]["text"] == "lead one and more"
    assert got[1]["n_tokens_after"] == got[1]["n_tokens"] - 20
    # doc 2 owns SHARED8 — untouched; doc 3 loses its copy
    assert got[2]["tokens_removed"] == 0
    assert got[3]["tokens_removed"] == 8
    assert got[3]["text"] == "opener tokens closer"
    # within-doc-only repetition and short docs are never cut
    assert got[4]["tokens_removed"] == 0 and got[5]["tokens_removed"] == 0


def test_span_rewrite_residual_invariant(spark, corpus_dir):
    # Lee et al. invariant: after the rewrite, a second removable-span
    # pass finds nothing — every duplicated gram sits only in its owner.
    row = sd.span_rewrite_residual(spark, corpus_dir).collect()[0]
    assert (row["residual_docs"], row["residual_spans"], row["residual_tokens"]) == (
        0,
        0,
        0,
    )


def test_apply_span_removal_fully_cut_doc_becomes_empty(spark, tmp_path_factory):
    from data_engineering_challenge_spark.catalog import load_table

    # doc 11 is EXACTLY the shared block: the rewrite deletes every token
    rows = [
        Row(doc_id=10, text=f"{SHARED20} owner extra", lang="en", source="a"),
        Row(doc_id=11, text=SHARED20, lang="en", source="b"),
    ]
    d = _docs(spark, rows, str(tmp_path_factory.mktemp("span_fullcut")))
    docs = load_table(spark, d, "documents")
    got = {r["doc_id"]: r for r in sd.apply_span_removal(docs).collect()}
    assert got[11]["text"] == "" and got[11]["n_tokens_after"] == 0
    assert got[10]["tokens_removed"] == 0
    row = sd.span_rewrite_residual(spark, d).collect()[0]
    assert row["residual_spans"] == 0
