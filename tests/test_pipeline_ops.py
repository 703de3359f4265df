"""Planted-fixture semantics for the training-pipeline operators
(`operators/pipeline_ops.py`).

The synthetic sf corpora are PII-free and contamination arises only
from the generator's planted near-dups, so the oracle-parity sweep
alone can't pin these operators' *semantics*. Here a hand-built
corpus plants one of each phenomenon and asserts the exact expected
output; engine↔oracle pattern parity for the PII regexes is checked
against DuckDB on the same planted strings.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import pytest
from pyspark.sql import Row

from data_engineering_challenge_spark.operators import pipeline_ops as po


def _bucket(doc_id: int, n: int = 10, salt: str = "") -> int:
    h = hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8]
    return int(h, 16) % n


def _split(doc_id: int) -> str:
    b = _bucket(doc_id)
    return "train" if b < 8 else ("val" if b == 8 else "test")


def _ids_by_split(want: str, count: int, start: int = 0) -> list[int]:
    out = []
    i = start
    while len(out) < count:
        if _split(i) == want:
            out.append(i)
        i += 1
    return out


SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory) -> str:
    train_ids = _ids_by_split("train", 2)
    test_ids = _ids_by_split("test", 2)
    rows = [
        # contaminated pair: test doc shares an 8-gram run with a train doc
        Row(doc_id=train_ids[0], text=f"intro words here {SHARED} trailing content", lang="en", source="s"),
        Row(doc_id=test_ids[0], text=f"other opening {SHARED} different tail tokens", lang="fr", source="s"),
        # clean docs: disjoint vocab, no shared 8-grams
        Row(doc_id=train_ids[1], text="one two three four five six seven eight nine ten", lang="en", source="s"),
        Row(doc_id=test_ids[1], text="uno dos tres cuatro cinco seis siete ocho nueve", lang="zh", source="s"),
        # PII doc
        Row(doc_id=100, text="reach me at alice@example.com or (415) 555-1234 thanks", lang="en", source="s"),
        # pure repetition doc
        Row(doc_id=101, text="rep rep rep rep rep", lang="de", source="s"),
    ]
    df = spark.createDataFrame(rows).selectExpr(
        "CAST(doc_id AS BIGINT) doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) n_chars",
    )
    path = str(tmp_path_factory.mktemp("pipeline_ops"))
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    return path


def test_decontaminate_finds_planted_leak_only(spark, corpus_dir):
    train_ids = _ids_by_split("train", 2)
    test_ids = _ids_by_split("test", 2)
    got = {r["test_doc"]: r for r in po.decontaminate_split(spark, corpus_dir).collect()}
    assert set(got) == {test_ids[0]}, "only the planted leak should surface"
    assert got[test_ids[0]]["n_train_docs"] == 1
    # 8 shared tokens -> exactly one shared 8-gram
    assert got[test_ids[0]]["n_shared_grams"] == 1
    assert train_ids[1] not in got  # clean train doc never implicated


def test_pii_scrub_counts_and_fingerprint(spark, corpus_dir):
    got = {r["doc_id"]: r for r in po.pii_scrub(spark, corpus_dir).collect()}
    assert got[100]["n_emails"] == 1
    assert got[100]["n_phones"] == 1
    scrubbed = "reach me at <EMAIL> or (<PHONE> thanks"
    assert got[100]["scrub_fp"] == hashlib.md5(scrubbed.encode()).hexdigest()
    # non-PII docs untouched: fingerprint equals raw-text md5
    assert got[101]["scrub_fp"] == hashlib.md5(b"rep rep rep rep rep").hexdigest()
    assert got[101]["n_emails"] == 0 and got[101]["n_phones"] == 0


def test_pii_patterns_agree_across_engines():
    """The PII regexes must behave identically in Java regex (Spark)
    and RE2 (DuckDB) on adversarial spans."""
    samples = [
        "reach me at alice@example.com or (415) 555-1234 thanks",
        "a.b+c_d%e@sub.domain.co uk 12 34",
        "no pii at all",
        "digits 123456789 and short 12-34",
        "double dot jane@x..com edge",
    ]
    con = duckdb.connect()
    for s in samples:
        (d_scrub,) = con.execute(
            "SELECT regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'), ?, '<PHONE>', 'g')",
            [s, po.PII_EMAIL, po.PII_PHONE],
        ).fetchone()
        import re

        j_scrub = re.sub(po.PII_PHONE, "<PHONE>", re.sub(po.PII_EMAIL, "<EMAIL>", s))
        assert d_scrub == j_scrub, f"dialect divergence on {s!r}"


def test_repetition_profile_planted_values(spark, corpus_dir):
    got = {r["doc_id"]: r for r in po.repetition_profile(spark, corpus_dir).collect()}
    rep = got[101]
    assert rep["n_tokens"] == 5
    assert rep["top_token_frac"] == 1.0
    assert rep["dup_2gram_frac"] == 1.0 - 1.0 / 4.0  # 4 bigrams, 1 distinct
    # the varied-vocab doc is not repetitive
    clean = got[_ids_by_split("train", 2)[1]]
    assert clean["top_token_frac"] == pytest.approx(0.1)
    assert clean["dup_2gram_frac"] == 0.0


def test_sample_mixture_matches_python_hash(spark, corpus_dir):
    rows = {r["lang"]: r for r in po.sample_mixture(spark, corpus_dir).collect()}
    # recompute expected keeps doc-by-doc with the same md5 threshold
    docs = {
        "en": [_ids_by_split("train", 2)[0], _ids_by_split("train", 2)[1], 100],
        "fr": [_ids_by_split("test", 2)[0]],
        "zh": [_ids_by_split("test", 2)[1]],
        "de": [101],
    }
    rates = {"en": 40, "zh": 80}
    for lang, ids in docs.items():
        keep = rates.get(lang, 100)
        expected = sum(1 for i in ids if _bucket(i, 100, "mix:") < keep)
        assert rows[lang]["n_total"] == len(ids)
        assert rows[lang]["n_kept"] == expected, lang


def test_pack_sequences_conservation(spark, sf_dir):
    """Packing invariants: token totals conserve per source, seq_ids
    are contiguous from 0, and every sequence's first-token offset
    respects the budget boundary definition."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.catalog import load_table
    from data_engineering_challenge_spark.functions.text import tokens

    rows = po.pack_sequences(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    totals = {
        r["source"]: r["tot"]
        for r in d.select("source", F.size(tokens(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("tot"))
        .collect()
    }
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert set(by_source) == set(totals)
    for src, rs in by_source.items():
        assert sum(r["seq_tokens"] for r in rs) == totals[src]
        ids = sorted(r["seq_id"] for r in rs)
        assert ids == list(range(len(ids))), f"{src}: non-contiguous {ids[:5]}"


def test_semantic_dedup_keeps_minimum_per_dup_group(spark, sf_dir):
    """Every cell keeps at least its lowest vec_id, and kept+dropped
    partitions the corpus."""
    rows = po_sem = None
    from data_engineering_challenge_spark.operators.similarity import semantic_dedup

    rows = semantic_dedup(spark, sf_dir).collect()
    from data_engineering_challenge_spark.catalog import load_table

    assert len(rows) == load_table(spark, sf_dir, "embeddings").count()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        lowest = min(r["vec_id"] for r in rs)
        assert any(r["vec_id"] == lowest and r["is_kept"] for r in rs), cell


def test_dedup_savings_conservation(spark, sf_dir):
    """Histogram invariants on the real corpus: doc counts conserve,
    singleton clusters drop zero bytes, multi-doc clusters drop > 0."""
    rows = po.dedup_savings(spark, sf_dir).collect()
    from data_engineering_challenge_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        if r["cluster_size"] == 1:
            assert r["chars_dropped"] == 0
