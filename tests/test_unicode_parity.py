"""Adversarial-Unicode oracle parity for the text/dedup surface.

The driver testdata is ASCII, so the per-query oracle gate never
exercises Unicode edge cases. This fixture plants NBSP, ideographic
space, emoji (supplementary planes), combining marks, RTL, BOM,
control chars, and whitespace-only documents, and requires the same
engine-vs-DuckDB hash parity the driver checks. This caught a real
divergence: DuckDB's trim() strips Unicode whitespace while Spark's
ASCII-only trim does not — normalization now collapses an explicit
shared Unicode-whitespace class on both sides (functions/text.py).
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_challenge_spark import registry, testing

NASTY = [
    "", " ", "   \t\t  ", "hello world", "HeLLo\tWORLD\r\nagain",
    "café naïve über", " nbsp separated ",
    "emoji \U0001F600 mix \U0001F680\U0001F680", "é combining",
    "ZALGO źàl̂g̃ō", "中文　文本 处理",
    "tab\there", "a" * 500, ("word " * 200).strip(), "Mixed \t 　spaces",
    "quote's \"and\" |pipes|", "null\x01control\x02chars",
    "رسالة rtl text", "ssß sharp", "﻿bom-start",
    "trail-space ", " lead-space", " line sep", " 　",
]

TEXT_QUERIES = [
    "token_counts", "doc_quality", "doc_fingerprint", "lang_id",
    "clean_corpus", "exact_dedup", "tfidf_top_terms", "doc_sentences",
    "bpe_token_counts", "stable_split", "ngram_jaccard_pairs",
    "simhash_pairs", "dedup_clusters",
    # round 7
    "bpe_learn", "vocab_coverage_audit", "dedup_retention_plan",
    "minhash_lsh_pairs", "dedup_source_matrix",
    # round 8
    "duplicate_spans", "span_dedup_savings", "span_removal_plan",
    "incremental_duplicate_spans", "cms_frequency_check",
    "source_token_drift", "bpe_apply",
]


@pytest.fixture(scope="module")
def nasty_sf_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("nasty_sf")
    docs = NASTY * 3  # replicas -> exact-dup groups for the dedup paths
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["x"] * len(docs)),
                "n_chars": pa.array([len(d) for d in docs], type=pa.int64()),
            }
        ),
        str(root / "documents.parquet"),
    )
    return str(root)


@pytest.fixture(scope="module")
def nasty_con(nasty_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(nasty_sf_dir, 'documents.parquet')}'"
    )
    return con


@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_unicode_oracle_parity(spark, nasty_sf_dir, nasty_con, name):
    spec = registry.all_queries()[name]
    sdf = spec.fn(spark, nasty_sf_dir)
    d_cols, d_rows = testing.run_oracle(nasty_con, spec.oracle)
    ok, detail = testing.compare(
        sdf.columns, [tuple(r) for r in sdf.collect()], d_cols, d_rows
    )
    assert ok, f"{name}: {detail}"
