"""Planted-count semantics for the count-min heavy-hitter audit
(`operators/sketches.py:cms_frequency_check`)."""

from __future__ import annotations

import os

from pyspark.sql import Row

from data_engineering_challenge_spark.operators.sketches import cms_frequency_check


def test_cms_top_tokens_exact_and_bounded(spark, tmp_path_factory):
    # token counts by construction: alpha 12, beta 7, gamma 3, delta 1
    rows = [
        Row(doc_id=0, text=" ".join(["alpha"] * 8 + ["beta"] * 3), lang="en", source="a"),
        Row(doc_id=1, text=" ".join(["alpha"] * 4 + ["beta"] * 4 + ["gamma"] * 3), lang="en", source="a"),
        Row(doc_id=2, text="delta", lang="en", source="a"),
    ]
    df = spark.createDataFrame(rows).selectExpr(
        "CAST(doc_id AS BIGINT) doc_id", "text", "lang", "source",
        "CAST(length(text) AS BIGINT) n_chars",
    )
    path = str(tmp_path_factory.mktemp("cms"))
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))

    got = cms_frequency_check(spark, path).collect()
    assert [(r["token"], r["exact_count"]) for r in got] == [
        ("alpha", 12),
        ("beta", 7),
        ("gamma", 3),
        ("delta", 1),
    ]
    assert all(r["cms_ok"] for r in got), "CMS estimate outside the eps*N bound"
