"""Declarative end-to-end pipeline runner: one config dict drives
source → clean → validate → dedup → split → sink.

The reference's orchestration is a hard-coded two-table loader
(src/etl/ingest/data_loader.py + src/db/pipeline.py:264-309 — per-file
options, ordered loads, stats dict). This generalizes it to the
pipeline a training-data team actually runs, while staying declarative
so every stage remains a Catalyst-planned DataFrame transform — the
config picks WHAT runs; Spark still decides HOW.

Config schema (all stages optional except source/sink):

    {
      "source":   {"format": "parquet"|"csv"|"synthetic", ...},
      "clean":    {"table": "transactions"},        # schema registry key
      "validate": {"table": "transactions",         # regex contracts
                   "max_invalid_fraction": 0.05},   # fail gate
      "dedup":    {"keys": ["col", ...]},           # exact, keyed
      "span_dedup": true,                           # exact-span rewrite
      "quality_filter": {"min_score": 0.5},         # trained probe
      "split":    {"column": "split", "key": "id"}, # stable 8/1/1
      "sink":     {"mode": "plain"|"partitioned"|"zorder",
                   "path": ..., ...},
    }

A config with a top-level "incremental" key instead runs the nightly
index lifecycle (delta-probe → fold → vacuum) — see _run_incremental.

Every stage reports into the returned stats dict (rows in/out, invalid
counts, output files) — the reference's load-stats surface, widened.

Scale notes: stages compose lazily; the only materializations are the
stats counts the caller asked for. Exact dedup is a hash shuffle on
the key columns; the split is a content-hash expression (no shuffle);
sinks inherit the partitioned/Z-order write paths' properties.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas
from .operators.validation import invalid_row_mask, per_column_invalid_counts
from .sinks.maintenance import write_zordered
from .sinks.writers import write_partitioned_parquet
from .sources.csv import ingest_csv_files
from .sources.synthetic import SyntheticDocsDataSource

_TABLES = {
    "transactions": (schemas.TRANSACTIONS_SCHEMA, schemas.TRANSACTIONS_PATTERNS),
    "products": (schemas.PRODUCT_SCHEMA, schemas.PRODUCT_PATTERNS),
}


def _read(spark: SparkSession, cfg: dict[str, Any]) -> DataFrame:
    fmt = cfg["format"]
    if fmt == "parquet":
        return spark.read.parquet(cfg["path"])
    if fmt == "csv":
        schema, _ = _TABLES[cfg["table"]]
        return ingest_csv_files(
            spark,
            cfg["paths"],
            schema,
            sep=cfg.get("sep", "|"),
            add_surrogate_key=cfg.get("surrogate_key"),
        )
    if fmt == "synthetic":
        spark.dataSource.register(SyntheticDocsDataSource)
        reader = spark.read.format("synthetic_docs")
        for k in ("n_docs", "n_partitions"):
            if k in cfg:
                reader = reader.option(k, cfg[k])
        return reader.load()
    raise ValueError(f"unknown source format: {fmt}")


def _stable_split(df: DataFrame, key: str, out_col: str) -> DataFrame:
    """Deterministic 8/1/1 train/val/test split by content hash of the
    key column — engine- and partitioning-stable, unlike seeded
    sample()."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(key).cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    split = F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    return df.withColumn(out_col, split)


def _run_incremental(spark: SparkSession, cfg: dict[str, Any]) -> dict[str, Any]:
    """The nightly incremental lifecycle as ONE declarative stage:
    for each configured index kind, probe the delta batch against the
    FROZEN index snapshot, persist the probe report, fold the delta
    into snapshot v+1 (idempotent — re-running a night replaces the
    delta rows instead of double-counting), then vacuum old versions.

    Config:
        {"incremental": {
            "sf_dir": "...",                  # corpus + delta source
            "indexes": ["span", "minhash"],   # which index families
            "probe_out": "...",               # probe reports land here
            "vacuum_keep": 2                  # snapshot retention
        }}

    Scale: probe cost is O(delta) tokenization + a distinct-gram /
    signature index scan per family (never O(corpus)); fold appends
    delta-sized rows; vacuum is metadata-first then parallel deletes.
    """
    import os

    from .operators import span_dedup as sd
    from .operators.dedup import (
        INCR_DELTA_FROM,
        _incr_bucket,
        build_minhash_index,
        extend_minhash_index,
        incremental_dedup,
        minhash_index_dir,
    )
    from .sinks.versioned import history, vacuum_snapshots

    sf_dir = cfg["sf_dir"]
    keep = cfg.get("vacuum_keep", 2)
    stats: dict[str, Any] = {}
    for kind in cfg.get("indexes", ("span", "minhash")):
        if kind == "span":
            table_dir = sd.span_index_dir(sf_dir)
            if not os.path.exists(os.path.join(table_dir, "manifest.json")):
                sd.build_span_index(spark, sf_dir, table_dir)
            d = spread_scan_docs(spark, sf_dir)
            delta = d.filter(_incr_bucket(F.col("doc_id")) >= INCR_DELTA_FROM)
            probe = sd.incremental_span_probe(spark, table_dir, delta)
            fold = lambda: sd.extend_span_index(spark, sf_dir, table_dir)  # noqa: E731
        elif kind == "minhash":
            table_dir = minhash_index_dir(sf_dir)
            if not os.path.exists(os.path.join(table_dir, "manifest.json")):
                build_minhash_index(spark, sf_dir, table_dir)
            probe = incremental_dedup(spark, sf_dir)
            fold = lambda: extend_minhash_index(spark, sf_dir, table_dir)  # noqa: E731
        elif kind == "quality":
            from .operators.quality_probe import (
                build_quality_moments,
                extend_quality_moments,
                incremental_quality_weights,
                quality_moments_dir,
            )

            table_dir = quality_moments_dir(sf_dir)
            if not os.path.exists(os.path.join(table_dir, "manifest.json")):
                build_quality_moments(spark, sf_dir, table_dir)
            # probe = the refreshed model (frozen corpus moments + fresh
            # delta moments — bit-identical to a full retrain)
            probe = incremental_quality_weights(spark, sf_dir)
            fold = lambda: extend_quality_moments(spark, sf_dir, table_dir)  # noqa: E731
        elif kind == "lm":
            from .operators.lm import (
                build_lm_corpus_counts,
                extend_lm_counts,
                incremental_lm_score,
                lm_counts_dir,
            )

            table_dir = lm_counts_dir(sf_dir)
            if not os.path.exists(os.path.join(table_dir, "manifest.json")):
                build_lm_corpus_counts(spark, sf_dir, table_dir)
            # probe = the refreshed LM rollup (frozen corpus counts +
            # fresh delta counts — bit-identical to a full retrain)
            probe = incremental_lm_score(spark, sf_dir)
            fold = lambda: extend_lm_counts(spark, sf_dir, table_dir)  # noqa: E731
        elif kind == "phash":
            from .operators.multimodal import (
                build_phash_index,
                extend_phash_index,
                incremental_phash_pairs,
                phash_index_dir,
            )

            table_dir = phash_index_dir(sf_dir)
            if not os.path.exists(os.path.join(table_dir, "manifest.json")):
                build_phash_index(spark, sf_dir, table_dir)
            probe = incremental_phash_pairs(spark, sf_dir)
            fold = lambda: extend_phash_index(spark, sf_dir, table_dir)  # noqa: E731
        elif kind == "wavhash":
            from .operators.multimodal import (
                build_wavhash_index,
                extend_wavhash_index,
                incremental_wavhash_pairs,
                wavhash_index_dir,
            )

            table_dir = wavhash_index_dir(sf_dir)
            if not os.path.exists(os.path.join(table_dir, "manifest.json")):
                build_wavhash_index(spark, sf_dir, table_dir)
            probe = incremental_wavhash_pairs(spark, sf_dir)
            fold = lambda: extend_wavhash_index(spark, sf_dir, table_dir)  # noqa: E731
        else:
            raise ValueError(f"unknown incremental index kind: {kind}")
        out_path = os.path.join(cfg["probe_out"], kind)
        probe.write.mode("overwrite").parquet(out_path)
        probe_rows = spark.read.parquet(out_path).count()
        version = fold()
        vacuumed = vacuum_snapshots(table_dir, keep_last=keep)
        stats[kind] = {
            "probe_rows": probe_rows,
            "probe_path": out_path,
            "index_version": version,
            "vacuumed_versions": vacuumed,
            "versions_retained": history(table_dir)["versions"],
        }
    return stats


def spread_scan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .catalog import load_table, spread_scan

    return spread_scan(load_table(spark, sf_dir, "documents"), spark, "doc_id")


def run_pipeline(spark: SparkSession, config: dict[str, Any]) -> dict[str, Any]:
    """Execute the configured pipeline; returns per-stage stats."""
    if "incremental" in config:
        return _run_incremental(spark, config["incremental"])
    stats: dict[str, Any] = {}
    df = _read(spark, config["source"])
    stats["rows_in"] = df.count()

    v = config.get("validate")
    if v:
        _, patterns = _TABLES[v["table"]]
        row = per_column_invalid_counts(df, patterns).collect()[0]
        stats["invalid_counts"] = {
            c.removesuffix("__invalid_count"): row[c] for c in row.asDict()
        }
        bad = df.filter(invalid_row_mask(patterns)).count()
        stats["invalid_rows"] = bad
        gate = v.get("max_invalid_fraction")
        if gate is not None and stats["rows_in"] > 0:
            frac = bad / stats["rows_in"]
            stats["invalid_fraction"] = frac
            if frac > gate:
                raise ValueError(
                    f"validation gate failed: {frac:.4f} invalid > {gate}"
                )
        if v.get("drop_invalid"):
            df = df.filter(~invalid_row_mask(patterns))

    d = config.get("dedup")
    if d:
        df = df.dropDuplicates(d["keys"])

    sd = config.get("span_dedup")
    if sd:
        # exact-span rewrite (Lee et al. ExactSubstr) as a corpus
        # stage: cut every non-owner duplicated span, keep the doc,
        # thread the cleaned text back into the pipeline frame.
        # Requires the corpus shape (doc_id, source, text).
        from .operators.span_dedup import apply_span_removal

        rewritten = apply_span_removal(df.select("doc_id", "source", "text"))
        cut = rewritten.agg(
            F.coalesce(F.sum("tokens_removed"), F.lit(0)).alias("t"),
            F.count(F.when(F.col("tokens_removed") > 0, True)).alias("d"),
        ).collect()[0]
        stats["span_tokens_removed"] = cut["t"]
        stats["span_docs_cut"] = cut["d"]
        df = df.drop("text").join(rewritten.select("doc_id", "text"), "doc_id")
        if "n_chars" in df.columns:  # keep derived length consistent
            df = df.withColumn("n_chars", F.length("text").cast("long"))

    q = config.get("quality_filter")
    if q:
        # trained-probe corpus filter (the CCNet/DCLM stage): fit the
        # ridge probe on this frame's labels, score every doc with the
        # frozen weights, keep docs at or above the threshold.
        from .operators.quality_probe import (
            SCORE_THRESHOLD,
            _spark_features,
            _spark_score,
            train_quality_probe,
        )

        w = train_quality_probe(_spark_features(df))
        thr = q.get("min_score", SCORE_THRESHOLD)
        kept_ids = (
            _spark_score(_spark_features(df), w)
            .filter(F.col("score") >= thr)
            .select("doc_id")
        )
        before = df.count()
        df = df.join(kept_ids, "doc_id", "semi")
        stats["quality_weights"] = w
        stats["quality_dropped"] = before - df.count()

    s = config.get("split")
    if s:
        df = _stable_split(df, s["key"], s.get("column", "split"))

    sink = config["sink"]
    mode = sink.get("mode", "plain")
    if mode == "partitioned":
        write_partitioned_parquet(df, sink["path"], sink["partition_col"])
    elif mode == "zorder":
        write_zordered(df, sink["path"], sink["cols"], n_files=sink.get("n_files", 8))
    elif mode == "plain":
        df.write.mode("overwrite").parquet(sink["path"])
    else:
        raise ValueError(f"unknown sink mode: {mode}")

    out = spark.read.parquet(sink["path"])
    stats["rows_out"] = out.count()
    if s:
        stats["split_counts"] = {
            r[s.get("column", "split")]: r["count"]
            for r in out.groupBy(s.get("column", "split")).count().collect()
        }
    return stats
