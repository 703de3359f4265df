"""Z-order clustering and compaction: the data-skipping and
small-files maintenance ops, validated on real parquet footers."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from data_engineering_challenge_spark.catalog import load_table
from data_engineering_challenge_spark.sinks.maintenance import (
    compact_parquet,
    write_zordered,
)


def _file_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Mean (max-min) per file for each column, from footer stats only."""
    spans: dict[str, list[float]] = {c: [] for c in cols}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    mins[name] = min(mins.get(name, st.min), st.min)
                    maxs[name] = max(maxs.get(name, st.max), st.max)
        for c in cols:
            if c in mins:
                spans[c].append(maxs[c] - mins[c])
    return {c: sum(v) / len(v) for c, v in spans.items()}


def test_zorder_narrows_footprints_on_all_dims(spark, sf_dir, tmp_path):
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    cols = ["l_partkey", "l_suppkey"]
    gmin = l.agg(*[F.min(c).alias(c) for c in cols]).collect()[0]
    gmax = l.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
    grange = {c: float(gmax[c] - gmin[c]) for c in cols}

    z_path = str(tmp_path / "z")
    naive_path = str(tmp_path / "naive")
    write_zordered(l, z_path, cols, n_files=8)
    # naive comparison: sorted by the FIRST column only
    l.repartitionByRange(8, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.parquet(naive_path)

    z = _file_spans(z_path, cols)
    naive = _file_spans(naive_path, cols)

    # Z-order: BOTH dimensions materially narrower than the full range
    assert z["l_partkey"] < 0.75 * grange["l_partkey"]
    assert z["l_suppkey"] < 0.75 * grange["l_suppkey"]
    # single-column sort leaves the second dimension unskippable
    assert naive["l_suppkey"] > 0.9 * grange["l_suppkey"]
    # and Z-order must beat it on that dimension by a wide margin
    assert z["l_suppkey"] < 0.5 * naive["l_suppkey"]

    # clustering must not lose rows
    assert spark.read.parquet(z_path).count() == l.count()


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    l = load_table(spark, sf_dir, "lineitem")
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    l.repartition(64).write.parquet(src)
    n_src_files = len(glob.glob(os.path.join(src, "*.parquet")))
    assert n_src_files >= 32  # genuinely fragmented

    n_out = compact_parquet(spark, src, dst, target_file_bytes=256 * 1024 * 1024)
    n_dst_files = len(glob.glob(os.path.join(dst, "*.parquet")))
    assert n_dst_files == n_out
    assert n_dst_files < n_src_files / 4
    assert spark.read.parquet(dst).count() == l.count()
