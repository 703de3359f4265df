"""Table-maintenance sinks: Z-order clustering and small-file
compaction — the operational half of keeping a 100-TB parquet
warehouse fast.

Z-ORDER. Partition pruning handles ONE dimension (the partition key);
queries filtering on other columns still touch every file unless the
row-group/file min-max stats are tight. Sorting by a single column
gives tight stats on that column only. Interleaving the bit
representations of several columns (a Z-/Morton curve) and
range-partitioning + sorting by that key gives *simultaneously* narrow
min-max footprints on every participating column, so the parquet
reader's stats-based skipping works for filters on any of them.
(Same mechanism Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is
plain Spark: rank-normalize -> interleave bits -> repartitionByRange +
sortWithinPartitions.)

COMPACTION. Streaming ingests and fine-grained partitions accumulate
files far below the ideal scan unit; at 100 TB a million 1-MB files
mean a million task launches and footer reads per query. Compaction
rewrites a directory to ceil(bytes / target) files. Metadata-only
planning: the file count comes from the filesystem listing, never from
counting rows.
"""

from __future__ import annotations

import math
import os
from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16  # per-column resolution: 65536 rank buckets


def zorder_key(cols: list[Column | str], bits: int = Z_BITS) -> Column:
    """Morton-interleave N bucket-key columns into one long.

    Callers pass columns already scaled to [0, 2^bits) — see
    :func:`write_zordered`, which min-max scales with one tiny agg
    (rank-normalizing instead would cost a global sort per column).
    Bit i of column j lands at position i * n_cols + j, so every
    column contributes equally at every granularity of the curve.
    Pure Column expressions: the key is computed JVM-side inside
    whole-stage codegen.
    """
    ncols = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(ncols)
    parts = []
    for j, c in enumerate(ncols):
        for i in range(bits):
            # (c >> i & 1) << (i*n + j)
            parts.append(
                F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + j)
            )
    return reduce(add, parts).alias("_zkey")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = Z_BITS,
    mode: str = "overwrite",
) -> None:
    """Write `df` clustered on the Z-curve of `cols`.

    Each column is min-max scaled to [0, 2^bits) with ONE small
    aggregate (two scans total: bounds + write), interleaved into a
    Morton key, then range-partitioned and sorted by it. Every written
    file covers a compact hyper-rectangle of the value space, so
    min-max stats prune files for predicates on ANY of `cols`.
    """
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * (top + 1)),
            ).cast("long")
        )
    keyed = df.withColumn("_zkey", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite `src_dir` into ceil(total_bytes / target) files; returns
    the output file count. Planning is metadata-only (directory
    listing); the single data pass is the rewrite itself."""
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    # coalesce, not repartition: narrowing to n_out needs no shuffle
    df.coalesce(n_out).write.mode("overwrite").parquet(dst_dir)
    return n_out
