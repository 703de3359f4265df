"""Messy-CSV ingestion kit (reference SURVEY.md §2.1 S1-S2, §3.2).

Re-expresses `ingest_csv_polars` (src/db/pipeline.py:197-262) +
`ingest_from_paths_polars` (:264-309) Spark-first:

- executor-parallel `spark.read.csv` with explicit separator/header,
- everything lands as *string* first, then a deterministic cleaning
  pass applies multi-token null normalization, EU-decimal parsing,
  date parsing, and boolean parsing per the target schema — Spark CSV
  has a single `nullValue`, so read-then-normalize is the correct kit
  (SURVEY.md §7.3),
- lowercase column normalization (src/db/pipeline.py:237-241),
- schema-drift-tolerant union (`unionByName(allowMissingColumns=True)`
  ↔ `pl.concat(how='diagonal_relaxed')`, notebook cell 26; the
  `Numero_TPV` drift case, transactions_profile_report.json:220),
- target-schema alignment: drop extras, add missing as nulls, reorder
  (src/db/pipeline.py:243-260).

At scale: the CSV scan parallelizes per file-split; the cleaning pass
is pure column expressions inside whole-stage codegen — zero UDFs,
zero extra passes over the data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cleaning import (
    NULL_TOKENS,
    normalize_null_tokens,
    parse_bool,
    parse_date,
    parse_decimal_comma,
)


def read_csv_raw(
    spark: SparkSession,
    path: str,
    sep: str = "|",
    encoding: str = "UTF-8",
) -> DataFrame:
    """Permissive all-string read; cleaning happens as column ops."""
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def normalize_columns(df: DataFrame) -> DataFrame:
    """Lowercase + strip + underscore column names (reference
    src/db/pipeline.py:237-241; notebook cell 36 step 5)."""
    return df.toDF(*[c.strip().lower().replace(" ", "_") for c in df.columns])


def clean_to_schema(
    df: DataFrame,
    schema: T.StructType,
    null_tokens: tuple[str, ...] = NULL_TOKENS,
    date_fmt: str = "yyyy-MM-dd",
) -> DataFrame:
    """Apply the full cleaning kit and align to the target schema:
    null tokens → NULL, typed parses (date / decimal-comma / bool /
    int), add missing columns as typed nulls, drop extras, reorder.

    The single-select plan keeps every expression in one projection —
    Catalyst collapses it with the scan."""
    present = set(df.columns)
    cols = []
    for field in schema.fields:
        name, dtype = field.name, field.dataType
        if name not in present:
            cols.append(F.lit(None).cast(dtype).alias(name))
            continue
        raw = normalize_null_tokens(F.col(name), null_tokens)
        if isinstance(dtype, T.DateType):
            expr = parse_date(raw, date_fmt)
        elif isinstance(dtype, T.DecimalType):
            expr = parse_decimal_comma(raw, dtype.simpleString())
        elif isinstance(dtype, T.BooleanType):
            expr = parse_bool(raw)
        elif isinstance(dtype, (T.LongType, T.IntegerType, T.DoubleType)):
            # try_cast, not cast: ANSI mode (Spark 4 default) makes a
            # plain cast throw on the first garbage value — the kit's
            # contract is garbage → NULL, audited by the validation layer
            expr = raw.try_cast(dtype)
        else:
            expr = raw.try_cast(dtype)
        cols.append(expr.alias(name))
    return df.select(*cols)


def union_with_drift(dfs: list[DataFrame]) -> DataFrame:
    """Missing-column-tolerant union (reference diagonal_relaxed concat)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def ingest_csv_files(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType,
    sep: str = "|",
    null_tokens: tuple[str, ...] = NULL_TOKENS,
    add_surrogate_key: str | None = None,
) -> DataFrame:
    """Multi-file orchestrated load (reference ingest_from_paths_polars,
    src/db/pipeline.py:264-309): read each file → normalize names →
    drift-union → clean/align to schema → optional surrogate key.

    The surrogate key replaces the reference's BIGSERIAL
    (src/db/sql/schema.sql:10, needed because raw rows are not unique,
    README.md:192): `monotonically_increasing_id` is the scalable
    choice — unique, non-contiguous, no global coordination (a
    row_number over a global window would serialize the whole dataset
    through one partition).
    """
    frames = [normalize_columns(read_csv_raw(spark, p, sep=sep)) for p in paths]
    unioned = union_with_drift(frames)
    cleaned = clean_to_schema(unioned, schema, null_tokens)
    if add_surrogate_key:
        cleaned = cleaned.select(
            F.monotonically_increasing_id().alias(add_surrogate_key), "*"
        )
    return cleaned


def read_csv_audited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = "|",
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Typed CSV read with corrupt-row quarantine: returns
    (clean_rows, quarantined_raw_lines).

    The engine-side analogue of the reference's `ignore_errors=True`
    scan (SURVEY §2.1 S2) that doesn't silently DROP bad rows: rows
    that fail the schema (wrong arity, unparseable types) surface in
    full as raw text in the quarantine frame, ready for the validation
    layer to audit. PERMISSIVE + columnNameOfCorruptRecord is the
    scalable path — parsing still happens executor-side in one pass;
    the cache() works around Spark's restriction on queries that
    filter the internal corrupt-record column.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    df = (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
        .csv(path)
    )
    from ..registry import track_persist  # local: avoid import cycle

    df = track_persist(df)
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, quarantined
