"""Excel bridge (reference SURVEY.md §2.1 S4 — `pl.read_excel` with
calamine/xlsx2csv fallback, notebook cell 36).

Spark has no native Excel reader. Excel files in this architecture are
dim-table-sized (the reference's product sheet is 210k rows), so the
bridge is: pandas reads on the driver → cleanup (drop all-null rows
and columns, normalize headers — notebook cell 36 steps 1-5) →
`spark.createDataFrame` (Arrow path). Fact-scale data must arrive as
CSV/Parquet instead.

The pandas Excel engines (openpyxl/calamine) are not installed in this
environment, so the reader is import-gated; the cleanup logic is
factored out and tested against DataFrames built from dict fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def clean_excel_frame(pdf):  # type: ignore[no-untyped-def]
    """pandas-level cleanup mirroring the reference's notebook cell 36:
    drop all-null columns, drop all-null rows, normalize headers."""
    pdf = pdf.dropna(axis=1, how="all")
    pdf = pdf.dropna(axis=0, how="all")
    pdf.columns = [str(c).strip().lower().replace(" ", "_").rstrip("?") for c in pdf.columns]
    return pdf


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str | int = 0,
) -> DataFrame:
    """Driver-side Excel read → cleaned Spark DataFrame.

    Raises NotImplementedError when no pandas Excel engine is
    installed (this container) — the plumbing is exercised in tests
    through :func:`excel_frame_to_spark` with fixture frames.
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError as exc:  # no openpyxl/calamine in the image
        raise NotImplementedError(
            "no pandas Excel engine installed; convert the sheet to CSV "
            "and use sources.csv, or install openpyxl"
        ) from exc
    return excel_frame_to_spark(spark, pdf)


def excel_frame_to_spark(spark: SparkSession, pdf) -> DataFrame:  # type: ignore[no-untyped-def]
    return spark.createDataFrame(clean_excel_frame(pdf))
