"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched mapInPandas.

North-star extension: image/audio/video columns are `binary` payloads
with struct metadata. The Spark-side plumbing — schema, Arrow batch
shape, partition-parallel UDF execution — is real and oracle-tested;
the actual media decode is STUBBED (no image/audio libraries in this
container): :func:`decode_media` raises NotImplementedError unless the
deterministic fake decoder is requested.

Scale posture: payloads never leave executors; mapInPandas streams
Arrow batches (spark.sql.execution.arrow.maxRecordsPerBatch controls
batch size → memory per task is bounded regardless of payload sizes);
metadata extraction is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

META_SCHEMA = (
    "doc_id bigint, payload_bytes bigint, payload_md5 string, "
    "fake_width int, fake_height int"
)


def decode_media(payload: bytes, kind: str = "image", fake: bool = False) -> dict:
    """STUB decode step. Real implementation needs PIL/ffmpeg (absent
    here). `fake=True` derives deterministic pseudo-metadata from the
    first bytes so the pipeline shape is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            f"media decode for kind={kind!r} requires codec libraries "
            "not present in this environment; pass fake=True for the "
            "deterministic test decoder"
        )
    return {
        "fake_width": payload[0] if payload else 0,
        "fake_height": payload[1] if len(payload) > 1 else 0,
    }


def extract_payload_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """mapInPandas metadata extraction over a binary payload column.

    One Arrow-batched pass per partition; the pandas function sees
    pd.Series of bytes objects — the exact shape a real decoder needs.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            metas = [decode_media(p, fake=True) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload_bytes": [len(p) for p in payloads],
                    "payload_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                    "fake_width": [m["fake_width"] for m in metas],
                    "fake_height": [m["fake_height"] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, schema=META_SCHEMA)


@register(
    "multimodal_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
               md5(text) AS payload_md5,
               ascii(substr(text, 1, 1)) AS fake_width,
               ascii(substr(text, 2, 1)) AS fake_height
        FROM documents
        ORDER BY doc_id
    """,
    doc="Binary-payload metadata extraction via Arrow mapInPandas: the "
    "documents' text bytes stand in for media payloads; byte length, "
    "md5, and the fake decoder's first-byte metadata are recomputed "
    "relationally by the oracle (ASCII text ⇒ byte i == ascii(char i)).",
    tags=("multimodal", "udf", "extension"),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return extract_payload_meta(payloads, "doc_id", "payload").orderBy("doc_id")
