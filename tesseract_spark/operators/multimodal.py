"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension beyond the reference's surface. Images/audio/video are carried as
``binary`` columns with a modality tag; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each task processes whole record batches (the
only sane shape at 100 TB — per-row Python UDFs are ~100× slower).

The actual media decode is STUBBED (no image/audio libs in this container):
``decode_features`` computes deterministic byte-level features (length, sha
prefix, simple byte histogram stats) and ``decode_media`` raises
``NotImplementedError`` — the Spark-side schema, batching, and partitioning are
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, sha256_8 string, "
    "byte_mean double, byte_max int"
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Testdata adapter: materialize an opaque binary payload column (UTF-8
    bytes of the text) + modality metadata, standing in for image/audio bytes."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text").alias("modality"),
    )


def decode_media(payload: bytes, modality: str):
    """Real media decode — intentionally stubbed (no codecs in this image)."""
    raise NotImplementedError(
        "media decode requires image/audio codecs not present in this container;"
        " plug a decoder in here — the mapInPandas plumbing is already batch-shaped"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, modality).
    Deterministic byte-level stand-in for a real decoder.

    The batch function is a local closure ON PURPOSE: cloudpickle then ships it
    by value, so executors don't need ``tesseract_spark`` on their PYTHONPATH
    (module-level functions are pickled by reference and break when the driver
    process runs outside the repo)."""

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len),
                    "sha256_8": payloads.map(
                        lambda b: _hashlib.sha256(b).hexdigest()[:8]
                    ),
                    "byte_mean": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "byte_max": payloads.map(lambda b: max(b) if len(b) else 0),
                }
            )

    return df.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)


def multimodal_features(documents: DataFrame) -> DataFrame:
    return extract_features(attach_binary_payload(documents))


def multimodal_features_oracle_sql(table: str = "documents") -> str:
    """Byte-level features are reproducible in SQL on UTF-8 payloads (testdata
    text is ASCII, so octet arithmetic matches Python's byte view)."""
    return f"""
    SELECT doc_id,
           'text' AS modality,
           octet_length(encode(text)) AS n_bytes,
           substr(sha256(text), 1, 8) AS sha256_8,
           (list_aggregate([ord(x) for x in split(text, '')], 'sum')::DOUBLE
             / octet_length(encode(text))) AS byte_mean,
           list_aggregate([ord(x) for x in split(text, '')], 'max') AS byte_max
    FROM {table}
    """
