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


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, n_frames int"


def sample_frames(
    df: DataFrame, frame_size: int = 64, every: int = 4
) -> DataFrame:
    """Video-style frame sampling: treat each payload as ``n_frames``
    fixed-size frames and emit every ``every``-th one — the 1→N row
    expansion shape real video pipelines need (decode stubbed as byte
    slicing; each emitted frame is identified by the md5 of its bytes so the
    oracle can mirror it). Trailing partial frames are dropped, matching
    fixed-frame decoders."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_md5": [], "n_frames": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload) // frame_size
                for fi in range(0, n, every):
                    out["doc_id"].append(did)
                    out["frame_idx"].append(fi)
                    out["frame_md5"].append(
                        _hashlib.md5(
                            payload[fi * frame_size : (fi + 1) * frame_size]
                        ).hexdigest()
                    )
                    out["n_frames"].append(n)
            yield pd.DataFrame(out)

    return df.mapInPandas(frames, schema=FRAME_SCHEMA)


def sample_frames_oracle_sql(
    table: str = "documents", frame_size: int = 64, every: int = 4
) -> str:
    """ASCII testdata ⇒ byte slices == substr slices, so frame hashes are
    reproducible in SQL (md5 of a string hashes its UTF-8 bytes)."""
    nf = f"(octet_length(encode(text)) // {frame_size})"
    return f"""
    SELECT doc_id, fi::INT AS frame_idx,
           md5(substr(text, fi * {frame_size} + 1, {frame_size})) AS frame_md5,
           {nf}::INT AS n_frames
    FROM {table}, unnest(range(0, {nf}, {every})) AS u(fi)
    """


RESIZE_SCHEMA = "doc_id long, side int, out_w int, out_h int, pixels_md5 string"


def resize_payload_grid(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Image-style resize: interpret each payload as a square byte grid
    (side = isqrt(len)) and nearest-neighbor-downsample it to
    ``out_h × out_w`` — the real resampling arithmetic a single-channel
    image resize performs, on stand-in bytes (codec decode stubbed). Output
    pixels are identified by md5 so the SQL oracle can mirror the exact
    index math."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import math as _math

        for pdf in batches:
            out = {"doc_id": [], "side": [], "out_w": [], "out_h": [], "pixels_md5": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                side = _math.isqrt(len(payload))
                px = bytes(
                    payload[(i * side // out_h) * side + (j * side // out_w)]
                    for i in range(out_h)
                    for j in range(out_w)
                )
                out["doc_id"].append(did)
                out["side"].append(side)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["pixels_md5"].append(_hashlib.md5(px).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, schema=RESIZE_SCHEMA)


def resize_payload_grid_oracle_sql(
    table: str = "documents", out_w: int = 8, out_h: int = 8
) -> str:
    side = "CAST(floor(sqrt(octet_length(encode(text)))) AS BIGINT)"
    # chars list is 1-indexed; pixel (i,j) reads byte (i*side//out_h)*side +
    # (j*side//out_w), exactly the Python index math above
    return f"""
    SELECT doc_id,
           {side}::INT AS side,
           {out_w} AS out_w, {out_h} AS out_h,
           md5(array_to_string(flatten(
             list_transform(range(0, {out_h}), i ->
               list_transform(range(0, {out_w}), j ->
                 split(text, '')[(i * {side} // {out_h}) * {side}
                                 + (j * {side} // {out_w}) + 1]))), '')) AS pixels_md5
    FROM {table}
    """
