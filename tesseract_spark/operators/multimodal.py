"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extension beyond the reference's surface. Images/audio/video are carried as
``binary`` columns with a modality tag; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so each task processes whole record batches (the
only sane shape at 100 TB — per-row Python UDFs are ~100× slower).

``decode_media`` performs REAL decoding for the container formats the Python
standard library can parse without codecs: uncompressed BMP (24/32-bit BI_RGB,
bottom-up and top-down), binary PPM/PGM (P6/P5), and PCM WAV (via ``wave``).
Compressed formats (JPEG/PNG/MP4/...) still raise ``NotImplementedError`` —
those genuinely need codec libraries absent from this container. The
``q_multimodal_decode`` catalog entry drives the BMP path end-to-end through
Spark with an md5-pinned DuckDB oracle: payloads are wrapped into real BMP
files, parsed back by the real header/stride/flip/BGR logic, and the decoded
pixel stream must hash to what the oracle predicts from the source bytes.
"""

from __future__ import annotations

import struct
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


def encode_bmp_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Build a real 24-bit uncompressed bottom-up BMP from a grayscale byte
    grid (row-major, top-down input; R=G=B=byte). Rows are 4-byte padded per
    the format. Inverse of :func:`decode_bmp` — used to manufacture genuine
    BMP payloads from testdata bytes."""
    assert len(pixels) >= width * height
    stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = pixels[y * width : (y + 1) * width]
        rows.append(b"".join(bytes((b, b, b)) for b in row) + pad)
    data = b"".join(rows)
    # 14-byte file header + 40-byte BITMAPINFOHEADER
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24/32-bit BI_RGB BMP: validates the headers,
    honors the row stride and bottom-up/top-down orientation, swaps BGR(A) to
    a top-down row-major RGB stream."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    dib_size, width, height_raw = struct.unpack_from("<Iii", payload, 14)
    if dib_size < 40:
        raise NotImplementedError(f"BITMAPCOREHEADER (size {dib_size}) unsupported")
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP unsupported (24/32 only)")
    height, bottom_up = abs(height_raw), height_raw > 0
    n_ch = bpp // 8
    stride = (width * n_ch + 3) & ~3
    out = bytearray()
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        row = payload[pixel_off + src_y * stride :][: width * n_ch]
        for x in range(width):
            px = row[x * n_ch : x * n_ch + n_ch]
            out += bytes((px[2], px[1], px[0]))  # BGR(A) -> RGB
    return {"width": width, "height": height, "channels": 3, "pixels": bytes(out)}


def decode_ppm(payload: bytes) -> dict:
    """Parse binary PPM (P6, RGB) / PGM (P5, gray) with maxval <= 255."""
    magic = payload[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, whitespace/comment-separated width, height, maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    n_ch = 3 if magic == b"P6" else 1
    raw = payload[pos : pos + width * height * n_ch]
    pixels = raw if n_ch == 3 else b"".join(bytes((b, b, b)) for b in raw)
    return {"width": width, "height": height, "channels": 3, "pixels": pixels}


def decode_wav(payload: bytes) -> dict:
    """Parse PCM WAV via the stdlib ``wave`` module."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        return {
            "sample_rate": w.getframerate(),
            "n_channels": w.getnchannels(),
            "sample_width": w.getsampwidth(),
            "n_frames": w.getnframes(),
            "pcm": w.readframes(w.getnframes()),
        }


def decode_media(payload: bytes, modality: str):
    """Dispatch on container magic bytes; real decode for stdlib-parseable
    formats, honest ``NotImplementedError`` for codec-requiring ones."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        f"modality {modality!r}: payload is not an uncompressed BMP/PPM/WAV — "
        "compressed formats (JPEG/PNG/MP4/...) need codec libraries not present "
        "in this container; plug a decoder in here, the mapInPandas plumbing is "
        "already batch-shaped"
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


DECODE_SCHEMA = (
    "doc_id long, width int, height int, channels int, pixels_md5 string, "
    "mean_pixel double"
)


def decoded_image_features(documents: DataFrame, width: int = 16) -> DataFrame:
    """End-to-end REAL image decode through Spark: wrap each document's bytes
    into a genuine 24-bit BMP file (``encode_bmp_gray`` — real headers, row
    padding, bottom-up storage), then parse it back with the real decoder
    (``decode_bmp`` — header validation, stride walk, row flip, BGR→RGB) and
    emit features of the DECODED pixel stream. The md5 pins the whole
    round-trip: any header/stride/orientation/channel-order mistake in either
    direction changes the hash, and the DuckDB oracle predicts it from the
    source bytes independently.

    Batch closure is self-contained (stdlib-only, shipped by value) so
    executors need no repo PYTHONPATH — the in-closure encode/decode pair is
    generated from the module-level implementations' shared logic; semantics
    are pinned equal by tests/test_operators round-trip tests."""
    docs = documents.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import struct as _struct

        def enc(pixels: bytes, w: int, h: int) -> bytes:
            stride = (w * 3 + 3) & ~3
            pad = b"\x00" * (stride - w * 3)
            rows = [
                b"".join(bytes((b, b, b)) for b in pixels[y * w : (y + 1) * w]) + pad
                for y in range(h - 1, -1, -1)
            ]
            data = b"".join(rows)
            return (
                _struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
                + _struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
                )
                + data
            )

        def dec(payload: bytes) -> dict:
            assert payload[:2] == b"BM"
            (off,) = _struct.unpack_from("<I", payload, 10)
            _, w, h_raw = _struct.unpack_from("<Iii", payload, 14)
            (bpp,) = _struct.unpack_from("<H", payload, 28)
            (comp,) = _struct.unpack_from("<I", payload, 30)
            assert comp == 0 and bpp in (24, 32)
            h, bottom_up = abs(h_raw), h_raw > 0
            n_ch = bpp // 8
            stride = (w * n_ch + 3) & ~3
            out = bytearray()
            for y in range(h):
                sy = (h - 1 - y) if bottom_up else y
                row = payload[off + sy * stride :][: w * n_ch]
                for x in range(w):
                    px = row[x * n_ch : x * n_ch + n_ch]
                    out += bytes((px[2], px[1], px[0]))
            return {"width": w, "height": h, "pixels": bytes(out)}

        for pdf in it:
            out = {
                "doc_id": [], "width": [], "height": [], "channels": [],
                "pixels_md5": [], "mean_pixel": [],
            }  # fmt: skip
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = len(payload) // width
                if h == 0:
                    continue
                img = dec(enc(payload[: width * h], width, h))
                px = img["pixels"]
                out["doc_id"].append(did)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["channels"].append(3)
                out["pixels_md5"].append(_hashlib.md5(px).hexdigest())
                out["mean_pixel"].append(sum(px) / len(px))
            yield pd.DataFrame(out)

    return docs.mapInPandas(batches, schema=DECODE_SCHEMA)


def decoded_image_features_oracle_sql(table: str = "documents", width: int = 16) -> str:
    """Independent prediction of the decoded RGB stream: the decoder must
    return the first width*height source bytes top-down with each byte
    tripled (R=G=B) — ASCII testdata makes byte==char arithmetic exact."""
    h = f"(octet_length(encode(text)) // {width})"
    clipped = f"substr(text, 1, {width} * {h})"
    tripled = (
        f"array_to_string(list_transform(split({clipped}, ''), c -> repeat(c, 3)), '')"
    )
    return f"""
    SELECT doc_id,
           {width} AS width,
           {h}::INT AS height,
           3 AS channels,
           md5({tripled}) AS pixels_md5,
           (list_aggregate([ord(x) for x in split({clipped}, '')], 'sum')::DOUBLE * 3)
             / ({width} * {h} * 3) AS mean_pixel
    FROM {table}
    WHERE {h} >= 1
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


AHASH_SCHEMA = "doc_id long, ahash string"


def image_ahash(documents: DataFrame, width: int = 16) -> DataFrame:
    """Per-image 8×8 average-hash (aHash) over REAL decoded images: each
    document's bytes round-trip through the genuine BMP encoder/decoder
    (same closure pair as ``decoded_image_features``), the decoded grayscale
    grid is 8×8 block-pooled, and each block's bit is 1 iff its mean exceeds
    the image mean — the classic perceptual fingerprint for image-level
    dedup (near-identical images collide even when bytes differ).

    The pooled comparison is EXACT integer cross-multiplication
    (``block_sum·n_pixels > total_sum·block_n``) — no float means — so the
    DuckDB oracle predicts the hash independently from the source bytes.
    The 64-bit hash is emitted as 16 hex chars (two 32-bit halves;
    sign-free on every engine)."""
    docs = documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        def enc(pixels: bytes, w: int, h: int) -> bytes:
            stride = (w * 3 + 3) & ~3
            pad = b"\x00" * (stride - w * 3)
            rows = [
                b"".join(bytes((b, b, b)) for b in pixels[y * w : (y + 1) * w]) + pad
                for y in range(h - 1, -1, -1)
            ]
            data = b"".join(rows)
            return (
                _struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
                + _struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
                )
                + data
            )

        def dec_gray(payload: bytes) -> tuple:
            assert payload[:2] == b"BM"
            (off,) = _struct.unpack_from("<I", payload, 10)
            _, w, h_raw = _struct.unpack_from("<Iii", payload, 14)
            (bpp,) = _struct.unpack_from("<H", payload, 28)
            h, bottom_up = abs(h_raw), h_raw > 0
            n_ch = bpp // 8
            stride = (w * n_ch + 3) & ~3
            gray = []
            for y in range(h):
                sy = (h - 1 - y) if bottom_up else y
                row = payload[off + sy * stride :][: w * n_ch]
                gray.extend(row[x * n_ch] for x in range(w))  # R==G==B
            return w, h, gray

        for pdf in it:
            out = {"doc_id": [], "ahash": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = len(payload) // width
                if h == 0:
                    continue
                w, hh, gray = dec_gray(enc(payload[: width * h], width, h))
                tsum, tn = sum(gray), len(gray)
                bsum: dict = {}
                bn: dict = {}
                for i, g in enumerate(gray):
                    y, x = divmod(i, w)
                    key = ((y * 8) // hh, (x * 8) // w)
                    bsum[key] = bsum.get(key, 0) + g
                    bn[key] = bn.get(key, 0) + 1
                hv = 0
                for (by, bx), s in bsum.items():
                    if s * tn > tsum * bn[(by, bx)]:
                        hv |= 1 << (by * 8 + bx)
                out["doc_id"].append(did)
                out["ahash"].append(f"{hv >> 32:08x}{hv & 0xFFFFFFFF:08x}")
            yield pd.DataFrame(out)

    return docs.mapInPandas(batches, schema=AHASH_SCHEMA)


def image_ahash_groups(documents: DataFrame, width: int = 16) -> DataFrame:
    """Perceptual-duplicate groups: images sharing an aHash, with group size
    and smallest member id — the multimodal counterpart of exact text dedup
    (one map-side hash per image, one hash-keyed groupBy; linear)."""
    return (
        image_ahash(documents, width)
        .groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def image_ahash_groups_oracle_sql(table: str = "documents", width: int = 16) -> str:
    """Independent SQL prediction: decoded gray pixel i == source byte i
    (decoder returns bytes top-down), blocks pooled by the same integer
    cross-multiplied comparison, hash assembled as two 32-bit hex halves.
    Byte-indexed via ``to_hex(encode(text))`` hex pairs, so non-ASCII
    documents (multi-byte UTF-8) agree with the Spark side's byte clip."""
    return f"""
    WITH imgs AS (
      SELECT doc_id, hex, h
      FROM (SELECT doc_id, to_hex(encode(text)) AS hex,
                   (octet_length(encode(text)) // {width}) AS h
            FROM {table})
      WHERE h >= 1),
    px AS (
      SELECT doc_id, h,
             unnest(range(0, {width} * h)) AS i
      FROM imgs),
    gpx AS (
      SELECT p.doc_id, p.h,
             ('0x' || substr(i2.hex, 2 * p.i + 1, 2))::INT AS g,
             (p.i // {width}) AS y, (p.i % {width}) AS x
      FROM px p JOIN imgs i2 USING (doc_id)),
    blk AS (
      SELECT doc_id, (y * 8) // h AS by, (x * 8) // {width} AS bx,
             CAST(sum(g) AS BIGINT) AS bsum, count(*) AS bn
      FROM gpx GROUP BY 1, 2, 3),
    tot AS (
      SELECT doc_id, CAST(sum(g) AS BIGINT) AS tsum, count(*) AS tn
      FROM gpx GROUP BY 1),
    bits AS (
      SELECT b.doc_id, (b.by * 8 + b.bx) AS idx,
             CASE WHEN b.bsum * t.tn > t.tsum * b.bn THEN 1 ELSE 0 END AS bit
      FROM blk b JOIN tot t USING (doc_id)),
    hashes AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN idx >= 32 THEN bit * (1::BIGINT << (idx - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN idx < 32 THEN bit * (1::BIGINT << idx)
                           ELSE 0 END) AS BIGINT) AS lo
      FROM bits GROUP BY 1)
    SELECT lower(lpad(to_hex(hi), 8, '0') || lpad(to_hex(lo), 8, '0')) AS ahash,
           count(*) AS n_images,
           min(doc_id) AS first_doc
    FROM hashes GROUP BY 1
    """


AUDIO_FP_SCHEMA = "doc_id long, n_samples int, audio_fp string"


def audio_energy_fingerprint(documents: DataFrame, n_frames: int = 16) -> DataFrame:
    """Audio-modality fingerprint over REAL decoded audio: each document's
    bytes are wrapped as a genuine 8-bit PCM mono WAV (stdlib ``wave``
    writer), decoded back (``decode_wav`` path — RIFF headers parsed for
    real), and the PCM stream is split into ``n_frames`` equal frames whose
    energy profile forms the fingerprint: frame bit = 1 iff its energy
    exceeds the clip mean (exact integer cross-multiplication — the same
    trick as the image aHash). Energy-profile hashing is the crude-but-real
    shape of audio dedup (loudness-envelope matching); near-identical clips
    collide, different envelopes separate.

    Returns ``(doc_id, n_samples, audio_fp)`` with the fingerprint as
    ``n_frames/4`` hex chars; group by ``audio_fp`` for duplicate clusters.
    Pure per-row map — no shuffle at all until the caller aggregates."""
    docs = documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io
        import wave as _wave

        def enc(samples: bytes) -> bytes:
            buf = _io.BytesIO()
            with _wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(1)
                w.setframerate(8000)
                w.writeframes(samples)
            return buf.getvalue()

        def dec(payload: bytes) -> bytes:
            assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
            with _wave.open(_io.BytesIO(payload)) as w:
                assert w.getnchannels() == 1 and w.getsampwidth() == 1
                return w.readframes(w.getnframes())

        for pdf in it:
            out = {"doc_id": [], "n_samples": [], "audio_fp": []}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                frame_len = len(payload) // n_frames
                if frame_len == 0:
                    continue
                used = payload[: frame_len * n_frames]
                pcm = dec(enc(bytes(used)))  # 8-bit PCM: bytes round-trip
                energies = [
                    sum((s - 128) * (s - 128) for s in pcm[f * frame_len : (f + 1) * frame_len])
                    for f in range(n_frames)
                ]
                total = sum(energies)
                fp = 0
                for f, e in enumerate(energies):
                    if e * n_frames > total:
                        fp |= 1 << f
                out["doc_id"].append(did)
                out["n_samples"].append(len(pcm))
                out["audio_fp"].append(format(fp, f"0{n_frames // 4}x"))
            yield pd.DataFrame(out)

    return docs.mapInPandas(batches, schema=AUDIO_FP_SCHEMA)


def audio_energy_fingerprint_oracle_sql(
    table: str = "documents", n_frames: int = 16
) -> str:
    """Independent prediction: 8-bit PCM samples ARE the source bytes, so
    frame energies are computable from the text directly. Byte-indexed via
    ``to_hex(encode(text))`` hex pairs, so non-ASCII (multi-byte UTF-8)
    documents agree with the Spark side's byte clip."""
    return f"""
    WITH clips AS (
      SELECT doc_id, hex, fl
      FROM (SELECT doc_id, to_hex(encode(text)) AS hex,
                   (octet_length(encode(text)) // {n_frames}) AS fl
            FROM {table})
      WHERE fl >= 1),
    sx AS (
      SELECT doc_id, fl, unnest(range(0, fl * {n_frames})) AS i
      FROM clips),
    samples AS (
      SELECT s.doc_id, (s.i // s.fl) AS f,
             (('0x' || substr(c.hex, 2 * s.i + 1, 2))::INT - 128) AS v
      FROM sx s JOIN clips c USING (doc_id)),
    fe AS (
      SELECT doc_id, f, CAST(sum(v * v) AS BIGINT) AS e
      FROM samples GROUP BY 1, 2),
    tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS te FROM fe GROUP BY 1),
    fp AS (
      SELECT fe.doc_id,
             CAST(sum(CASE WHEN fe.e * {n_frames} > t.te
                           THEN (1::BIGINT << fe.f) ELSE 0 END) AS BIGINT) AS v
      FROM fe JOIN tot t USING (doc_id) GROUP BY 1)
    SELECT c.doc_id,
           (c.fl * {n_frames})::INT AS n_samples,
           lower(lpad(to_hex(fp.v), {n_frames // 4}, '0')) AS audio_fp
    FROM clips c JOIN fp USING (doc_id)
    """
