"""Adversarial byte-fuzz for the r12 codec surfaces (jpeg.py, mp4.py).

A decoder that shards 100 TB of crawled bytes meets truncations, bit
flips, and hostile headers constantly. The contract fuzzed here: for ANY
mutation of a valid input, the parser either returns a well-formed result
or raises a bounded, ordinary exception — it never hangs, never loops
unbounded, and never dies with an interpreter-level error. (Silently
different PIXELS under a bit flip are fine — that's what checksums in the
pipeline are for; this is about control-flow robustness.)
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tesseract_spark.operators import jpeg, mp4

#: the r12 codecs normalize every corrupt-input failure (truncation
#: IndexError, corrupt-table KeyError, short-header struct.error) into this
#: bounded family — anything else (SystemError, RecursionError, hangs) is a
#: decoder bug, and so is a LEAKED IndexError/KeyError now
ALLOWED = (ValueError, NotImplementedError)


def _valid_jpeg() -> bytes:
    x = np.linspace(0, 4 * np.pi, 24)
    img = (127 + 100 * np.outer(np.sin(x[:16]), np.cos(x))).astype(np.uint8)
    return jpeg.encode_jpeg_gray(img, quality=85, restart_interval=2)


def _valid_progressive_jpeg() -> bytes:
    x = np.linspace(0, 4 * np.pi, 24)
    img = (127 + 100 * np.outer(np.sin(x[:16]), np.cos(x))).astype(np.uint8)
    return jpeg.encode_jpeg_progressive_gray(img, quality=85, restart_interval=2)


def _valid_mp4() -> bytes:
    return mp4.encode_mp4([b"alpha-frame", b"beta", b"gamma-frame-3"])


def _valid_fmp4() -> bytes:
    # emit_tfdt puts the §8.8.12 decode-time anchor path (late r14) under
    # the same mutation pressure as the rest of the traf machinery
    return mp4.encode_mp4_fragmented(
        [b"alpha-frame", b"beta", b"gamma-frame-3"],
        samples_per_fragment=2,
        emit_tfdt=True,
        decode_time_base=40,
    )


def _valid_cmyk_jpeg() -> bytes:
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 24, 4), dtype=np.uint8)
    return jpeg.encode_jpeg_cmyk(img, quality=85, transform=2, restart_interval=2)


_JPEG = _valid_jpeg()
_PJPEG = _valid_progressive_jpeg()
_CMYK = _valid_cmyk_jpeg()
_MP4 = _valid_mp4()
_FMP4 = _valid_fmp4()


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pos=st.integers(0, len(_JPEG) - 1),
    val=st.integers(0, 255),
    cut=st.integers(0, len(_JPEG)),
)
def test_jpeg_decoder_bounded_on_mutations(pos, val, cut):
    mutated = bytearray(_JPEG)
    mutated[pos] = val
    for payload in (bytes(mutated), _JPEG[:cut]):
        try:
            out = jpeg.decode_jpeg(payload)
        except ALLOWED:
            continue
        assert set(out) >= {"width", "height", "channels", "pixels"}
        assert len(out["pixels"]) == out["width"] * out["height"] * 3


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pos=st.integers(0, len(_CMYK) - 1),
    val=st.integers(0, 255),
    cut=st.integers(0, len(_CMYK)),
)
def test_cmyk_jpeg_decoder_bounded_on_mutations(pos, val, cut):
    mutated = bytearray(_CMYK)
    mutated[pos] = val
    for payload in (bytes(mutated), _CMYK[:cut]):
        try:
            out = jpeg.decode_jpeg(payload)
        except ALLOWED:
            continue
        assert set(out) >= {"width", "height", "channels", "pixels"}
        assert len(out["pixels"]) == out["width"] * out["height"] * 3


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pos=st.integers(0, len(_PJPEG) - 1),
    val=st.integers(0, 255),
    cut=st.integers(0, len(_PJPEG)),
)
def test_progressive_jpeg_decoder_bounded_on_mutations(pos, val, cut):
    mutated = bytearray(_PJPEG)
    mutated[pos] = val
    for payload in (bytes(mutated), _PJPEG[:cut]):
        try:
            out = jpeg.decode_jpeg(payload)
        except ALLOWED:
            continue
        assert set(out) >= {"width", "height", "channels", "pixels"}
        assert len(out["pixels"]) == out["width"] * out["height"] * 3


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pos=st.integers(0, len(_MP4) - 1),
    val=st.integers(0, 255),
    cut=st.integers(0, len(_MP4)),
)
def test_mp4_parser_bounded_on_mutations(pos, val, cut):
    mutated = bytearray(_MP4)
    mutated[pos] = val
    for payload in (bytes(mutated), _MP4[:cut]):
        try:
            meta = mp4.parse_mp4(payload)
            for t in meta["tracks"]:
                # offsets may point anywhere after a mutation; slicing bytes
                # is safe — resolution itself must not crash oddly
                assert len(t["sample_offsets"]) == t["n_samples"]
        except ALLOWED:
            continue


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pos=st.integers(0, len(_FMP4) - 1),
    val=st.integers(0, 255),
    cut=st.integers(0, len(_FMP4)),
)
def test_fragmented_mp4_parser_bounded_on_mutations(pos, val, cut):
    mutated = bytearray(_FMP4)
    mutated[pos] = val
    for payload in (bytes(mutated), _FMP4[:cut]):
        try:
            meta = mp4.parse_mp4(payload)
            for t in meta["tracks"]:
                assert len(t["sample_offsets"]) == t["n_samples"]
        except ALLOWED:
            continue


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(data=st.binary(min_size=0, max_size=200))
def test_parsers_bounded_on_garbage(data):
    with pytest.raises(ALLOWED):
        jpeg.decode_jpeg(data)
    with pytest.raises(ALLOWED):
        mp4.parse_mp4(data)


def test_pathological_box_sizes_terminate():
    """Adversarial ISO BMFF shapes that historically loop or blow memory in
    naive parsers: size-0 run-to-end boxes, a largesize smaller than its
    header, nested containers claiming more than their parent."""
    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    # size-0 box at top level (spec: extends to EOF) — must terminate
    payload = ftyp + struct.pack(">I", 0) + b"free" + b"x" * 50
    mp4.parse_mp4(payload)
    # largesize < 16 is malformed, not an infinite loop
    bad_large = ftyp + struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 8)
    with pytest.raises(ALLOWED):
        mp4.parse_mp4(bad_large)
    # child claiming to extend past its container
    moov_body = struct.pack(">I", 10_000) + b"trak" + b"\x00" * 8
    payload = ftyp + struct.pack(">I", 8 + len(moov_body)) + b"moov" + moov_body
    with pytest.raises(ALLOWED):
        mp4.parse_mp4(payload)


# ---------- same contract for the round-6/7 decoders (BMP/PNG/PPM/WAV) ----------

from tesseract_spark.operators import multimodal as mm

#: wave/zlib surface additional stdlib exceptions on hostile input
import wave as _wave
import zlib as _zlib

#: legacy decoders predate the normalization: stdlib wave/zlib surface
#: their own classes and struct/Index errors still pass through
LEGACY_ALLOWED = ALLOWED + (
    _wave.Error, _zlib.error, EOFError, AssertionError,
    struct.error, IndexError, KeyError,
)


def _legacy_fixtures():
    px = bytes(range(64)) * 4  # 256 bytes
    pal = [((i * 7 + 13) % 256, (i * 5 + 3) % 256, i) for i in range(256)]
    out = [
        mm.encode_bmp_gray(px, 16, 16),
        mm.encode_png_gray(px, 16, 16),
        # r14 PNG layouts: palette+tRNS, 4-bit palette, RGBA, gray+alpha,
        # plus (late r14) Adam7-interlaced and 16-bit variants
        mm.encode_png_palette(px, 16, 16, pal, trans=bytes(range(128))),
        mm.encode_png_palette(bytes(b & 0xF for b in px), 16, 16, pal[:16], depth=4),
        mm.encode_png_rgba(px, 8, 8),
        mm.encode_png_gray_alpha(px, 8, 16),
        mm.encode_png_gray(px, 16, 16, interlace=True),
        mm.encode_png_palette(px, 16, 16, pal, trans=bytes(range(64)), interlace=True),
        mm.encode_png_rgba(px, 8, 8, interlace=True),
        mm.encode_png_gray(px, 8, 16, depth=16),
        # r15: sub-8-bit grayscale (the last PNG layout), both interlace modes
        mm.encode_png_gray(bytes(b & 0xF for b in px), 16, 16, depth=4),
        mm.encode_png_gray(bytes(b & 0x3 for b in px), 16, 16, depth=2, interlace=True),
        mm.encode_png_gray(bytes(b & 0x1 for b in px), 16, 16, depth=1),
        b"P6\n16 16\n255\n" + bytes(768),
    ]
    import io
    import wave as w

    buf = io.BytesIO()
    with w.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(1)
        f.setframerate(8000)
        f.writeframes(bytes(range(200)))
    out.append(buf.getvalue())
    return out


_LEGACY = _legacy_fixtures()


@settings(max_examples=150, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    which=st.integers(0, len(_LEGACY) - 1),
    pos=st.integers(0, 200),
    val=st.integers(0, 255),
    cut=st.integers(0, 300),
)
def test_legacy_decoders_bounded_on_mutations(which, pos, val, cut):
    base = _LEGACY[which]
    mutated = bytearray(base)
    mutated[pos % len(base)] = val
    for payload in (bytes(mutated), base[: cut % (len(base) + 1)]):
        try:
            out = mm.decode_media(payload, "any")
        except LEGACY_ALLOWED:
            continue
        assert isinstance(out, dict)
        if "pixels" in out:
            assert len(out["pixels"]) == out["width"] * out["height"] * 3


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    pos=st.integers(0, len(_FMP4) - 1),
    val=st.integers(0, 255),
)
def test_extraction_apis_bounded_on_mutations(pos, val):
    """The EXTRACTION layer shares parse_mp4's normalized contract: a
    mutation that parses to zero tracks (flipped trak type) or corrupts
    an stss entry to 0 must raise ValueError, never leak IndexError or
    silently wrap to the LAST sample via Python negative indexing."""
    mutated = bytearray(_FMP4)
    mutated[pos] = val
    payload = bytes(mutated)
    for fn in (
        mp4.extract_samples,
        mp4.extract_sync_samples,
        lambda p: mp4.extract_time_range(p, 0.0, 0.1, align_sync=True),
    ):
        try:
            out = fn(payload)
        except ALLOWED:
            continue
        assert isinstance(out, list)


def test_corrupt_stss_zero_entry_does_not_wrap_negative():
    samples = [bytes([65 + i]) * 4 for i in range(6)]
    enc = bytearray(mp4.encode_mp4(samples, sync_every=3))
    i = bytes(enc).index(b"stss") - 4
    struct.pack_into(">I", enc, i + 8 + 4 + 4, 0)  # first sync number -> 0
    clip = mp4.extract_time_range(bytes(enc), 0.08, 0.2, align_sync=True)
    # the clip must not be prepended with the LAST sample's bytes
    assert samples[-1] not in clip[: max(len(clip) - 1, 0)]
