"""ISO BMFF container layer (operators/mp4.py) — the non-oracle tier.

q_video_mp4_samples hash-gates the mux→parse→extract round trip through
Spark; these tests cover the container math the oracle can't isolate:
stsc run resolution across odd/even chunk layouts, co64 64-bit offsets,
largesize boxes, multi-track files, and the honest boundaries (moof,
video frame decode).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tesseract_spark.operators import mp4


def _rand_samples(rng, n, lo=3, hi=50):
    return [
        rng.integers(0, 256, int(k)).astype(np.uint8).tobytes()
        for k in rng.integers(lo, hi, n)
    ]


def test_roundtrip_even_and_odd_chunk_layouts():
    """Even n → one stsc run (2 samples/chunk); odd n → two runs (trailing
    1-sample chunk). Both must resolve to the exact original samples."""
    rng = np.random.default_rng(1)
    for n in (1, 2, 3, 4, 7, 16, 33):
        samples = _rand_samples(rng, n)
        enc = mp4.encode_mp4(samples)
        assert mp4.extract_samples(enc) == samples, n
        meta = mp4.parse_mp4(enc)
        t = meta["tracks"][0]
        assert t["n_samples"] == n
        assert t["sample_sizes"] == [len(s) for s in samples]
        assert meta["duration"] == n * 40 and meta["timescale"] == 1000


def test_parse_metadata_fields():
    enc = mp4.encode_mp4(
        [b"abc", b"defg"], width=320, height=240, handler=b"vide", fourcc=b"avc1"
    )
    meta = mp4.parse_mp4(enc)
    assert meta["brand"] == "isom"
    t = meta["tracks"][0]
    assert (t["width"], t["height"]) == (320, 240)
    assert t["handler"] == "vide" and t["fourcc"] == "avc1"


def test_co64_offsets_resolve():
    """Rewrite the fixture's stco into co64 (64-bit chunk offsets): the
    parser must resolve identically — the table only changes width."""
    samples = [b"0123456789", b"abcdef", b"XYZ"]
    enc = bytearray(mp4.encode_mp4(samples))
    # locate stco, build an equivalent co64
    i = bytes(enc).index(b"stco") - 4
    (size,) = struct.unpack_from(">I", enc, i)
    body = bytes(enc[i + 8 : i + size])
    (count,) = struct.unpack_from(">I", body, 4)
    offs = struct.unpack_from(f">{count}I", body, 8)
    co64_body = body[:4] + struct.pack(">I", count) + b"".join(
        struct.pack(">Q", o) for o in offs
    )
    co64 = struct.pack(">I", 8 + len(co64_body)) + b"co64" + co64_body
    rebuilt = bytes(enc[:i]) + co64 + bytes(enc[i + size :])
    # fix enclosing container sizes (stbl/minf/mdia/trak/moov each grow by delta)
    delta = len(co64) - size
    for btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = rebuilt.index(btype) - 4
        (bs,) = struct.unpack_from(">I", rebuilt, j)
        rebuilt = (
            rebuilt[:j] + struct.pack(">I", bs + delta) + rebuilt[j + 4 :]
        )
    assert mp4.extract_samples(rebuilt) == samples


def test_largesize_box_walk():
    """A size==1 largesize mdat must parse: re-wrap the fixture's mdat."""
    samples = [b"hello", b"world!!"]
    enc = mp4.encode_mp4(samples)
    i = enc.index(b"mdat") - 4
    (size,) = struct.unpack_from(">I", enc, i)
    payload = enc[i + 8 : i + size]
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    rebuilt = enc[:i] + large + enc[i + size :]
    # chunk offsets shift by the 8 extra header bytes
    meta = mp4.parse_mp4(rebuilt)
    t = meta["tracks"][0]
    got = [
        rebuilt[o + 8 : o + 8 + s]
        for o, s in zip(t["sample_offsets"], t["sample_sizes"])
    ]
    assert got == samples


def test_honest_boundaries():
    with pytest.raises(ValueError, match="missing leading ftyp"):
        mp4.parse_mp4(b"\x00\x00\x00\x08free")
    enc = mp4.encode_mp4([b"x"])
    frag = enc + struct.pack(">I", 8) + b"moof"
    with pytest.raises(NotImplementedError, match="fragmented"):
        mp4.parse_mp4(frag)
    with pytest.raises(NotImplementedError, match="H.264/H.265"):
        mp4.decode_video_frames(enc)
    with pytest.raises(ValueError, match="malformed box"):
        list(mp4.walk_boxes(b"\x00\x00\x00\x03bad_box_padding"))


def test_sample_table_inconsistency_is_loud():
    """An stsz count that disagrees with the chunk layout must raise, not
    silently truncate (a quiet mismatch would ship wrong frame ranges)."""
    enc = bytearray(mp4.encode_mp4([b"aaaa", b"bbbb", b"cccc", b"dddd"]))
    i = bytes(enc).index(b"stsz") - 4
    # claim 6 samples but provide 4 sizes -> resolution must fail loudly
    struct.pack_into(">I", enc, i + 8 + 4 + 4, 6)
    with pytest.raises((ValueError, struct.error)):
        mp4.extract_samples(bytes(enc))

def test_hostile_stsc_first_chunk_cannot_oom():
    """ADVICE r12: a single corrupted byte in a later stsc run's
    first_chunk (e.g. 0x00000002 -> 0xFF000002) must not size a multi-GB
    run expansion — runs are clamped to the real chunk count."""
    enc = bytearray(mp4.encode_mp4([b"a" * 4, b"b" * 4, b"c" * 4]))  # odd -> 2 stsc runs
    i = bytes(enc).index(b"stsc") - 4
    # stsc layout: size(4) type(4) verflags(4) entry_count(4) then
    # 12-byte (first_chunk, spc, desc) runs; corrupt run #2's first_chunk
    run2_first = i + 8 + 4 + 4 + 12
    good = mp4.parse_mp4(mp4.encode_mp4([b"a" * 4, b"b" * 4, b"c" * 4]))
    struct.pack_into(">I", enc, run2_first, 0xFF000002)
    # bounded: either rejected, or resolved to the SAME offsets the intact
    # table gives (the clamped run covers the real chunk table) — never a
    # ~4.3e9-element expansion. The call returning at all inside the test
    # timeout IS the regression check.
    try:
        parsed = mp4.parse_mp4(bytes(enc))
    except ValueError:
        pass
    else:
        assert (
            parsed["tracks"][0]["sample_offsets"]
            == good["tracks"][0]["sample_offsets"]
        )


def test_hostile_stsc_nonincreasing_first_chunk_raises():
    enc = bytearray(mp4.encode_mp4([b"a" * 4, b"b" * 4, b"c" * 4]))
    i = bytes(enc).index(b"stsc") - 4
    run2_first = i + 8 + 4 + 4 + 12
    struct.pack_into(">I", enc, run2_first, 1)  # equal to run #1's first
    with pytest.raises(ValueError, match="strictly increasing"):
        mp4.parse_mp4(bytes(enc))


def test_hostile_uniform_stsz_count_cannot_oom():
    """ADVICE r12: uniform-size stsz with count=0xFFFFFFFF must raise, not
    materialize a ~34 GB list (non-uniform path is buffer-bounded already)."""
    enc = bytearray(mp4.encode_mp4([b"a" * 4, b"b" * 4]))
    i = bytes(enc).index(b"stsz") - 4
    struct.pack_into(">I", enc, i + 8 + 4, 7)  # uniform sample size
    struct.pack_into(">I", enc, i + 8 + 4 + 4, 0xFFFFFFFF)  # hostile count
    with pytest.raises(ValueError, match="exceeds"):
        mp4.parse_mp4(bytes(enc))
