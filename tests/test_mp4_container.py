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
    # moof is no longer a boundary (r13) — an empty trailing fragment is
    # simply inert; bitstream decode remains the honest one
    meta = mp4.parse_mp4(enc + struct.pack(">I", 8) + b"moof")
    assert meta["tracks"][0]["n_samples"] == 1
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

# ---------------------------------------------------------------------------
# Fragmented (moof/tfhd/trun) — r13
# ---------------------------------------------------------------------------


def test_fragmented_roundtrip_across_fragment_sizes():
    samples = [b"frame-one", b"frame-two", b"f3", b"frame-four-longer", b"x"]
    for spf in (1, 2, 3, 5, 9):
        enc = mp4.encode_mp4_fragmented(samples, samples_per_fragment=spf)
        assert mp4.extract_samples(enc) == samples, spf
        t = mp4.parse_mp4(enc)["tracks"][0]
        assert t["n_samples"] == len(samples)
        assert t["width"] == 64 and t["handler"] == "vide"


def test_fragmented_metadata_and_trex_default_size():
    """A trun without per-sample sizes falls back to the trex default —
    rebuild a fragment by hand with uniform samples and no size field."""
    import struct as s

    samples = [b"aaaa", b"bbbb", b"cccc"]
    enc = bytearray(mp4.encode_mp4_fragmented(samples, samples_per_fragment=3))
    # patch trex default_sample_size to 4
    i = bytes(enc).index(b"trex") - 4
    s.pack_into(">I", enc, i + 8 + 4 + 4 + 4 + 4, 4)
    # rewrite the trun WITHOUT the size-present flag (0x200): keep
    # data_offset only; shrink the box by 12 bytes of sizes
    j = bytes(enc).index(b"trun") - 4
    (old_size,) = s.unpack_from(">I", enc, j)
    (data_off,) = s.unpack_from(">i", enc, j + 16)
    new_trun = (
        s.pack(">I", 8 + 4 + 8) + b"trun"
        + b"\x00" + (0x000001).to_bytes(3, "big")
        + s.pack(">Ii", 3, data_off - 12)  # moof shrinks by 12
    )
    new = bytes(enc[:j]) + new_trun + bytes(enc[j + old_size :])
    # fix enclosing traf/moof sizes (each shrinks by 12)
    new = bytearray(new)
    for btype in (b"traf", b"moof"):
        k = bytes(new).index(btype) - 4
        (sz,) = s.unpack_from(">I", new, k)
        s.pack_into(">I", new, k, sz - 12)
    assert mp4.extract_samples(bytes(new)) == samples


def test_fragmented_multiple_truns_continue_run():
    """Two truns in one traf: the second without data_offset must continue
    immediately after the first run's data (§8.8.8 default)."""
    import struct as s

    samples = [b"one-", b"two-", b"three"]
    enc = bytearray(mp4.encode_mp4_fragmented(samples, samples_per_fragment=3))
    j = bytes(enc).index(b"trun") - 4
    (old_size,) = s.unpack_from(">I", enc, j)
    (data_off,) = s.unpack_from(">i", enc, j + 16)
    # split into trun#1 (2 samples, data_offset) + trun#2 (1 sample, none)
    t2 = (
        s.pack(">I", 8 + 4 + 4 + 4) + b"trun"
        + b"\x00" + (0x000200).to_bytes(3, "big")
        + s.pack(">I", 1)
        + s.pack(">I", 5)
    )
    t1_len = 8 + 4 + 8 + 8
    delta = t1_len + len(t2) - old_size  # moof grows; data_offset shifts
    t1 = (
        s.pack(">I", t1_len) + b"trun"
        + b"\x00" + (0x000201).to_bytes(3, "big")
        + s.pack(">Ii", 2, data_off + delta)
        + s.pack(">II", 4, 4)
    )
    new = bytearray(bytes(enc[:j]) + t1 + t2 + bytes(enc[j + old_size :]))
    for btype in (b"traf", b"moof"):
        k = bytes(new).index(btype) - 4
        (sz,) = s.unpack_from(">I", new, k)
        s.pack_into(">I", new, k, sz + delta)
    assert mp4.extract_samples(bytes(new)) == samples


def test_fragmented_explicit_base_data_offset():
    """tfhd with an explicit base-data-offset overrides default-base-is-
    moof; re-point the base at the mdat payload directly."""
    import struct as s

    samples = [b"qqqq", b"rrrr"]
    enc = bytearray(mp4.encode_mp4_fragmented(samples, samples_per_fragment=2))
    i = bytes(enc).index(b"tfhd") - 4
    moof_pos = bytes(enc).index(b"moof") - 4
    (moof_size,) = s.unpack_from(">I", enc, moof_pos)
    (old_size,) = s.unpack_from(">I", enc, i)
    new_tfhd_len = 8 + 4 + 4 + 8
    delta = new_tfhd_len - old_size  # moof grows; mdat shifts by delta
    # base = 8 past the (shifted) mdat payload start; trun offset -8 below
    mdat_payload_abs = moof_pos + moof_size + delta + 8 + 8
    # new tfhd: flags 0x1 (base-data-offset present)
    new_tfhd = (
        s.pack(">I", new_tfhd_len) + b"tfhd"
        + b"\x00" + (0x000001).to_bytes(3, "big")
        + s.pack(">I", 1) + s.pack(">Q", mdat_payload_abs)
    )
    # and the trun data_offset becomes -8 relative to that base
    new = bytearray(bytes(enc[:i]) + new_tfhd + bytes(enc[i + old_size :]))
    j = bytes(new).index(b"trun") - 4
    s.pack_into(">i", new, j + 16, -8)
    for btype in (b"traf", b"moof"):
        k = bytes(new).index(btype) - 4
        (sz,) = s.unpack_from(">I", new, k)
        s.pack_into(">I", new, k, sz + delta)
    assert mp4.extract_samples(bytes(new)) == samples


def test_fragmented_hostile_trun_count_cannot_oom():
    import struct as s

    enc = bytearray(mp4.encode_mp4_fragmented([b"aaaa", b"bbbb"]))
    j = bytes(enc).index(b"trun") - 4
    s.pack_into(">I", enc, j + 12, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="exceeds"):
        mp4.parse_mp4(bytes(enc))


def test_fragmented_trun_without_sizes_or_defaults_raises():
    import struct as s

    enc = bytearray(mp4.encode_mp4_fragmented([b"aaaa", b"bbbb"]))
    # zero out trex default AND strip the per-sample-size flag
    i = bytes(enc).index(b"trex") - 4
    s.pack_into(">I", enc, i + 8 + 4 + 4 + 4 + 4, 0)
    j = bytes(enc).index(b"trun") - 4
    enc[j + 8 : j + 12] = b"\x00\x00\x00\x01"  # flags: data_offset only
    with pytest.raises(ValueError, match="default|exceeds|corrupt"):
        mp4.parse_mp4(bytes(enc))


def test_stss_sync_samples_and_extraction():
    samples = [bytes([65 + i]) * (4 + i) for i in range(7)]
    enc = mp4.encode_mp4(samples, sync_every=3)
    t = mp4.parse_mp4(enc)["tracks"][0]
    assert t["sync_samples"] == [1, 4, 7]
    assert mp4.extract_sync_samples(enc) == [samples[0], samples[3], samples[6]]
    # no stss: every sample is sync (§8.6.2 default)
    enc2 = mp4.encode_mp4(samples)
    assert mp4.parse_mp4(enc2)["tracks"][0]["sync_samples"] is None
    assert mp4.extract_sync_samples(enc2) == samples


def test_fragmented_sync_flags_keyframe_per_fragment():
    """first_sample_flags (sync) + non-sync tfhd default — the CMAF
    keyframe-per-fragment pattern — must resolve to fragment-first
    sample numbers."""
    samples = [bytes([65 + i]) * (4 + i) for i in range(7)]
    enc = mp4.encode_mp4_fragmented(
        samples, samples_per_fragment=2, sync_first_of_fragment=True
    )
    t = mp4.parse_mp4(enc)["tracks"][0]
    assert t["sync_samples"] == [1, 3, 5, 7]
    assert mp4.extract_sync_samples(enc) == [samples[i] for i in (0, 2, 4, 6)]
    assert mp4.extract_samples(enc) == samples  # full extraction unchanged
    # without flag info, fragmented tracks default to all-sync too
    enc2 = mp4.encode_mp4_fragmented(samples, samples_per_fragment=3)
    assert mp4.parse_mp4(enc2)["tracks"][0]["sync_samples"] is None


def test_sample_timestamps_and_time_range_extraction():
    samples = [bytes([65 + i]) * 4 for i in range(10)]  # 40ms @ timescale 1000
    for enc in (
        mp4.encode_mp4(samples, sync_every=3),
        mp4.encode_mp4_fragmented(
            samples, samples_per_fragment=3, sync_first_of_fragment=True
        ),
    ):
        t = mp4.parse_mp4(enc)["tracks"][0]
        assert t["timescale"] == 1000
        assert t["sample_times"] == [i * 40 for i in range(10)]
        assert t["sample_durations"] == [40] * 10
        # [0.08, 0.2) overlaps frames 2..4 in both layouts
        assert mp4.extract_time_range(enc, 0.08, 0.2) == samples[2:5]
        # sync alignment (keyframes at samples 1,4,7,10) extends to frame 0
        assert mp4.extract_time_range(enc, 0.08, 0.2, align_sync=True) == samples[0:5]
    enc = mp4.encode_mp4(samples, sync_every=3)
    assert mp4.extract_time_range(enc, 5.0, 6.0) == []
    with pytest.raises(ValueError, match="empty time range"):
        mp4.extract_time_range(enc, 0.2, 0.1)


def test_hostile_stts_total_cannot_oom():
    enc = bytearray(mp4.encode_mp4([b"aaaa", b"bbbb"]))
    i = bytes(enc).index(b"stts") - 4
    # one run claiming 0xFFFFFFFF samples must raise, not expand
    struct.pack_into(">I", enc, i + 8 + 4 + 4, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="exceeds"):
        mp4.parse_mp4(bytes(enc))


def test_tfdt_seek_started_stream_times():
    """ADVICE r13: fragmented tracks must honor tfdt baseMediaDecodeTime —
    a seek-started/live-join stream's first fragment is NOT at decode time
    zero, and extract_time_range must select samples on the tfdt timeline."""
    samples = [bytes([65 + i]) * 4 for i in range(6)]  # 40ms @ 1000
    enc = mp4.encode_mp4_fragmented(
        samples, samples_per_fragment=3, emit_tfdt=True, decode_time_base=10_000
    )
    t = mp4.parse_mp4(enc)["tracks"][0]
    assert t["sample_times"] == [10_000 + i * 40 for i in range(6)]
    # samples live at 10.0s..10.24s now; a 0-.24s window picks nothing
    assert mp4.extract_time_range(enc, 0.0, 0.24) == []
    assert mp4.extract_time_range(enc, 10.08, 10.2) == samples[2:5]


def test_tfdt_non_contiguous_fragments():
    """Sparse fMP4: patch the second fragment's tfdt to introduce a decode
    gap; per-sample times must jump with it (no zero-based accumulation)."""
    import struct as s

    samples = [bytes([65 + i]) * 4 for i in range(6)]
    enc = bytearray(
        mp4.encode_mp4_fragmented(samples, samples_per_fragment=3, emit_tfdt=True)
    )
    # second tfdt (version 1 -> u64 at body+4)
    first = bytes(enc).index(b"tfdt")
    second = bytes(enc).index(b"tfdt", first + 4)
    s.pack_into(">Q", enc, second + 4 + 4, 5_000)  # gap: 120 -> 5000
    t = mp4.parse_mp4(bytes(enc))["tracks"][0]
    assert t["sample_times"] == [0, 40, 80, 5_000, 5_040, 5_080]
    assert mp4.extract_time_range(bytes(enc), 4.99, 5.07) == samples[3:5]
    # the gap itself holds no samples
    assert mp4.extract_time_range(bytes(enc), 0.2, 4.9) == []


def test_tfdt_default_muxer_output_unchanged():
    """emit_tfdt defaults off: pre-r14 fixtures stay byte-identical and the
    no-tfdt path still accumulates from zero."""
    samples = [b"aaaa", b"bbbb", b"cccc"]
    enc = mp4.encode_mp4_fragmented(samples, samples_per_fragment=2)
    assert b"tfdt" not in enc
    t = mp4.parse_mp4(enc)["tracks"][0]
    assert t["sample_times"] == [0, 40, 80]
