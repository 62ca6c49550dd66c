"""Progressive JPEG (SOF2, T.81 Annex G) — decoder + fixture encoders.

The strongest assertion available without an image library: the
progressive and sequential encoders quantize through the SAME DCT/round
path, so if the progressive entropy coding (spectral selection bands,
successive-approximation point transforms, EOB-run accumulation,
G.1.2.3 correction bits) round-trips losslessly, decoding the
progressive file must be BIT-IDENTICAL to decoding the baseline file of
the same image. Every test here pins that identity on a fixture class
chosen to force a specific decoder path; the q_image_jpeg_progressive
catalog entry hash-gates the exact constant-block subclass end-to-end
through Spark vs the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pytest

from tesseract_spark.operators import jpeg


def _decode(payload: bytes, h: int, w: int) -> np.ndarray:
    d = jpeg.decode_jpeg(payload)
    assert (d["height"], d["width"]) == (h, w)
    return np.frombuffer(d["pixels"], np.uint8).reshape(h, w, 3)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _smooth(h: int, w: int) -> np.ndarray:
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 3 * np.pi, h)
    return (127 + 100 * np.outer(np.sin(y), np.cos(x))).astype(np.uint8)


def test_gray_matches_baseline_bit_exact_across_fixture_classes():
    """Noise (dense coefficients -> ZRL + refinement traffic), smooth
    gradients (sparse bands), and flat fields (pure EOB runs), at two
    qualities each, odd and even dimensions."""
    rng = np.random.default_rng(7)
    for trial in range(9):
        h, w = int(rng.integers(9, 70)), int(rng.integers(9, 70))
        kind = trial % 3
        if kind == 0:
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        elif kind == 1:
            img = _smooth(h, w)
        else:
            img = np.full((h, w), int(rng.integers(0, 256)), np.uint8)
        for quality in (50, 85):
            base = _decode(jpeg.encode_jpeg_gray(img, quality=quality), h, w)
            prog = _decode(
                jpeg.encode_jpeg_progressive_gray(img, quality=quality), h, w
            )
            assert np.array_equal(base, prog), (h, w, kind, quality)
            # identity with baseline is the real gate; the floor only
            # guards against "identical garbage" (noise at q50 sits ~23dB)
            assert _psnr(img, prog[:, :, 0]) > (20.0 if kind == 0 else 28.0)


def test_spectral_selection_only_script():
    """No successive approximation (Ah=Al=0 everywhere) — pure band
    splitting must already reproduce the baseline decode."""
    img = _smooth(24, 41)
    scans = [(0, 0, 0, 0), (1, 10, 0, 0), (11, 63, 0, 0)]
    prog = _decode(
        jpeg.encode_jpeg_progressive_gray(img, quality=80, scans=scans), 24, 41
    )
    base = _decode(jpeg.encode_jpeg_gray(img, quality=80), 24, 41)
    assert np.array_equal(prog, base)


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    plain = _decode(jpeg.encode_jpeg_progressive_gray(img, quality=80), 24, 40)
    rst = _decode(
        jpeg.encode_jpeg_progressive_gray(img, quality=80, restart_interval=3),
        24,
        40,
    )
    assert np.array_equal(plain, rst)


def test_long_eob_runs_with_refinement_correction_rides():
    """A mostly-flat image with one busy corner: AC-first scans skip long
    block runs through a single EOBn symbol, and refinement scans carry
    the covered blocks' correction bits behind the EOBn — the two decoder
    paths a per-block-EOB encoder would never reach."""
    img = np.full((80, 96), 130, np.uint8)  # 120 blocks
    img[:8, :8] = _smooth(8, 8)
    base = _decode(jpeg.encode_jpeg_gray(img, quality=85), 80, 96)
    prog = _decode(jpeg.encode_jpeg_progressive_gray(img, quality=85), 80, 96)
    assert np.array_equal(base, prog)
    # and a fully-flat field: the whole scan is one EOB run per band
    flat = np.full((64, 64), 200, np.uint8)
    assert np.array_equal(
        _decode(jpeg.encode_jpeg_gray(flat, quality=85), 64, 64),
        _decode(jpeg.encode_jpeg_progressive_gray(flat, quality=85), 64, 64),
    )


def test_constant_block_subclass_is_exact():
    """Same exactness argument as the baseline oracle entry: constant 8x8
    blocks are DC-only, quant step 8 divides 8*(c-128), so the decoded
    gray equals the source bytes exactly — through ALL progressive scan
    kinds including both refinement passes."""
    vals = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20 + 8
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    q8 = np.full((8, 8), 8, dtype=np.int32)
    dec = _decode(jpeg.encode_jpeg_progressive_gray(img, quant=q8), 24, 32)
    assert np.array_equal(dec[:, :, 0], img)
    assert np.array_equal(dec[:, :, 0], dec[:, :, 1])


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:0"])
def test_color_matches_baseline_bit_exact(subsample):
    """Interleaved DC scans (MCU component ordering) + per-component AC
    scans over the component's own block grid — including the 4:2:0 case
    where the luma AC grid is smaller than the padded MCU grid."""
    img = _smooth(40, 56)
    rgb = np.stack([img, img[::-1], 255 - img], 2)
    base = _decode(jpeg.encode_jpeg_color(rgb, quality=85, subsample=subsample), 40, 56)
    prog = _decode(
        jpeg.encode_jpeg_progressive_color(rgb, quality=85, subsample=subsample),
        40,
        56,
    )
    assert np.array_equal(base, prog)


def test_decode_media_dispatches_progressive():
    from tesseract_spark.operators.multimodal import decode_media

    img = _smooth(16, 16)
    out = decode_media(jpeg.encode_jpeg_progressive_gray(img, quality=85), "img.jpg")
    assert out["width"] == 16 and out["height"] == 16
    assert len(out["pixels"]) == 16 * 16 * 3


def test_invalid_scan_scripts_raise():
    img = _smooth(16, 16)
    enc = bytearray(jpeg.encode_jpeg_progressive_gray(img, quality=85))
    # SOS layout: FFDA(2) len(2) ns(1) [cs,tabs]*ns Ss Se AhAl — corrupt
    # the first scan's band to Ss > Se
    i = bytes(enc).index(b"\xff\xda")
    assert enc[i + 4] == 1  # component count
    enc[i + 7] = 40  # Ss
    enc[i + 8] = 10  # Se < Ss
    with pytest.raises(ValueError, match="spectral band|corrupt"):
        jpeg.decode_jpeg(bytes(enc))

    # a DC scan claiming an AC band (Ss=0, Se!=0) is illegal
    enc1 = bytearray(jpeg.encode_jpeg_progressive_gray(img, quality=85))
    enc1[i + 8] = 40  # Se on the DC-first scan
    with pytest.raises(ValueError, match="DC-only|corrupt"):
        jpeg.decode_jpeg(bytes(enc1))

    # multi-component AC scan is illegal (A.2.2)
    colorimg = np.stack([img] * 3, 2)
    enc2 = bytearray(jpeg.encode_jpeg_progressive_color(colorimg, quality=85))
    # first SOS in the color script is the interleaved DC scan (3 comps);
    # make it claim an AC band instead
    j = bytes(enc2).index(b"\xff\xda")
    assert enc2[j + 4] == 3
    enc2[j + 11] = 1  # Ss
    enc2[j + 12] = 5  # Se
    with pytest.raises(ValueError, match="single-component|DC-only|corrupt"):
        jpeg.decode_jpeg(bytes(enc2))


def test_progressive_geometry_bomb_rejected():
    """Same allocation-bomb guard as the sequential path: hostile SOF2
    dimensions over a tiny payload raise ValueError before the
    coefficient-state allocation."""
    import struct

    enc = bytearray(jpeg.encode_jpeg_progressive_gray(_smooth(16, 16)))
    i = bytes(enc).index(b"\xff\xc2")
    struct.pack_into(">HH", enc, i + 5, 65535, 65535)
    with pytest.raises(ValueError, match="implausible"):
        jpeg.decode_jpeg(bytes(enc))


def test_random_scan_scripts_match_baseline():
    """Property fuzz over the scan-script space: random spectral band
    splits (including single-coefficient bands) and random
    successive-approximation depth per region, always ending at Al=0 —
    every valid script must decode bit-identically to the baseline
    decode of the same image (shared quantize path, lossless entropy)."""
    rng = np.random.default_rng(23)
    for trial in range(12):
        h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
        img = (
            rng.integers(0, 256, (h, w)).astype(np.uint8)
            if trial % 2
            else _smooth(h, w)
        )
        # random AC band split of 1..63
        cuts = sorted(
            set(rng.integers(2, 63, size=int(rng.integers(0, 4))).tolist())
        )
        bounds = [1] + cuts + [64]
        bands = [(bounds[i], bounds[i + 1] - 1) for i in range(len(bounds) - 1)]
        dc_al = int(rng.integers(0, 3))
        scans = [(0, 0, 0, dc_al)]
        for ss, se in bands:
            al = int(rng.integers(0, 3))
            scans.append((ss, se, 0, al))
            for a in range(al, 0, -1):  # refinement chain down to 0
                scans.append((ss, se, a, a - 1))
        for a in range(dc_al, 0, -1):
            scans.append((0, 0, a, a - 1))
        quality = int(rng.integers(40, 96))
        prog = _decode(
            jpeg.encode_jpeg_progressive_gray(img, quality=quality, scans=scans),
            h,
            w,
        )
        base = _decode(jpeg.encode_jpeg_gray(img, quality=quality), h, w)
        assert np.array_equal(prog, base), (trial, h, w, quality, scans)


def test_truncated_before_eoi_raises():
    """ADVICE r13: a progressive stream cut exactly at a marker boundary
    (valid scans decoded, EOI missing) must raise, not return a
    plausible-but-incomplete reconstruction."""
    img = _smooth(16, 16)
    enc = jpeg.encode_jpeg_progressive_gray(img)
    assert enc[-2:] == b"\xff\xd9"
    _decode(enc, 16, 16)  # sanity: intact stream decodes
    with pytest.raises(ValueError, match="truncated before EOI"):
        jpeg.decode_jpeg(enc[:-2])


def test_truncated_at_scan_boundary_raises():
    """Cut the stream at the LAST SOS marker: every earlier scan decoded
    cleanly, so pre-fix the decoder happily reconstructed a partial image."""
    img = _smooth(16, 16)
    enc = jpeg.encode_jpeg_progressive_gray(img)
    idx = enc.rfind(b"\xff\xda")
    assert idx > 0
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(enc[:idx])


def test_ac_refine_run_past_band_raises():
    """ADVICE r13: in an AC-refinement scan, a newly-significant
    coefficient whose zero-history run lands past Se is the same
    corruption class ac_first rejects — hand-build the hostile scan."""
    import struct as s

    q = np.full((8, 8), 8, dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    out += jpeg._seg(0xFFDB, jpeg._dqt_payload(0, q))
    # SOF2: 8-bit, 8x8, 1 component (id 1, 1x1 sampling, quant 0)
    out += jpeg._seg(0xFFC2, s.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table: single symbol = category 0 (code '0')
    dc_bits, dc_vals = [1] + [0] * 15, [0]
    out += jpeg._seg(0xFFC4, jpeg._dht_payload(0, 0, dc_bits, dc_vals))
    # AC table: single symbol 0x51 = run 5, size 1 (code '0')
    ac_bits, ac_vals = [1] + [0] * 15, [0x51]
    out += jpeg._seg(0xFFC4, jpeg._dht_payload(1, 0, ac_bits, ac_vals))
    # scan 1: DC first (Ss=0, Se=0, Ah=0, Al=1) — one block, diff=0
    out += jpeg._sos_header([(1, 0, 0)], 0, 0, 0, 1)
    bw = jpeg._BitWriter()
    bw.write(0, 1)  # DC category 0
    bw.flush()
    out += bw.buf
    # scan 2: AC refinement (Ss=1, Se=5, Ah=1, Al=0) — symbol 0x51 says
    # "skip 5 zero-history coefficients then place a +/-1", but positions
    # 1..5 are ALL zero-history, so the landing position is 6 > Se
    out += jpeg._sos_header([(1, 0, 0)], 1, 5, 1, 0)
    bw = jpeg._BitWriter()
    bw.write(0, 1)  # huffman code for 0x51
    bw.write(1, 1)  # sign bit -> newval = +1
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="AC run past spectral band"):
        jpeg.decode_jpeg(bytes(out))
