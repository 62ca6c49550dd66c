"""PNG codec from scratch (stdlib only): encode + decode.

Covers the ISO/W3C PNG spec's non-interlaced storage layouts: 8-bit
grayscale (color type 0), RGB (2), indexed-color at 1/2/4/8-bit depth with
PLTE + optional tRNS per-index alpha (3), gray+alpha (4), and RGBA (6) —
chunk walk with CRC32 verification, bounded zlib IDAT inflate, the five
scanline filters (§9.2 reconstruction functions), sub-byte index unpacking
(§7.2 MSB-first), palette mapping. 16-bit samples and Adam7 interlace are
deliberate ``NotImplementedError`` boundaries.

Split out of ``operators/multimodal.py`` (which re-exports the public
names) so Spark closures can register THIS stdlib-only module with
cloudpickle's pickle-by-value — executors need no repo PYTHONPATH, the
same shipping contract as ``operators/jpeg.py``.

Reference parity note: the reference engine (tesseract-olap) has no image
codecs at all — this is extension surface for the multimodal pipeline
tier (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import struct


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to the
    linear estimate a+b-c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_stream(
    scanlines: list[bytes], bpp: int, filter_cycle: bool
) -> bytes:
    """Apply the spec's scanline filters to pre-built scanlines (one bytes
    object per row, all the same stride). With ``filter_cycle`` row y uses
    filter type ``y % 5`` so a tall image exercises every filter
    (None/Sub/Up/Average/Paeth) and the decoder's reconstruction is
    genuinely load-bearing. ``bpp`` is the filter byte distance — the
    per-pixel byte count (§9.2: "bpp is defined as the number of bytes per
    complete pixel, rounding up to one" — so 1 for sub-byte palette rows)."""
    raw = bytearray()
    stride = len(scanlines[0]) if scanlines else 0
    prior = bytes(stride)
    for y, row in enumerate(scanlines):
        ft = (y % 5) if filter_cycle else 0
        raw.append(ft)
        if ft == 0:
            raw += row
        else:
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                up = prior[x]
                ul = prior[x - bpp] if x >= bpp else 0
                pred = (
                    left if ft == 1
                    else up if ft == 2
                    else (left + up) >> 1 if ft == 3
                    else _paeth(left, up, ul)
                )  # fmt: skip
                raw.append((row[x] - pred) & 0xFF)
        prior = row
    return bytes(raw)


def _png_assemble(
    width: int,
    height: int,
    depth: int,
    color_type: int,
    raw: bytes,
    extra_chunks: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    import zlib

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    )
    for ctype, data in extra_chunks or []:
        out += _png_chunk(ctype, data)
    out += _png_chunk(b"IDAT", zlib.compress(raw))
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def encode_png_gray(
    pixels: bytes, width: int, height: int, filter_cycle: bool = True
) -> bytes:
    """Build a REAL non-interlaced 8-bit grayscale PNG (color type 0) from a
    row-major byte grid: signature, IHDR, one zlib-compressed IDAT, IEND —
    each chunk CRC32-stamped; the round-trip is the identity.
    Inverse of :func:`decode_png`."""
    assert len(pixels) >= width * height
    rows = [pixels[y * width : (y + 1) * width] for y in range(height)]
    raw = _png_filter_stream(rows, 1, filter_cycle)
    return _png_assemble(width, height, 8, 0, raw)


def encode_png_palette(
    indices: bytes,
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    trans: bytes | None = None,
    depth: int = 8,
    filter_cycle: bool = True,
) -> bytes:
    """Build a REAL indexed-color PNG (color type 3, §4.1.2/§11.2.3): PLTE
    carries the RGB palette, optional tRNS carries per-index alpha (may be
    shorter than the palette — missing entries are opaque), and the IDAT
    scanlines pack one index per pixel at ``depth`` bits (1/2/4/8, MSB
    first, rows padded to a byte boundary per §7.2). ``indices`` is the
    row-major top-down index grid, one byte per pixel regardless of depth
    (values must fit the depth). Inverse of :func:`decode_png`."""
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"palette bit depth must be 1/2/4/8, got {depth}")
    if not 1 <= len(palette) <= 256:
        raise ValueError("palette must have 1..256 entries")
    assert len(indices) >= width * height
    used = indices[: width * height]
    # validate at ENCODE time: an out-of-palette index would otherwise
    # produce a structurally valid PNG this module's own decoder rejects,
    # breaking the documented round-trip-is-the-identity contract
    if used and max(used) >= len(palette):
        raise ValueError(
            f"index {max(used)} exceeds the {len(palette)}-entry palette"
        )
    rows: list[bytes] = []
    for y in range(height):
        row = indices[y * width : (y + 1) * width]
        if depth == 8:
            rows.append(row)
            continue
        per = 8 // depth
        packed = bytearray()
        for x0 in range(0, width, per):
            b = 0
            for k in range(per):
                v = row[x0 + k] if x0 + k < width else 0
                if v >= (1 << depth):
                    raise ValueError(f"index {v} exceeds {depth}-bit depth")
                b = (b << depth) | v
            packed.append(b)
        rows.append(bytes(packed))
    raw = _png_filter_stream(rows, 1, filter_cycle)
    extra: list[tuple[bytes, bytes]] = [
        (b"PLTE", b"".join(bytes(rgb) for rgb in palette))
    ]
    if trans is not None:
        extra.append((b"tRNS", bytes(trans)))
    return _png_assemble(width, height, depth, 3, raw, extra)


def encode_png_rgba(
    pixels: bytes, width: int, height: int, filter_cycle: bool = True
) -> bytes:
    """Build a REAL 8-bit RGBA PNG (color type 6) from a row-major RGBA
    byte stream (4 bytes per pixel). Inverse of :func:`decode_png` (which
    returns the RGB plane plus the alpha plane)."""
    assert len(pixels) >= width * height * 4
    rows = [pixels[y * width * 4 : (y + 1) * width * 4] for y in range(height)]
    raw = _png_filter_stream(rows, 4, filter_cycle)
    return _png_assemble(width, height, 8, 6, raw)


def encode_png_gray_alpha(
    pixels: bytes, width: int, height: int, filter_cycle: bool = True
) -> bytes:
    """Build a REAL 8-bit gray+alpha PNG (color type 4) from a row-major
    (gray, alpha) byte stream (2 bytes per pixel)."""
    assert len(pixels) >= width * height * 2
    rows = [pixels[y * width * 2 : (y + 1) * width * 2] for y in range(height)]
    raw = _png_filter_stream(rows, 2, filter_cycle)
    return _png_assemble(width, height, 8, 4, raw)


def decode_png(payload: bytes) -> dict:
    """Parse a non-interlaced 8-bit gray/RGB/gray+alpha/RGBA PNG — or an
    indexed-color (type 3) PNG at 1/2/4/8-bit depth with PLTE lookup and
    optional tRNS per-index alpha — with the stdlib only: chunk walk with
    CRC32 verification, bounded zlib-inflated IDAT stream, full scanline
    defiltering (None/Sub/Up/Average/Paeth per the spec's reconstruction
    functions), sub-byte index unpacking (§7.2 MSB-first packing), palette
    mapping. Emits a top-down row-major RGB stream (gray tripled, palette
    looked up, alpha split off), matching :func:`decode_bmp`'s output
    contract; when the source carries alpha (types 4/6, or type 3 + tRNS)
    the result also has an ``"alpha"`` byte plane (else ``None``).
    16-bit and Adam7-interlaced PNGs raise ``NotImplementedError`` —
    honest boundaries, not silently wrong pixels (interlace is a storage
    reordering a crawl pipeline can re-press; 16-bit needs a widened
    output contract)."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if len(data) % 3 or not 3 <= len(data) <= 768:
                raise ValueError(f"PLTE length {len(data)} invalid")
            plte = data
        elif ctype == b"tRNS":
            trns = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if ctype_n not in (0, 2, 3, 4, 6):
        raise ValueError(f"PNG color type {ctype_n} invalid")
    if ctype_n == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"palette PNG bit depth {depth} invalid")
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        if trns is not None and len(trns) > len(plte) // 3:
            raise ValueError("tRNS longer than palette")
    elif depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG unsupported (8 only)")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype_n]
    if ctype_n == 3:
        stride = (width * depth + 7) // 8
        bpp = 1  # §9.2: filter distance rounds sub-byte pixels up to 1
    else:
        stride = width * channels
        bpp = channels
    expected = height * (stride + 1)
    # allocation-bomb guard: deflate's maximum expansion is ~1032:1, so a
    # small IDAT claiming a huge IHDR geometry is provably corrupt — check
    # BEFORE inflating rather than letting a crafted stream demand GBs
    if expected > len(idat) * 1100 + 65536:
        raise ValueError(
            f"frame geometry implausible: {expected} raw bytes declared "
            f"but only {len(idat)} compressed bytes present"
        )
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or (d.unconsumed_tail or d.decompress(b"", 1)):
        raise ValueError("PNG IDAT length mismatch")
    out = bytearray()
    alpha = bytearray()
    has_alpha = ctype_n in (4, 6) or trns is not None
    # §11.3.2: on gray/RGB frames tRNS is a COLOR KEY — one 2-byte sample
    # per channel; matching pixels are fully transparent. Dropping it
    # silently would lose transparency (r14 review), so decode it.
    key_gray = key_rgb = None
    if trns is not None and ctype_n == 0:
        if len(trns) != 2:
            raise ValueError("tRNS on a grayscale PNG must be 2 bytes")
        key_gray = struct.unpack(">H", trns)[0]
    elif trns is not None and ctype_n == 2:
        if len(trns) != 6:
            raise ValueError("tRNS on an RGB PNG must be 6 bytes")
        key_rgb = struct.unpack(">HHH", trns)
    elif trns is not None and ctype_n in (4, 6):
        raise ValueError(f"tRNS is invalid on color type {ctype_n}")
    npal = len(plte) // 3 if plte else 0
    prior = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        recon = bytearray(stride)
        for x in range(stride):
            left = recon[x - bpp] if x >= bpp else 0
            up = prior[x]
            ul = prior[x - bpp] if x >= bpp else 0
            if ft == 0:
                v = line[x]
            elif ft == 1:
                v = line[x] + left
            elif ft == 2:
                v = line[x] + up
            elif ft == 3:
                v = line[x] + ((left + up) >> 1)
            elif ft == 4:
                v = line[x] + _paeth(left, up, ul)
            else:
                raise ValueError(f"PNG scanline filter {ft} invalid")
            recon[x] = v & 0xFF
        prior = bytes(recon)
        if ctype_n == 0:
            out += b"".join(bytes((g, g, g)) for g in recon)
            if key_gray is not None:
                alpha += bytes(0 if g == key_gray else 255 for g in recon)
        elif ctype_n == 2:
            out += recon
            if key_rgb is not None:
                alpha += bytes(
                    0
                    if (recon[x], recon[x + 1], recon[x + 2]) == key_rgb
                    else 255
                    for x in range(0, stride, 3)
                )
        elif ctype_n == 3:
            if depth == 8:
                idxs = recon
            else:
                per = 8 // depth
                mask = (1 << depth) - 1
                idxs = bytearray()
                for b in recon:
                    for k in range(per - 1, -1, -1):
                        idxs.append((b >> (k * depth)) & mask)
                idxs = idxs[:width]  # drop pad bits past the row edge
            for i in idxs:
                if i >= npal:
                    raise ValueError(f"palette index {i} >= {npal} entries")
                out += plte[i * 3 : i * 3 + 3]
                if has_alpha:
                    alpha.append(trns[i] if i < len(trns) else 255)
        elif ctype_n == 4:
            for x in range(0, stride, 2):
                g = recon[x]
                out += bytes((g, g, g))
                alpha.append(recon[x + 1])
        else:  # 6: RGBA
            for x in range(0, stride, 4):
                out += recon[x : x + 3]
                alpha.append(recon[x + 3])
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": bytes(out),
        "alpha": bytes(alpha) if has_alpha else None,
    }
