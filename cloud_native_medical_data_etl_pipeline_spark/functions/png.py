"""Minimal pure-Python PNG codec (stdlib zlib + struct only).

Closes the multimodal decode seam without native codec libraries: a
real, spec-conformant decoder for the common non-interlaced 8-bit
cases (grayscale, gray+alpha, RGB, RGBA) and a matching encoder for
fixtures and resize output. PNG is the one mainstream image format
whose compression layer is plain DEFLATE, so the whole codec fits in
the stdlib — exactly what a hermetic Spark executor image can carry.

Decoder scope (raises ValueError outside it): bit depth 8, color
types 0/2/4/6, interlace 0. Filters 0-4 (None/Sub/Up/Average/Paeth)
are fully implemented — they appear in real-world encoder output and
are NOT optional. Ancillary chunks are skipped; IDAT may span chunks.

Used by operators/multimodal.py `fake=False` paths; runs inside
mapInPandas workers, so it must stay import-light (stdlib only).
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel (bit depth 8 => bytes per pixel)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG byte string to (width, height, channels, pixels).

    `pixels` is the raw unfiltered scanline data: height * width *
    channels bytes, row-major, 8 bits per sample.
    """
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        pos += 12 + length  # skip CRC; integrity is the transport's job
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNGs not supported")
            if comp != 0 or filt != 0:
                raise ValueError("non-standard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            seen_end = True
            break
    if width < 0:
        raise ValueError("missing IHDR")
    if not seen_end:
        raise ValueError("missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"decompressed size {len(raw)} != expected {height * (stride + 1)}"
        )
    return width, height, channels, _unfilter(raw, height, stride, channels)


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytes:
    """Undo per-scanline filters (PNG spec 9.2). Sequential in x for
    Sub/Average/Paeth by definition — each byte depends on the
    already-reconstructed left neighbor."""
    out = bytearray(height * stride)
    prev_off = -stride
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                out[off + x] = (line[x] + a) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                b = out[prev_off + off + x] if y else 0
                out[off + x] = (line[x] + b) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + off + x] if y else 0
                out[off + x] = (line[x] + (a + b) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = out[off + x - bpp] if x >= bpp else 0
                b = out[prev_off + off + x] if y else 0
                c = out[prev_off + off + x - bpp] if (y and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                out[off + x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype} on row {y}")
    return bytes(out)


def encode(pixels: bytes, width: int, height: int, channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels to a valid PNG (filter 0 on every row —
    simplest conformant stream; any spec decoder reads it)."""
    if channels not in (1, 2, 3, 4):
        raise ValueError(f"channels must be 1-4, got {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError(
            f"pixel buffer {len(pixels)} != {height}x{width}x{channels}"
        )
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    new_width: int,
    new_height: int,
) -> bytes:
    """Nearest-neighbor resample (the deterministic choice — no
    filter-kernel float math to diverge across platforms)."""
    src_stride = width * channels
    out = bytearray(new_height * new_width * channels)
    o = 0
    for y in range(new_height):
        sy = min(y * height // new_height, height - 1)
        row = sy * src_stride
        for x in range(new_width):
            sx = min(x * width // new_width, width - 1)
            px = row + sx * channels
            out[o : o + channels] = pixels[px : px + channels]
            o += channels
    return bytes(out)
