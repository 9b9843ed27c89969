"""Pure-stdlib PNG codec + real multimodal decode path."""

import struct
import zlib

import pytest

from cloud_native_medical_data_etl_pipeline_spark.functions import png


def _gradient(width, height, channels):
    return bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(height)
        for x in range(width)
        for c in range(channels)
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_color_types(channels):
    px = _gradient(5, 4, channels)
    data = png.encode(px, 5, 4, channels)
    w, h, ch, out = png.decode(data)
    assert (w, h, ch) == (5, 4, channels)
    assert out == px


def _forward_filter(pixels, width, height, bpp, ftypes):
    """Independent forward implementation of PNG filters (spec 9.2) —
    the test-side inverse of the decoder's unfilter."""
    stride = width * bpp
    raw = bytearray()
    for y, ftype in enumerate(ftypes):
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
        raw.append(ftype)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((row[x] - pred) & 0xFF)
    return bytes(raw)


def _chunk(ctype, body):
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


@pytest.mark.parametrize("channels", [1, 3])
def test_decode_reconstructs_every_filter_type(channels):
    # 5 rows, one per filter type, filtered by an independent forward
    # implementation — exercises Sub/Up/Average/Paeth reconstruction,
    # not just the encoder's filter-0 stream
    w, h = 6, 5
    px = _gradient(w, h, channels)
    raw = _forward_filter(px, w, h, channels, ftypes=[0, 1, 2, 3, 4])
    color = {1: 0, 3: 2}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert png.decode(data) == (w, h, channels, px)


def test_decode_handles_split_idat_and_skips_ancillary():
    px = _gradient(4, 4, 1)
    full = png.encode(px, 4, 4, 1)
    # rebuild with the IDAT split in two and a tEXt chunk in between
    sig, rest = full[:8], full[8:]
    (ihdr_len,) = struct.unpack(">I", rest[:4])
    ihdr = rest[: 12 + ihdr_len]
    rest = rest[12 + ihdr_len :]
    (idat_len,) = struct.unpack(">I", rest[:4])
    idat_body = rest[8 : 8 + idat_len]
    data = (
        sig
        + ihdr
        + _chunk(b"IDAT", idat_body[:3])
        + _chunk(b"tEXt", b"k\x00v")
        + _chunk(b"IDAT", idat_body[3:])
        + _chunk(b"IEND", b"")
    )
    assert png.decode(data) == (4, 4, 1, px)


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        png.decode(b"not a png at all")
    px = _gradient(3, 3, 1)
    data = bytearray(png.encode(px, 3, 3, 1))
    # flip bit depth byte in IHDR (offset: 8 sig + 8 hdr + 8 w/h)
    data[8 + 8 + 8] = 16
    with pytest.raises(ValueError, match="bit depth"):
        png.decode(bytes(data))


def test_resize_nearest_exact():
    # 4x4 grayscale quadrants -> 2x2 picks the top-left of each block
    px = bytes(
        [10, 10, 20, 20,
         10, 10, 20, 20,
         30, 30, 40, 40,
         30, 30, 40, 40]
    )
    assert png.resize_nearest(px, 4, 4, 1, 2, 2) == bytes([10, 20, 30, 40])
    # upscale replicates
    assert png.resize_nearest(bytes([1, 2]), 2, 1, 1, 4, 1) == bytes([1, 1, 2, 2])


def test_decode_features_real_png(spark):
    # fake=False runs the REAL decoder inside mapInPandas: features
    # must be bucket statistics over DECODED pixels (bucket sum /
    # total pixels, the same normalization as the fake path), not
    # over the compressed payload bytes
    from cloud_native_medical_data_etl_pipeline_spark.operators import multimodal

    px1 = _gradient(8, 8, 1)
    px2 = bytes([255] * 64)
    rows = [(1, png.encode(px1, 8, 8, 1)), (2, png.encode(px2, 8, 8, 1))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: r
        for r in multimodal.decode_features(df, dim=4, fake=False).collect()
    }
    assert out[2]["n_bytes"] == 64
    assert out[2]["byte_mean"] == 255.0
    assert out[2]["feature"] == [63.75, 63.75, 63.75, 63.75]  # 16*255/64
    exp_mean = sum(px1) / len(px1)
    assert abs(out[1]["byte_mean"] - exp_mean) < 1e-9
    for b in range(4):
        exp = sum(px1[b::4]) / len(px1)
        assert abs(out[1]["feature"][b] - exp) < 1e-9


def test_resize_images_real_png(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators import multimodal

    px = _gradient(8, 6, 3)
    df = spark.createDataFrame(
        [(7, png.encode(px, 8, 6, 3))], "media_id long, payload binary"
    )
    row = multimodal.resize_images(df, width=4, height=3, fake=False).collect()[0]
    w, h, ch, out_px = png.decode(bytes(row["payload"]))
    assert (w, h, ch) == (4, 3, 3)
    assert out_px == png.resize_nearest(px, 8, 6, 3, 4, 3)
