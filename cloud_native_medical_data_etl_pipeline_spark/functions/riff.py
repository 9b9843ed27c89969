"""Minimal pure-Python RIFF container codecs: WAV (PCM audio) and AVI
(video frame demux). Stdlib struct only — the audio/video siblings of
`functions/png.py`, closing the multimodal decode seams without
native codec libraries.

Scope:
  WAV   decode/encode PCM 16-bit (any channel count / sample rate).
        Real audio features (RMS, zero-crossings) need only samples.
  AVI   frame DEMUX: walk the `movi` list and return the compressed/
        raw frame chunks (`##dc`/`##db`) in stream order. Demux is
        container parsing, not decoding — exactly what keyframe
        sampling needs; decoding the codec payload inside each frame
        is out of scope (that seam stays NotImplementedError for
        codecs like H.264).

Both run inside mapInPandas workers — stdlib-only imports.
"""

from __future__ import annotations

import struct


def wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a PCM WAV byte string to (sample_rate, channels,
    samples). Samples are interleaved int16 values."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        if ctype == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format {audio_fmt} (PCM only)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits} (16-bit only)")
            fmt = (rate, channels)
        elif ctype == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    if len(raw) % 2:
        # a 16-bit PCM stream must be an even byte count; an odd data
        # chunk means the file was truncated mid-sample — fail loud
        # like every other malformed-input branch in this codec
        raise ValueError(
            f"odd data-chunk length {len(raw)} for 16-bit PCM (truncated file?)"
        )
    n = len(raw) // 2
    samples = list(struct.unpack(f"<{n}h", raw))
    return fmt[0], fmt[1], samples


def wav_encode(samples: list[int], sample_rate: int, channels: int = 1) -> bytes:
    """Encode interleaved int16 samples to a PCM WAV byte string."""
    raw = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", raw)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_frames(data: bytes) -> list[bytes]:
    """Demux an AVI byte string to its video frame chunks in stream
    order (`##db` uncompressed / `##dc` compressed entries of the
    `movi` list). Returns the raw payload bytes of each frame."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI header")
    frames: list[bytes] = []
    _walk_riff(data, 12, len(data), frames)
    return frames


def _walk_riff(data: bytes, pos: int, end: int, frames: list[bytes]) -> None:
    while pos + 8 <= end:
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body_start = pos + 8
        if body_start + length > end:
            raise ValueError(f"truncated {ctype!r} chunk")
        if ctype == b"LIST":
            # list type occupies the first 4 body bytes; recurse past it
            _walk_riff(data, body_start + 4, body_start + length, frames)
        elif ctype[2:4] in (b"db", b"dc") and ctype[:2].isdigit():
            frames.append(data[body_start : body_start + length])
        pos = body_start + length + (length & 1)


def avi_encode(frames: list[bytes], width: int = 0, height: int = 0) -> bytes:
    """Build a minimal demuxable AVI (hdrl stub + movi list holding
    `00dc` chunks) — enough structure for `avi_frames` and any
    spec-following demuxer to walk; used for fixtures."""
    avih = struct.pack("<14I", 33333, 0, 0, 0, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0)
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih))
    movi_body = b"movi" + b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(ctype: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return ctype + struct.pack("<I", len(body)) + body + pad
