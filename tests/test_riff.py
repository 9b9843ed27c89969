"""RIFF codecs (WAV decode, AVI demux) + real audio/video paths."""

import io
import math
import struct
import wave

import pytest

from cloud_native_medical_data_etl_pipeline_spark.functions import riff


def test_wav_roundtrip_and_stdlib_cross_check():
    samples = [int(10000 * math.sin(2 * math.pi * 440 * i / 8000)) for i in range(800)]
    data = riff.wav_encode(samples, 8000, channels=1)
    rate, ch, out = riff.wav_decode(data)
    assert (rate, ch) == (8000, 1)
    assert out == samples
    # cross-check against the independent stdlib wave reader: our
    # encoder must be a spec-conformant WAV, not just self-consistent
    w = wave.open(io.BytesIO(data))
    assert w.getframerate() == 8000 and w.getnchannels() == 1
    assert w.getsampwidth() == 2 and w.getnframes() == 800
    raw = w.readframes(800)
    assert list(struct.unpack("<800h", raw)) == samples
    # and our decoder must read what the stdlib writer produces
    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(2)
    ww.setsampwidth(2)
    ww.setframerate(16000)
    ww.writeframes(struct.pack("<6h", 1, -1, 2, -2, 3, -3))
    ww.close()
    rate2, ch2, out2 = riff.wav_decode(buf.getvalue())
    assert (rate2, ch2) == (16000, 2)
    assert out2 == [1, -1, 2, -2, 3, -3]


def test_wav_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        riff.wav_decode(b"definitely not audio")
    data = bytearray(riff.wav_encode([0, 1, 2], 8000))
    # corrupt bits-per-sample (fmt body offset: 12 hdr + 8 chunk + 14)
    struct.pack_into("<H", data, 12 + 8 + 14, 8)
    with pytest.raises(ValueError, match="bit depth"):
        riff.wav_decode(bytes(data))


def test_avi_demux_roundtrip_and_odd_lengths():
    frames = [b"frame-one", b"xy", b"z" * 7]  # odd lengths force padding
    data = riff.avi_encode(frames, width=4, height=4)
    assert riff.avi_frames(data) == frames
    with pytest.raises(ValueError, match="not an AVI"):
        riff.avi_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_audio_features_real_wav(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators import multimodal

    # constant +5000: rms exactly 5000, zero crossings 0
    flat = riff.wav_encode([5000] * 400, 8000)
    # alternating +-8000: every adjacent pair crosses zero
    alt = riff.wav_encode([8000, -8000] * 200, 16000)
    df = spark.createDataFrame(
        [(1, flat), (2, alt)], "media_id long, payload binary"
    )
    out = {
        r["media_id"]: r
        for r in multimodal.decode_audio_features(df, fake=False).collect()
    }
    assert out[1]["n_samples"] == 400 and out[1]["sample_rate"] == 8000
    assert out[1]["rms"] == pytest.approx(5000.0)
    assert out[1]["zero_cross_rate"] == 0.0
    assert out[2]["rms"] == pytest.approx(8000.0)
    assert out[2]["zero_cross_rate"] == pytest.approx(399 / 400)


def test_sample_frames_real_avi(spark):
    from cloud_native_medical_data_etl_pipeline_spark.operators import multimodal

    frames = [bytes([i]) * 16 for i in range(5)]
    df = spark.createDataFrame(
        [(3, riff.avi_encode(frames))], "media_id long, payload binary"
    )
    rows = multimodal.sample_frames(df, max_frames=3, fake=False).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [bytes(r["frame"]) for r in rows] == frames[:3]


def test_wav_rejects_odd_pcm_data_chunk():
    """A truncated 16-bit stream (odd data-chunk byte count) must fail
    loud, not silently drop the trailing byte."""
    good = riff.wav_encode([1, -2, 3], 8000)
    # rebuild with a data chunk one byte short: RIFF(12) + fmt(8+16) + data hdr(8)
    fmt_chunk = good[12 : 12 + 24]
    raw = good[12 + 24 + 8 :][:5]  # 5 of the 6 PCM bytes
    body = fmt_chunk + b"data" + struct.pack("<I", 5) + raw + b"\x00"  # pad byte
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="odd data-chunk"):
        riff.wav_decode(data)
