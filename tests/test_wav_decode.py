"""Real WAV/PCM decode tests (C5 audio — stdlib-only, no stub).

Ground truth is generated with the stdlib `wave` writer, so the
parser is validated against genuine RIFF bytes, not hand-rolled ones.
"""

from __future__ import annotations

import io
import math
import os
import struct
import sys
import wave

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from monzo_data_pipeline_spark.ext.multimodal import (  # noqa: E402
    decode_wav,
    wav_features,
)


def make_wav(
    samples: list[int], sample_rate: int = 8000, n_channels: int = 1, bits: int = 16
) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(bits // 8)
        w.setframerate(sample_rate)
        if bits == 16:
            frames = b"".join(
                struct.pack("<h", s) * n_channels for s in samples
            )
        else:
            frames = b"".join(
                bytes([s + 128]) * n_channels for s in samples
            )
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_wav_16bit_roundtrip():
    samples = [0, 1000, -1000, 32767, -32768, 42]
    d = decode_wav(make_wav(samples, sample_rate=16000))
    assert d["sample_rate"] == 16000
    assert d["n_channels"] == 1
    assert d["bits_per_sample"] == 16
    assert d["n_frames"] == len(samples)
    assert d["samples"] == samples


def test_decode_wav_stereo_takes_first_channel():
    samples = [5, -7, 9]
    d = decode_wav(make_wav(samples, n_channels=2))
    assert d["n_channels"] == 2
    assert d["n_frames"] == len(samples)
    assert d["samples"] == samples  # channel 0 (both channels equal here)


def test_decode_wav_8bit():
    samples = [0, 10, -10, 127, -128]
    d = decode_wav(make_wav(samples, bits=8))
    assert d["bits_per_sample"] == 8
    assert d["samples"] == samples


def test_decode_wav_rejects_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")
    with pytest.raises(ValueError, match="fmt/data"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_wav_features_spark_end_to_end(spark):
    rows = [
        (1, make_wav([0, 3, -4], sample_rate=8000)),
        (2, make_wav([100] * 1600, sample_rate=16000)),  # 100 ms of DC
        (3, b"corrupted payload"),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r.media_id: r for r in wav_features(media).collect()}

    r1 = got[1]
    assert r1.valid and r1.n_frames == 3 and r1.sample_rate == 8000
    assert r1.peak_abs == 4
    assert r1.rms_q == math.floor(math.sqrt((9 + 16) / 3) * 1000)

    r2 = got[2]
    assert r2.valid and r2.duration_ms == 100 and r2.rms_q == 100_000

    r3 = got[3]  # quarantined, not a task failure
    assert r3.valid is False and r3.sample_rate is None
