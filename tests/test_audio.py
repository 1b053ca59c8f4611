"""WAV codec + audio feature tests (functions/audio.py — the real audio
decode behind the multimodal operators)."""

import struct

import numpy as np
import pytest

from nutch_spark.functions.audio import (
    AudioFormatError, decode_wav, encode_wav, wav_features,
)


def test_pcm8_roundtrip():
    s = (np.arange(64, dtype=np.float64) - 32) / 128.0
    rate, mono = decode_wav(encode_wav(s, rate=8000, bits=8))
    assert rate == 8000
    assert np.allclose(mono, s, atol=1 / 256)


def test_pcm16_roundtrip():
    rng = np.random.default_rng(3)
    s = rng.uniform(-0.9, 0.9, 500)
    rate, mono = decode_wav(encode_wav(s, rate=44100, bits=16))
    assert rate == 44100
    assert np.allclose(mono, s, atol=1 / 32768)


def test_stereo_averages_to_mono():
    # hand-build a stereo 16-bit WAV: L=+0.5, R=-0.5 -> mono 0
    raw = struct.pack("<4h", 16384, -16384, 16384, -16384)
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(raw)) + raw
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, mono = decode_wav(wav)
    assert len(mono) == 2 and np.allclose(mono, 0.0)


def test_features_deterministic():
    s = np.array([0.5, -0.5] * 4, dtype=np.float64)
    f = wav_features(8000, s)
    assert f["n_samples"] == 8
    assert f["duration_ms"] == 1  # 8 / 8000 s
    assert f["zero_crossings"] == 7
    assert f["rms"] == pytest.approx(0.5)
    assert f["peak"] == 0.5


def test_rejects_non_wav_and_compressed():
    with pytest.raises(AudioFormatError):
        decode_wav(b"ID3\x03mp3 data here")
    with pytest.raises(AudioFormatError):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI ")
    # non-PCM format code
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)  # 85 = MP3
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 0)
    with pytest.raises(AudioFormatError):
        decode_wav(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
