"""Pure-stdlib audio decode for the multimodal pipeline: RIFF/WAVE PCM.

Compressed codecs (mp3/aac/opus) are genuinely library-sized and stay a
declared gap, but uncompressed WAV — the interchange format every audio
pipeline can emit — decodes with struct + numpy: RIFF chunk walk, fmt
(PCM 8/16-bit, any channel count), data. Features are the standard cheap
descriptors a corpus pipeline computes before any model: duration, RMS
level, zero-crossing rate, peak.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioFormatError(ValueError):
    """Unsupported or malformed audio payload."""


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, samples float64 in [-1, 1], channels averaged to
    mono) from a RIFF/WAVE PCM payload. AudioFormatError otherwise."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE payload")
    pos, n = 12, len(data)
    fmt = None
    raw = None
    while pos + 8 <= n:
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if len(body) < 16:
                raise AudioFormatError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            raw = body
    if fmt is None or raw is None:
        raise AudioFormatError("missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _block, bits = fmt
    if audio_format != 1:
        raise AudioFormatError(f"non-PCM WAV (format {audio_format})")
    if channels < 1:
        raise AudioFormatError("zero channels")
    if bits == 8:  # unsigned
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                   - 128.0) / 128.0
    elif bits == 16:  # signed little-endian
        usable = len(raw) - (len(raw) % 2)
        samples = np.frombuffer(raw[:usable], dtype="<i2").astype(np.float64) / 32768.0
    else:
        raise AudioFormatError(f"unsupported bit depth {bits}")
    usable = len(samples) - (len(samples) % channels)
    if usable == 0:
        raise AudioFormatError("empty data chunk")
    return rate, samples[:usable].reshape(-1, channels).mean(axis=1)


def encode_wav(samples: np.ndarray, rate: int = 8000, bits: int = 8) -> bytes:
    """Minimal PCM WAV for fixtures (mono). bits=8 stores unsigned bytes
    round(s*128+128); bits=16 signed LE."""
    if bits == 8:
        raw = np.clip(np.round(samples * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2").tobytes()
    else:
        raise AudioFormatError(f"unsupported bit depth {bits}")
    block = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * block, block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
            + (b"\x00" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def wav_features(rate: int, mono: np.ndarray) -> dict:
    """The cheap pipeline descriptors over decoded mono samples."""
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    zc = int(np.count_nonzero(np.diff(np.signbit(mono)))) if n > 1 else 0
    return {
        "n_samples": n,
        "sample_rate": int(rate),
        "duration_ms": int(round(n * 1000.0 / rate)) if rate else 0,
        "rms": rms,
        "zero_crossings": zc,
        "peak": float(np.max(np.abs(mono))) if n else 0.0,
    }
