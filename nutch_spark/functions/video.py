"""Pure-stdlib video decode for the multimodal pipeline: uncompressed AVI.

Compressed video (h264/vp9/av1, MJPEG) is library-sized and stays a
declared gap, but RIFF/AVI carrying uncompressed 24-bit DIB frames —
the raw interchange layout — decodes with the same chunk walk WAV uses:
`avih` gives the frame clock, the `movi` LIST's `00db` chunks are
BMP-style bottom-up BGR rasters. Enough to make frame SAMPLING operate on
real decoded pixels instead of metadata arithmetic.
"""

from __future__ import annotations

import struct

import numpy as np


class VideoFormatError(ValueError):
    """Unsupported or malformed video payload."""


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len, list_type|None) for each chunk."""
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        if tag in (b"LIST", b"RIFF"):
            yield tag, pos + 12, ln - 4, data[pos + 8 : pos + 12]
        else:
            yield tag, pos + 8, ln, None
        pos += 8 + ln + (ln & 1)


def decode_avi(data: bytes) -> tuple[float, int, int, list[np.ndarray]]:
    """(fps, width, height, frames as (h, w, 3) uint8 RGB) from an AVI
    holding uncompressed 24-bit DIB '00db' frames. VideoFormatError on
    anything else (compressed streams included)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise VideoFormatError("not a RIFF/AVI payload")
    fps, w, h = 0.0, 0, 0
    frames: list[np.ndarray] = []

    def visit(pos: int, end: int) -> None:
        nonlocal fps, w, h
        for tag, bstart, blen, ltype in _walk(data, pos, end):
            body_end = min(bstart + blen, len(data))
            if tag == b"LIST":
                visit(bstart, body_end)
            elif tag == b"avih" and blen >= 40:
                (usec_per_frame,) = struct.unpack_from("<I", data, bstart)
                w, h = struct.unpack_from("<II", data, bstart + 32)
                fps = 1e6 / usec_per_frame if usec_per_frame else 0.0
            elif tag in (b"00db", b"01db") and w and h:
                stride = (w * 3 + 3) & ~3
                if blen < stride * h:
                    raise VideoFormatError("truncated DIB frame")
                rows = np.frombuffer(
                    data, dtype=np.uint8, count=stride * h, offset=bstart
                ).reshape(h, stride)[:, : w * 3]
                # bottom-up BGR -> top-down RGB (the BMP raster layout)
                frames.append(rows.reshape(h, w, 3)[::-1, :, ::-1].copy())
            elif tag in (b"00dc", b"01dc"):
                raise VideoFormatError("compressed AVI stream (declared gap)")

    visit(12, len(data))
    if not fps or not frames:
        raise VideoFormatError("missing avih header or DIB frames")
    return fps, w, h, frames


def encode_avi(frames: list[np.ndarray], fps: float = 10.0) -> bytes:
    """Minimal uncompressed AVI for fixtures: avih + one '00db' chunk per
    (h, w, 3) RGB frame (bottom-up BGR rasters, rows padded to 4)."""
    if not frames:
        raise VideoFormatError("no frames")
    h, w, _c = frames[0].shape
    stride_pad = (-(w * 3)) % 4
    avih = struct.pack("<IIIIIIIIIIIIII",
                       int(round(1e6 / fps)), 0, 0, 0, len(frames), 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl_list = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    movi = b""
    for f in frames:
        bgr = f[::-1, :, ::-1].astype(np.uint8)
        raster = b"".join(bgr[r].tobytes() + b"\x00" * stride_pad
                          for r in range(h))
        movi += b"00db" + struct.pack("<I", len(raster)) + raster
        if len(raster) & 1:
            movi += b"\x00"
    movi_list = b"LIST" + struct.pack("<I", 4 + len(movi)) + b"movi" + movi
    body = hdrl_list + movi_list
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
