"""Codec tests for functions/imaging.py — the real decode behind the
multimodal operators (no Spark session needed)."""

import struct
import zlib

import numpy as np
import pytest

from nutch_spark.functions.imaging import (
    ImageFormatError, box_downsample, decode_bmp, decode_image, decode_png,
    decode_ppm, encode_bmp, encode_png, encode_ppm,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("h,w", [(8, 8), (3, 5), (1, 1), (7, 3), (2, 9)])
def test_roundtrip_all_formats(h, w):
    px = RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    # 3x5 / 7x3 / 2x9 exercise BMP's 4-byte row padding
    assert (decode_bmp(encode_bmp(px)) == px).all()
    assert (decode_png(encode_png(px)) == px).all()
    for enc in (encode_ppm, encode_bmp, encode_png):
        assert (decode_image(enc(px)) == px).all()


def _png(w, h, color, raw):
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_every_filter_type():
    """Scanlines filtered with types 0..4 (hand-built with an independent
    integer reference implementation) must all unfilter correctly."""
    px = RNG.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    flat = px.reshape(5, 12)
    raw, prev = b"", [0] * 12
    for r in range(5):
        cur, ftype = [int(v) for v in flat[r]], r % 5
        line = bytearray([ftype])
        for x in range(12):
            a = cur[x - 3] if x >= 3 else 0
            b = prev[x]
            c = prev[x - 3] if x >= 3 else 0
            if ftype == 0:
                v = cur[x]
            elif ftype == 1:
                v = (cur[x] - a) & 0xFF
            elif ftype == 2:
                v = (cur[x] - b) & 0xFF
            elif ftype == 3:
                v = (cur[x] - ((a + b) >> 1)) & 0xFF
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (cur[x] - pred) & 0xFF
            line.append(v)
        raw += bytes(line)
        prev = cur
    assert (decode_png(_png(4, 5, 2, raw)) == px).all()


def test_png_gray_and_rgba():
    g = RNG.integers(0, 256, (4, 4, 1), dtype=np.uint8)
    raw = b"".join(b"\x00" + g[r].tobytes() for r in range(4))
    assert (decode_png(_png(4, 4, 0, raw)) == np.repeat(g, 3, axis=2)).all()
    ra = RNG.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + ra[r].tobytes() for r in range(4))
    assert (decode_png(_png(4, 4, 6, raw)) == ra[:, :, :3]).all()


def test_bmp_topdown_negative_height():
    px = RNG.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(px))
    # flip to top-down: negate height, reverse the (unpadded, w=4) rows
    struct.pack_into("<i", data, 22, -4)
    body = np.frombuffer(bytes(data[54:]), dtype=np.uint8).reshape(4, 12)
    data[54:] = body[::-1].tobytes()
    assert (decode_bmp(bytes(data)) == px).all()


def test_ppm_comments_and_whitespace():
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    data = b"P6 # a comment\n# another\n 2\t2 # dims\n255\n" + px.tobytes()
    assert (decode_ppm(data) == px).all()


def test_malformed_payloads_raise():
    with pytest.raises(ImageFormatError):
        decode_image(b"\x00\x01\x02nothing")
    with pytest.raises(ImageFormatError):
        decode_image(None)
    with pytest.raises(ImageFormatError):
        decode_ppm(b"P6\n2 2\n255\nxx")  # truncated raster
    with pytest.raises(ImageFormatError):
        decode_bmp(b"BM" + b"\x00" * 20)  # truncated header
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    bad = bytearray(encode_png(px))
    bad[33 + 12] ^= 0xFF  # flip a byte inside the IDAT stream
    with pytest.raises(ImageFormatError):
        decode_png(bytes(bad))


def test_box_downsample_floor_mean():
    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    d = box_downsample(px, 2)
    assert d.shape == (4, 4, 3)
    want = (int(px[0, 0, 0]) + int(px[0, 1, 0])
            + int(px[1, 0, 0]) + int(px[1, 1, 0])) // 4
    assert d[0, 0, 0] == want
    # odd dims: trailing row/col beyond a full block drop
    assert box_downsample(px[:7, :5], 2).shape == (3, 2, 3)
    with pytest.raises(ImageFormatError):
        box_downsample(px[:1, :1], 2)


def test_synth_media_round_trips_three_formats():
    """The synthetic media table ships ALL THREE formats and each decodes
    back to the same arithmetic pixel array."""
    from nutch_spark.operators.media import ref_index, synth_pixels, _SYNTH_ENCODERS

    for idx in range(6):
        ref = f"http://img.example-cdn.com/{idx}.jpg"
        assert ref_index(ref) == idx
        px = synth_pixels(idx)
        payload = _SYNTH_ENCODERS[idx % 3](px)
        assert (decode_image(payload) == px).all()
    magics = {_SYNTH_ENCODERS[i % 3](synth_pixels(i))[:2] for i in range(3)}
    assert magics == {b"P6", b"BM", b"\x89P"}
