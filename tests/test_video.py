"""AVI codec + real frame-extraction tests (functions/video.py)."""

import numpy as np
import pytest

from nutch_spark.functions.video import (
    VideoFormatError, decode_avi, encode_avi,
)


def test_avi_roundtrip_with_padding():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (4, 5, 3), dtype=np.uint8) for _ in range(3)]
    fps, w, h, out = decode_avi(encode_avi(frames, fps=10.0))
    assert (fps, w, h) == (10.0, 5, 4)  # w=5 exercises row padding
    assert len(out) == 3
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_rejects_non_avi_and_compressed():
    with pytest.raises(VideoFormatError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(VideoFormatError):
        decode_avi(b"\x00\x00\x00\x18ftypmp42")  # mp4: declared gap
    # a compressed '00dc' stream must refuse, not mis-decode
    import struct

    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0, 1, 0, 1, 0,
                       4, 4, 0, 0, 0, 0)
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    hl = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    movi = b"00dc" + struct.pack("<I", 4) + b"h264"
    ml = b"LIST" + struct.pack("<I", 4 + len(movi)) + b"movi" + movi
    body = hl + ml
    with pytest.raises(VideoFormatError):
        decode_avi(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body)


def test_extract_video_frames_real_pixels(spark):
    """The operator decodes the synth AVIs and checksums ACTUAL frame
    pixels; sampled indices follow the 10 fps clock."""
    from nutch_spark.operators.media import (
        extract_video_frames, synth_media_table, synth_video_frame)

    refs = ["http://cdn.example.com/vid/3.mp4"]
    rows = extract_video_frames(synth_media_table(spark, refs),
                                every_ms=500).collect()
    # duration = (1000 + 300) ms -> ts 0,500,1000
    assert [r.frame_ts_ms for r in rows] == [0, 500, 1000]
    assert [r.frame_index for r in rows] == [0, 5, 10]
    for r in rows:
        assert (r.width, r.height) == (4, 4)
        assert r.checksum == int(synth_video_frame(3, r.frame_index).sum())
