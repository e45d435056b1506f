"""MJPEG-in-AVI video tier: container walk + per-frame native decode.

The builder writes real RIFF/AVI structure (hdrl LIST with an avih
header, movi LIST with 00dc frame chunks, odd-size padding, an idx1
index chunk that must be skipped); frames are real baseline JPEGs from
the round-trip-tested encoder in tests/test_jpeg.py.
"""

import struct

import numpy as np
import pytest

from photo_dedup_spark.functions.multimodal import avi_mjpeg_frames
from tests.test_jpeg import encode_jpeg


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\0" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def build_avi(frames: list[bytes], with_index: bool = True) -> bytes:
    avih = _chunk(b"avih", struct.pack("<14I", 33333, 0, 0, 0, len(frames), *([0] * 9)))
    hdrl = _list(b"hdrl", avih)
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    idx = _chunk(b"idx1", b"\0" * 16 * len(frames)) if with_index else b""
    body = b"AVI " + hdrl + movi + idx
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _frame(seed: int, h: int = 24, w: int = 32) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 7 + y * 13 + seed * 29) % 256).astype(np.uint8)


class TestAviWalk:
    def test_extracts_frames_in_order(self):
        frames = [encode_jpeg(_frame(i)) for i in range(5)]
        got = avi_mjpeg_frames(build_avi(frames))
        assert got == frames  # idx1 and headers skipped, order kept

    def test_odd_sized_frames_are_padded(self):
        frames = [b"\xff\xd8" + bytes(7), b"\xff\xd8" + bytes(10)]  # odd, even
        got = avi_mjpeg_frames(build_avi(frames, with_index=False))
        assert got == frames

    def test_not_avi(self):
        with pytest.raises(ValueError):
            avi_mjpeg_frames(b"RIFF\x04\0\0\0WAVE")
        with pytest.raises(ValueError):
            avi_mjpeg_frames(b"nope")

    def test_truncated_chunk(self):
        data = build_avi([encode_jpeg(_frame(0))])
        with pytest.raises(ValueError):
            avi_mjpeg_frames(data[: len(data) - 40])


class TestVideoThroughSpark:
    def test_decode_video_frames_every_k(self, spark):
        from photo_dedup_spark.functions.multimodal import decode_video_frames

        frames = [encode_jpeg(_frame(i)) for i in range(6)]
        bad_container = b"RIFF" + struct.pack("<I", 4) + b"AVI " + b"trailing!"
        h264ish = build_avi([b"\x00\x00\x00\x01\x67" + bytes(40)])  # not JPEG
        rows = [
            (1, bytearray(build_avi(frames))),
            (2, bytearray(bad_container)),
            (3, bytearray(h264ish)),
        ]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        out = decode_video_frames(media, every_k=2).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.media_id, []).append(r)
        ok = sorted(by_id[1], key=lambda r: r.frame_index)
        assert [r.frame_index for r in ok] == [0, 2, 4]
        assert all(
            (r.width, r.height) == (32, 24) and r.decode_error is None
            and len(r.features) == 64
            for r in ok
        )
        # distinct frames → distinct dHashes (content actually decoded)
        assert len({tuple(r.features) for r in ok}) == 3
        assert len(by_id[2]) == 1 and by_id[2][0].decode_error is not None
        assert by_id[2][0].frame_index is None
        gated = by_id[3]
        assert len(gated) == 1 and gated[0].decode_error is not None

    def test_every_k_validation(self, spark):
        from photo_dedup_spark.functions.multimodal import decode_video_frames

        media = spark.createDataFrame([], "media_id long, payload binary")
        with pytest.raises(ValueError):
            decode_video_frames(media, every_k=0)
