"""GIF decoder goldens: round-trip vs a self-contained test encoder.

The encoder emits only LITERAL LZW codes but mirrors the decoder's
dictionary-growth bookkeeping (code size bumps at the same points), so
any divergence in the growth logic fails the round-trip.  Covers GCT,
local color tables, interlace, 89a extension skipping, and malformed
input (reference envelope: hasher.py:23 lists .gif; PIL opens frame 0).
"""

import struct

import numpy as np
import pytest

from photo_dedup_spark.functions.gif import decode_gif


class _BitWriterLSB:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def put(self, code: int, size: int):
        self.buf |= code << self.cnt
        self.cnt += size
        while self.cnt >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.cnt -= 8

    def flush(self) -> bytes:
        if self.cnt:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.cnt = 0
        return bytes(self.out)


def _lzw_encode_literals(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    wr = _BitWriterLSB()
    code_size = min_code_size + 1
    next_code = eoi + 1
    wr.put(clear, code_size)
    first = True
    for v in indices:
        wr.put(int(v), code_size)
        # mirror the decoder: every literal after the first adds a
        # dictionary entry and may widen the code
        if not first and next_code < 4096:
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        first = False
    wr.put(eoi, code_size)
    return wr.flush()


def encode_gif(
    px_indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_ct: bool = False,
    with_extension: bool = False,
) -> bytes:
    h, w = px_indices.shape
    n = palette.shape[0]
    bits = max(1, int(n - 1).bit_length())
    ct_n = 1 << bits
    pal = np.zeros((ct_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    packed = (0x80 | (bits - 1)) if not local_ct else 0x00
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    if not local_ct:
        out += pal.tobytes()
    if with_extension:  # GCE — must be skipped by the decoder
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipacked = (0x40 if interlace else 0) | (0x80 | (bits - 1) if local_ct else 0)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_ct:
        out += pal.tobytes()
    rows = px_indices
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = px_indices[np.asarray(order)]
    min_code = max(2, bits)
    data = _lzw_encode_literals(rows.reshape(-1), min_code)
    out.append(min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


@pytest.fixture
def rng():
    return np.random.RandomState(13)


class TestGifDecode:
    def test_round_trip_gct(self, rng):
        pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
        idx = rng.randint(0, 16, size=(23, 31)).astype(np.uint8)
        w, h, c, px = decode_gif(encode_gif(idx, pal))
        assert (w, h, c) == (31, 23, 3)
        assert np.array_equal(px, pal[idx])

    def test_round_trip_large_palette_code_growth(self, rng):
        # 256-color palette: min code 8, code size grows 9→12 during
        # the literal stream — exercises every growth boundary
        pal = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
        idx = rng.randint(0, 256, size=(80, 90)).astype(np.uint8)
        w, h, c, px = decode_gif(encode_gif(idx, pal))
        assert np.array_equal(px, pal[idx])

    def test_interlaced(self, rng):
        pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
        idx = rng.randint(0, 8, size=(17, 9)).astype(np.uint8)
        w, h, c, px = decode_gif(encode_gif(idx, pal, interlace=True))
        assert np.array_equal(px, pal[idx])

    def test_local_color_table_and_extension_skip(self, rng):
        pal = rng.randint(0, 256, size=(4, 3)).astype(np.uint8)
        idx = rng.randint(0, 4, size=(5, 7)).astype(np.uint8)
        g = encode_gif(idx, pal, local_ct=True, with_extension=True)
        w, h, c, px = decode_gif(g)
        assert np.array_equal(px, pal[idx])

    def test_malformed_raises_valueerror(self, rng):
        pal = rng.randint(0, 256, size=(8, 3)).astype(np.uint8)
        idx = rng.randint(0, 8, size=(10, 10)).astype(np.uint8)
        g = encode_gif(idx, pal)
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a\x00")
        with pytest.raises(ValueError):
            decode_gif(g[: len(g) // 2])  # truncated mid-stream
        with pytest.raises(ValueError):
            decode_gif(b"NOTGIF" + g[6:])

    def test_real_lzw_compressed_stream(self):
        # hand-built COMPRESSED stream exercising the KwKwK case
        # (code == next_code before the entry exists).  min_code=2:
        # clear=4, eoi=5.  codes: CLEAR, 1, 6 → after literal 1 the
        # decoder's next free code IS 6, so 6 must resolve to
        # prev+prev[0] = [1,1] → pixels 1 1 1.
        wr = _BitWriterLSB()
        for code, size in [(4, 3), (1, 3), (6, 3), (5, 3)]:
            wr.put(code, size)
        data = wr.flush()
        pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 3, 1, 0x81, 0, 0)
        out += pal.tobytes()
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        out.append(2)
        out.append(len(data))
        out += data
        out += b"\x00\x3b"
        w, h, c, px = decode_gif(bytes(out))
        assert np.array_equal(px[0], np.tile(pal[1], (3, 1)))


class TestGifThroughSpark:
    def test_gif_decodes_in_media_pipeline(self, spark, rng):
        from photo_dedup_spark.functions.multimodal import decode_image_features

        pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
        idx = rng.randint(0, 16, size=(12, 16)).astype(np.uint8)
        media = spark.createDataFrame(
            [(1, bytearray(encode_gif(idx, pal)))], "media_id long, payload binary"
        )
        r = decode_image_features(media).collect()[0]
        assert r.decode_error is None
        assert (r.width, r.height, r.channels) == (16, 12, 3)
        assert len(r.features) == 64
