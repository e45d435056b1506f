"""TIFF/DNG decoder goldens: round-trips vs a self-contained builder.

The builder writes real TIFF structure (both byte orders, strip and
tile layouts, LZW with the spec's early-change widening, PackBits,
predictor 2, palette, bilevel, 16-bit, SubIFD chains).  The DNG case
mirrors the real file shape — an undecodable CFA main image in a
SubIFD plus a decodable RGB preview — and asserts the decoder falls
back to the preview exactly as PIL (the reference's engine,
hasher.py:23/95-154) renders DNGs.
"""

import struct

import numpy as np
import pytest

from photo_dedup_spark.functions.tiff import decode_tiff

# tag constants
W, H, BPS, COMP, PHOTO, STRIP_OFF, SPP, RPS, STRIP_CNT = (
    256, 257, 258, 259, 262, 273, 277, 278, 279,
)
PRED, CMAP, TILE_W, TILE_H, TILE_OFF, TILE_CNT, SUBIFD, NSFT = (
    317, 320, 322, 323, 324, 325, 0x014A, 0x00FE,
)

_TYPE_FMT = {1: "B", 3: "H", 4: "I"}
_TYPE_SIZE = {1: 1, 3: 2, 4: 4, 7: 1}


def _emit_ifd(buf: bytearray, entries: dict, bo: str, nxt: int = 0) -> int:
    """Append value arrays then the IFD table; return table offset.
    entries: tag -> (type, [values]) with type 7 values as bytes."""
    resolved = {}
    for tag, (typ, vals) in sorted(entries.items()):
        if typ == 7:
            raw = vals
        else:
            raw = struct.pack(bo + _TYPE_FMT[typ] * len(vals), *vals)
        if len(raw) <= 4:
            resolved[tag] = (typ, len(vals) if typ != 7 else len(raw), raw.ljust(4, b"\0"), None)
        else:
            if len(buf) % 2:
                buf += b"\0"
            resolved[tag] = (
                typ,
                len(vals) if typ != 7 else len(raw),
                struct.pack(bo + "I", len(buf)),
                None,
            )
            buf += raw
    if len(buf) % 2:
        buf += b"\0"
    off = len(buf)
    buf += struct.pack(bo + "H", len(resolved))
    for tag, (typ, cnt, vfield, _) in sorted(resolved.items()):
        buf += struct.pack(bo + "HHI", tag, typ, cnt) + vfield
    buf += struct.pack(bo + "I", nxt)
    return off


def _pixel_tags(px: np.ndarray, photometric: int, bits: int = 8) -> dict:
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    return {
        W: (4, [w]),
        H: (4, [h]),
        BPS: (3, [bits] * spp),
        PHOTO: (3, [photometric]),
        SPP: (3, [spp]),
    }


def _pack_rows(px: np.ndarray, bits: int, bo: str) -> bytes:
    if bits == 8:
        return px.astype(np.uint8).tobytes()
    if bits == 16:
        v16 = (px.astype(np.uint16) << 8) | px.astype(np.uint16)
        return v16.astype(("<" if bo == "<" else ">") + "u2").tobytes()
    # 1-bit MSB-first, rows padded to byte boundary
    h, w = px.shape[:2]
    flat = (px.reshape(h, -1) > 127).astype(np.uint8)
    return np.packbits(flat, axis=1).tobytes()


def _packbits(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        # runs of >=3 identical bytes → replicate; else literal chunk
        j = i
        while j < len(raw) - 1 and raw[j] == raw[j + 1] and j - i < 127:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i + 1), raw[i]])
            i = j + 1
            continue
        j = i
        while (
            j < len(raw)
            and j - i < 127
            and not (j < len(raw) - 2 and raw[j] == raw[j + 1] == raw[j + 2])
        ):
            j += 1
        out += bytes([j - i - 1]) + raw[i:j]
        i = j
    return bytes(out)


def _lzw_tiff(raw: bytes) -> bytes:
    """Literal-only TIFF LZW stream: mirrors the decoder's dictionary
    growth and early-change widening so round-trip failures localize
    divergences in that bookkeeping."""
    out = bytearray()
    buf = 0
    cnt = 0

    def put(code: int, width: int):
        nonlocal buf, cnt
        buf = (buf << width) | code
        cnt += width
        while cnt >= 8:
            out.append((buf >> (cnt - 8)) & 0xFF)
            cnt -= 8

    width = 9
    put(256, width)  # leading clear, as writers emit
    table_len = 258
    prev_emitted = False
    for b in raw:
        if table_len >= 4094:  # keep width <= 12: reset
            put(256, width)
            width = 9
            table_len = 258
            prev_emitted = False
        put(b, width)
        if prev_emitted:
            table_len += 1
            if table_len >= (1 << width) - 1 and width < 12:
                width += 1
        prev_emitted = True
    put(257, width)
    if cnt:
        out.append((buf << (8 - cnt)) & 0xFF)
    return bytes(out)


def build_tiff(
    px: np.ndarray,
    bo: str = "<",
    photometric: int = None,
    bits: int = 8,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int = None,
    tile: tuple = None,
    extra: dict = None,
) -> bytes:
    h, w = px.shape[:2]
    if photometric is None:
        photometric = 2 if px.ndim == 3 else 1
    stored = px
    if photometric == 0:
        stored = 255 - px
    buf = bytearray((b"II*\0" if bo == "<" else b"MM\0*") + b"\0\0\0\0")
    entries = _pixel_tags(px, photometric, bits)
    entries[COMP] = (3, [compression])
    if predictor != 1:
        entries[PRED] = (3, [predictor])

    def compress(seg: np.ndarray) -> bytes:
        arr = seg
        if predictor == 2:
            spp = 1 if arr.ndim == 2 else arr.shape[2]
            r3 = arr.reshape(arr.shape[0], -1, spp).astype(np.int16)
            d = np.concatenate([r3[:, :1], np.diff(r3, axis=1)], axis=1)
            arr = (d & 0xFF).astype(np.uint8).reshape(seg.shape)
        raw = _pack_rows(arr, bits, bo)
        if compression == 1:
            return raw
        if compression == 5:
            return _lzw_tiff(raw)
        if compression == 32773:
            return _packbits(raw)
        raise AssertionError(compression)

    if tile:
        tw, th = tile
        entries[TILE_W] = (4, [tw])
        entries[TILE_H] = (4, [th])
        offs, cnts = [], []
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                block = np.zeros(
                    (th, tw) + (() if px.ndim == 2 else (px.shape[2],)),
                    dtype=np.uint8,
                )
                sub = stored[ty : ty + th, tx : tx + tw]
                block[: sub.shape[0], : sub.shape[1]] = sub
                seg = compress(block)
                offs.append(len(buf))
                cnts.append(len(seg))
                buf += seg
        entries[TILE_OFF] = (4, offs)
        entries[TILE_CNT] = (4, cnts)
    else:
        rps = rows_per_strip or h
        entries[RPS] = (4, [rps])
        offs, cnts = [], []
        for y0 in range(0, h, rps):
            seg = compress(stored[y0 : y0 + rps])
            offs.append(len(buf))
            cnts.append(len(seg))
            buf += seg
        entries[STRIP_OFF] = (4, offs)
        entries[STRIP_CNT] = (4, cnts)
    if extra:
        entries.update(extra)
    ifd0 = _emit_ifd(buf, entries, bo)
    struct.pack_into(bo + "I", buf, 4, ifd0)
    return bytes(buf)


def _grad(h, w, c=None):
    y = np.arange(h)[:, None]
    x = np.arange(w)[None, :]
    g = ((y * 7 + x * 13) % 256).astype(np.uint8)
    if c is None:
        return g
    return np.stack([(g + 31 * i).astype(np.uint8) for i in range(c)], axis=2)


class TestTiffRoundTrip:
    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_gray_uncompressed(self, bo):
        px = _grad(21, 17)
        w, h, c, out = decode_tiff(build_tiff(px, bo=bo))
        assert (w, h, c) == (17, 21, 1)
        np.testing.assert_array_equal(out[:, :, 0], px)

    def test_rgb_multistrip(self):
        px = _grad(33, 14, 3)
        w, h, c, out = decode_tiff(build_tiff(px, rows_per_strip=8))
        assert (w, h, c) == (14, 33, 3)
        np.testing.assert_array_equal(out, px)

    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_packbits(self, bo):
        px = np.repeat(_grad(19, 5, 3), 5, axis=1)  # runs for RLE
        w, h, c, out = decode_tiff(
            build_tiff(px, bo=bo, compression=32773, rows_per_strip=4)
        )
        np.testing.assert_array_equal(out, px)

    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_lzw(self, bo):
        px = _grad(40, 30, 3)
        w, h, c, out = decode_tiff(build_tiff(px, bo=bo, compression=5))
        np.testing.assert_array_equal(out, px)

    def test_lzw_long_stream_width_bumps(self):
        # >4094 literals forces width bumps 9→12 and a mid-stream clear
        px = _grad(80, 80)
        w, h, c, out = decode_tiff(build_tiff(px, compression=5))
        np.testing.assert_array_equal(out[:, :, 0], px)

    def test_lzw_predictor2(self):
        px = _grad(25, 33, 3)
        w, h, c, out = decode_tiff(
            build_tiff(px, compression=5, predictor=2, rows_per_strip=7)
        )
        np.testing.assert_array_equal(out, px)

    def test_white_is_zero(self):
        px = _grad(9, 9)
        w, h, c, out = decode_tiff(build_tiff(px, photometric=0))
        np.testing.assert_array_equal(out[:, :, 0], px)

    def test_16bit_high_byte(self):
        px = _grad(11, 13)
        for bo in ("<", ">"):
            w, h, c, out = decode_tiff(build_tiff(px, bo=bo, bits=16))
            np.testing.assert_array_equal(out[:, :, 0], px)

    def test_bilevel(self):
        px = (np.indices((10, 22)).sum(axis=0) % 2 * 255).astype(np.uint8)
        w, h, c, out = decode_tiff(build_tiff(px, bits=1, photometric=1))
        np.testing.assert_array_equal(out[:, :, 0], px)

    def test_palette(self):
        idx = (_grad(12, 15) % 16).astype(np.uint8)
        lut_r = [((i * 17) % 256) << 8 for i in range(256)]
        lut_g = [(255 - i) << 8 for i in range(256)]
        lut_b = [((i * 3) % 256) << 8 for i in range(256)]
        data = build_tiff(
            idx,
            photometric=3,
            extra={CMAP: (3, lut_r + lut_g + lut_b)},
        )
        w, h, c, out = decode_tiff(data)
        assert c == 3
        np.testing.assert_array_equal(out[:, :, 0], (idx * 17).astype(np.uint8))
        np.testing.assert_array_equal(out[:, :, 1], 255 - idx)

    def test_tiled_rgb(self):
        px = _grad(37, 41, 3)
        w, h, c, out = decode_tiff(build_tiff(px, tile=(16, 16)))
        assert (w, h) == (41, 37)
        np.testing.assert_array_equal(out, px)

    def test_tiled_lzw_predictor(self):
        px = _grad(20, 26, 3)
        w, h, c, out = decode_tiff(
            build_tiff(px, tile=(16, 8), compression=5, predictor=2)
        )
        np.testing.assert_array_equal(out, px)


class TestDngShape:
    def test_subifd_cfa_falls_back_to_preview(self):
        """DNG file shape: IFD0 = RGB preview (NewSubFileType 1),
        SubIFD = full-res CFA mosaic (photometric 32803, undecodable).
        The decoder must render the preview, as PIL does."""
        preview = _grad(16, 24, 3)
        buf = bytearray(b"II*\0\0\0\0\0")
        # CFA main image: bigger, marked full-resolution, undecodable
        cfa_raw = bytes(64 * 64 * 2)
        cfa_off = len(buf)
        buf += cfa_raw
        cfa = {
            W: (4, [64]),
            H: (4, [64]),
            BPS: (3, [16]),
            PHOTO: (3, [32803]),
            SPP: (3, [1]),
            COMP: (3, [1]),
            NSFT: (4, [0]),
            STRIP_OFF: (4, [cfa_off]),
            STRIP_CNT: (4, [len(cfa_raw)]),
            RPS: (4, [64]),
        }
        sub_off = _emit_ifd(buf, cfa, "<")
        raw = preview.tobytes()
        poff = len(buf)
        buf += raw
        ifd0 = {
            **_pixel_tags(preview, 2),
            COMP: (3, [1]),
            NSFT: (4, [1]),
            RPS: (4, [16]),
            STRIP_OFF: (4, [poff]),
            STRIP_CNT: (4, [len(raw)]),
            SUBIFD: (4, [sub_off]),
        }
        off0 = _emit_ifd(buf, ifd0, "<")
        struct.pack_into("<I", buf, 4, off0)
        w, h, c, out = decode_tiff(bytes(buf))
        assert (w, h, c) == (24, 16, 3)
        np.testing.assert_array_equal(out, preview)

    def test_ifd_chain_prefers_full_resolution(self):
        """Two chained IFDs: thumbnail first, full-res second — the
        full-res one must win regardless of chain order."""
        thumb = _grad(4, 4, 3)
        full = _grad(32, 32, 3)
        buf = bytearray(b"II*\0\0\0\0\0")
        t_raw, f_raw = thumb.tobytes(), full.tobytes()
        t_off = len(buf)
        buf += t_raw
        f_off = len(buf)
        buf += f_raw
        ifd1 = {
            **_pixel_tags(full, 2),
            COMP: (3, [1]),
            NSFT: (4, [0]),
            RPS: (4, [32]),
            STRIP_OFF: (4, [f_off]),
            STRIP_CNT: (4, [len(f_raw)]),
        }
        off1 = _emit_ifd(buf, ifd1, "<")
        ifd0 = {
            **_pixel_tags(thumb, 2),
            COMP: (3, [1]),
            NSFT: (4, [1]),
            RPS: (4, [4]),
            STRIP_OFF: (4, [t_off]),
            STRIP_CNT: (4, [len(t_raw)]),
        }
        off0 = _emit_ifd(buf, ifd0, "<", nxt=off1)
        struct.pack_into("<I", buf, 4, off0)
        w, h, c, out = decode_tiff(bytes(buf))
        assert (w, h) == (32, 32)
        np.testing.assert_array_equal(out, full)


class TestTiffJpegCompression:
    def test_compression7_strip_jpeg(self):
        from tests.test_jpeg import encode_jpeg

        px = _grad(24, 32, 3)
        jpeg = encode_jpeg(px)
        buf = bytearray(b"II*\0\0\0\0\0")
        joff = len(buf)
        buf += jpeg
        ifd0 = {
            **_pixel_tags(px, 6),  # YCbCr photometric, typical for comp 7
            PHOTO: (3, [6]),
            COMP: (3, [7]),
            RPS: (4, [24]),
            STRIP_OFF: (4, [joff]),
            STRIP_CNT: (4, [len(jpeg)]),
        }
        off0 = _emit_ifd(buf, ifd0, "<")
        struct.pack_into("<I", buf, 4, off0)
        w, h, c, out = decode_tiff(bytes(buf))
        assert (w, h, c) == (32, 24, 3)
        assert float(np.abs(out.astype(float) - px.astype(float)).mean()) < 8.0


class TestTiffMalformed:
    def test_bad_magic(self):
        with pytest.raises(ValueError):
            decode_tiff(b"XX*\0" + b"\0" * 100)

    def test_truncated_header(self):
        with pytest.raises(ValueError):
            decode_tiff(b"II*\0\x08")

    def test_truncated_strip(self):
        px = _grad(10, 10)
        data = bytearray(build_tiff(px))
        with pytest.raises(ValueError):
            decode_tiff(bytes(data[: len(data) - 120]))

    def test_no_decodable_ifd(self):
        # lone CFA image: every IFD fails → ValueError, not a crash
        buf = bytearray(b"II*\0\0\0\0\0")
        raw = bytes(16 * 16 * 2)
        off = len(buf)
        buf += raw
        cfa = {
            W: (4, [16]),
            H: (4, [16]),
            BPS: (3, [16]),
            PHOTO: (3, [32803]),
            SPP: (3, [1]),
            COMP: (3, [1]),
            STRIP_OFF: (4, [off]),
            STRIP_CNT: (4, [len(raw)]),
            RPS: (4, [16]),
        }
        off0 = _emit_ifd(buf, cfa, "<")
        struct.pack_into("<I", buf, 4, off0)
        with pytest.raises(ValueError):
            decode_tiff(bytes(buf))


class TestMediaIntegration:
    def test_decode_image_features_routes_tiff(self, spark):
        from photo_dedup_spark.functions.multimodal import decode_image_features

        img = _grad(32, 32, 3)
        rows = [
            (1, bytearray(build_tiff(img, compression=5, predictor=2))),
            (2, bytearray(b"MM\0*" + b"\0" * 16)),  # empty IFD chain
        ]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {r.media_id: r for r in decode_image_features(media).collect()}
        ok = out[1]
        assert (ok.width, ok.height, ok.channels) == (32, 32, 3)
        assert ok.decode_error is None and len(ok.features) == 64
        bad = out[2]
        assert bad.decode_error is not None and bad.features is None
