"""Round-trip tests for the pure-numpy baseline JPEG decoder.

The encoder below is a minimal, self-contained baseline-JPEG writer
used only to build fixtures (no external imaging libraries exist in
this environment).  It emits its OWN Huffman and quantization tables
into DHT/DQT — the decoder reads tables from the file, so the round
trip exercises the real decode path (canonical Huffman, EXTEND, ZRL/
EOB, byte stuffing, restart markers, subsampled MCU interleave, IDCT)
rather than any shared constants.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from photo_dedup_spark.functions.jpeg import _C, decode_jpeg
from photo_dedup_spark.functions.multimodal import dhash64

# --- minimal encoder -------------------------------------------------------

# single-length canonical tables (valid per JPEG: all-ones code unused):
# DC: 12 categories as 4-bit codes; AC: EOB, ZRL and every (run,size)
# with size 1..10 as 8-bit codes.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_BITS = [0] * 7 + [162] + [0] * 8
_AC_VALS = bytes([0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])

# frequency-increasing quant table (coarser for high frequencies)
_QUANT = np.clip(np.add.outer(np.arange(8), np.arange(8)) * 2 + 8, 1, 255).astype(
    np.int32
)

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _canonical_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            codes[vals[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def align_ones(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    s = abs(v).bit_length()
    return (s, v if v >= 0 else v + (1 << s) - 1)


def _encode_block(wr: _BitWriter, block: np.ndarray, pred: int) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    q = np.rint(coef / _QUANT).astype(np.int64)
    zz = q.reshape(-1)[_ZIGZAG]
    s, mag = _magnitude(int(zz[0]) - pred)
    c, l = _DC_CODES[s]
    wr.put(c, l)
    if s:
        wr.put(mag, s)
    run = 0
    last_nz = np.flatnonzero(zz[1:])
    last = (last_nz[-1] + 1) if last_nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, l = _AC_CODES[0xF0]
            wr.put(c, l)
            run -= 16
        s, mag = _magnitude(v)
        c, l = _AC_CODES[(run << 4) | s]
        wr.put(c, l)
        wr.put(mag, s)
        run = 0
    if last < 63:
        c, l = _AC_CODES[0x00]
        wr.put(c, l)
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Encode HxW (gray) or HxWx3 (RGB) uint8 pixels as baseline JPEG.
    ``subsample=True`` uses 4:2:0 chroma; requires RGB input."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
        samps = [(1, 1)]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def down(c):
                ph = -(-h // 2) * 2
                pw = -(-w // 2) * 2
                cp = np.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
                return cp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

            planes = [y, down(cb), down(cr)]
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samps = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for pl, (sh, sv) in zip(planes, samps):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        padded.append(
            np.pad(
                pl,
                ((0, ph - pl.shape[0]), (0, pw - pl.shape[1])),
                mode="edge",
            )
        )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(int(x) for x in _QUANT.reshape(-1)[_ZIGZAG])
    nc = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, (sh, sv) in enumerate(samps):
        out += bytes([ci + 1, (sh << 4) | sv, 0])
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc << 4)
        out += bytes(bits) + vals
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential

    wr = _BitWriter()
    pred = [0] * nc
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wr.align_ones()
                wr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * nc
            for ci, (sh, sv) in enumerate(samps):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        pred[ci] = _encode_block(wr, blk, pred[ci])
            mcu += 1
    wr.align_ones()
    out += wr.out + b"\xff\xd9"
    return bytes(out)


# --- tests -----------------------------------------------------------------


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * 255 / max(w - 1, 1) + yy * 64 / max(h - 1, 1)) % 256).astype(
        np.uint8
    )


class TestJpegRoundTrip:
    def test_flat_gray(self):
        img = np.full((64, 64), 128, dtype=np.uint8)
        w, h, c, px = decode_jpeg(encode_jpeg(img))
        assert (w, h, c) == (64, 64, 1)
        assert np.abs(px.astype(int) - 128).max() <= 2

    def test_gradient_non_multiple_of_8(self):
        img = _gradient(24, 41)  # exercises edge-block padding + crop
        w, h, c, px = decode_jpeg(encode_jpeg(img))
        assert (w, h, c) == (41, 24, 1)
        err = np.abs(px[:, :, 0].astype(float) - img.astype(float))
        assert err.mean() < 4.0, err.mean()

    def test_rgb_444_quadrants(self):
        img = np.zeros((32, 32, 3), dtype=np.uint8)
        img[:16, :16] = (220, 30, 30)
        img[:16, 16:] = (30, 220, 30)
        img[16:, :16] = (30, 30, 220)
        img[16:, 16:] = (200, 200, 200)
        w, h, c, px = decode_jpeg(encode_jpeg(img))
        assert (w, h, c) == (32, 32, 3)
        for sl, want in (
            ((slice(2, 14), slice(2, 14)), (220, 30, 30)),
            ((slice(2, 14), slice(18, 30)), (30, 220, 30)),
            ((slice(18, 30), slice(2, 14)), (30, 30, 220)),
            ((slice(18, 30), slice(18, 30)), (200, 200, 200)),
        ):
            got = px[sl].reshape(-1, 3).mean(axis=0)
            assert np.abs(got - np.array(want)).max() < 12, (got, want)

    def test_chroma_420_subsampling(self):
        img = np.zeros((48, 40, 3), dtype=np.uint8)
        img[:, :20] = (250, 60, 60)
        img[:, 20:] = (60, 60, 250)
        w, h, c, px = decode_jpeg(encode_jpeg(img, subsample=True))
        assert (w, h, c) == (40, 48, 3)
        left = px[8:40, 4:16].reshape(-1, 3).mean(axis=0)
        right = px[8:40, 24:36].reshape(-1, 3).mean(axis=0)
        assert left[0] > 180 and left[2] < 120, left
        assert right[2] > 180 and right[0] < 120, right

    def test_restart_markers(self):
        img = _gradient(32, 56)
        data = encode_jpeg(img, restart_interval=2)
        assert b"\xff\xd0" in data  # RST0 present
        w, h, c, px = decode_jpeg(data)
        err = np.abs(px[:, :, 0].astype(float) - img.astype(float))
        assert err.mean() < 4.0

    def test_dhash_stable_across_requant(self):
        # same scene, different quant -> near-identical dHash (the
        # perceptual property the pipeline relies on)
        img = _gradient(64, 72)
        _, _, _, px1 = decode_jpeg(encode_jpeg(img))
        global _QUANT
        q_orig = _QUANT
        try:
            _QUANT = np.clip(q_orig * 2, 1, 255)
            _DC = encode_jpeg(img)
        finally:
            _QUANT = q_orig
        _, _, _, px2 = decode_jpeg(_DC)
        d1 = dhash64(px1)
        d2 = dhash64(px2)
        assert int((d1 != d2).sum()) <= 6

    def test_rejects_lossless_and_arithmetic(self):
        # SOF2 progressive graduated to a real decode path in round 4
        # (TestProgressiveJpeg below); SOF3 lossless and SOF9+
        # arithmetic remain typed errors
        img = _gradient(16, 16)
        for sof in (0xC3, 0xC9):
            data = bytearray(encode_jpeg(img))
            i = data.index(b"\xff\xc0")
            data[i + 1] = sof
            with pytest.raises(ValueError, match="unsupported JPEG mode"):
                decode_jpeg(bytes(data))

    def test_rejects_truncation_and_garbage(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG not a jpeg")
        img = _gradient(16, 16)
        data = encode_jpeg(img)
        with pytest.raises(ValueError):
            decode_jpeg(data[:20])  # header cut before SOS


class TestMediaIntegration:
    def test_decode_image_features_routes_jpeg(self, spark):
        from photo_dedup_spark.functions.multimodal import decode_image_features

        img = _gradient(32, 32)
        rows = [
            (1, bytearray(encode_jpeg(img))),
            (2, bytearray(b"\xff\xd8\xff\xe0 truncated")),
        ]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        out = {
            r.media_id: r
            for r in decode_image_features(media).collect()
        }
        ok = out[1]
        assert (ok.width, ok.height, ok.channels) == (32, 32, 1)
        assert ok.decode_error is None and len(ok.features) == 64
        bad = out[2]
        assert bad.decode_error is not None and bad.features is None


# ---------------------------------------------------------------------------
# EXIF APP1 synthesis + extraction tests (reference metadata.py:63-90)
# ---------------------------------------------------------------------------

def build_exif_app1(
    original: str | None = None,
    digitized: str | None = None,
    ifd0_datetime: str | None = None,
    byte_order: str = "II",
) -> bytes:
    """Minimal valid APP1 Exif segment carrying the given ASCII
    datetime tags (DateTimeOriginal 0x9003 / DateTimeDigitized 0x9004
    in the ExifIFD; 0x0132 DateTime in IFD0)."""
    import struct as _s

    bo = "<" if byte_order == "II" else ">"

    def entry(tag, typ, cnt, val4):
        return _s.pack(bo + "HHI", tag, typ, cnt) + val4

    # layout: TIFF header (8) | IFD0 | values | ExifIFD | values
    exif_tags = []
    if original is not None:
        exif_tags.append((0x9003, original))
    if digitized is not None:
        exif_tags.append((0x9004, digitized))

    ifd0_tags = []
    if ifd0_datetime is not None:
        ifd0_tags.append((0x0132, ifd0_datetime))

    n0 = len(ifd0_tags) + (1 if exif_tags else 0)
    ifd0_off = 8
    ifd0_size = 2 + 12 * n0 + 4
    val_off = ifd0_off + ifd0_size
    vals = b""
    entries0 = b""
    for tag, s in ifd0_tags:
        raw = s.encode("ascii") + b"\x00"
        entries0 += entry(tag, 2, len(raw), _s.pack(bo + "I", val_off + len(vals)))
        vals += raw
    exif_ifd_off = val_off + len(vals)
    if exif_tags:
        entries0 += entry(0x8769, 4, 1, _s.pack(bo + "I", exif_ifd_off))
    ifd0 = _s.pack(bo + "H", n0) + entries0 + _s.pack(bo + "I", 0)

    exif_ifd = b""
    exif_vals = b""
    if exif_tags:
        ne = len(exif_tags)
        exif_ifd_size = 2 + 12 * ne + 4
        evoff = exif_ifd_off + exif_ifd_size
        entries_e = b""
        for tag, s in exif_tags:
            raw = s.encode("ascii") + b"\x00"
            entries_e += entry(tag, 2, len(raw), _s.pack(bo + "I", evoff + len(exif_vals)))
            exif_vals += raw
        exif_ifd = _s.pack(bo + "H", ne) + entries_e + _s.pack(bo + "I", 0)

    tiff = (
        byte_order.encode("ascii")
        + _s.pack(bo + "H", 42)
        + _s.pack(bo + "I", ifd0_off)
        + ifd0
        + vals
        + exif_ifd
        + exif_vals
    )
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + _s.pack(">H", len(body) + 2) + body


def with_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI."""
    assert jpeg[:2] == b"\xff\xd8"
    return jpeg[:2] + app1 + jpeg[2:]


class TestExifDatetime:
    def _jpeg(self):
        rng = np.random.RandomState(9)
        return encode_jpeg(rng.randint(0, 256, size=(16, 24, 3)).astype("uint8"))

    def test_priority_original_over_digitized(self):
        from photo_dedup_spark.functions.jpeg import decode_jpeg, exif_datetime

        j = with_exif(
            self._jpeg(),
            build_exif_app1(
                original="2021:03:04 10:11:12", digitized="2020:01:01 00:00:00"
            ),
        )
        assert exif_datetime(j) == "2021:03:04 10:11:12"
        # the APP1 splice must not disturb pixel decode
        w, h, c, px = decode_jpeg(j)
        assert (w, h, c) == (24, 16, 3)

    def test_digitized_fallback_and_big_endian(self):
        from photo_dedup_spark.functions.jpeg import exif_datetime

        j = with_exif(
            self._jpeg(),
            build_exif_app1(digitized="2019:12:31 23:59:59", byte_order="MM"),
        )
        assert exif_datetime(j) == "2019:12:31 23:59:59"

    def test_no_exif_and_malformed(self):
        from photo_dedup_spark.functions.jpeg import exif_datetime

        assert exif_datetime(self._jpeg()) is None
        # truncated TIFF body: None, never an exception
        app1 = build_exif_app1(original="2021:03:04 10:11:12")
        broken = b"\xff\xe1\x00\x0aExif\x00\x00II"
        assert exif_datetime(self._jpeg()[:2] + broken + self._jpeg()[2:]) is None

    def test_ifd0_datetime_alone_is_not_capture_date(self):
        # reference priority is strictly 36867 -> 36868 (metadata.py:83-89);
        # the IFD0 0x0132 modification date must NOT satisfy it
        from photo_dedup_spark.functions.jpeg import exif_datetime

        j = with_exif(self._jpeg(), build_exif_app1(ifd0_datetime="2018:01:01 01:01:01"))
        assert exif_datetime(j) is None

    def test_surfaces_through_decode_and_f5_parse(self, spark):
        from photo_dedup_spark.functions.dates import parse_datetime_multi
        from photo_dedup_spark.functions.multimodal import decode_image_features
        import pyspark.sql.functions as F

        j = with_exif(self._jpeg(), build_exif_app1(original="2021:03:04 10:11:12"))
        media = spark.createDataFrame(
            [(1, bytearray(j)), (2, bytearray(self._jpeg()))],
            "media_id long, payload binary",
        )
        out = (
            decode_image_features(media)
            .withColumn("exif_ts", parse_datetime_multi(F.col("exif_datetime")))
            .orderBy("media_id")
            .collect()
        )
        assert out[0].exif_datetime == "2021:03:04 10:11:12"
        assert str(out[0].exif_ts) == "2021-03-04 10:11:12"
        assert out[1].exif_datetime is None and out[1].exif_ts is None
        assert out[0].decode_error is None


# --- progressive (SOF2) fixtures -------------------------------------------


def _quant_zz_planes(pixels: np.ndarray):
    """Per-component quantized zigzag blocks (1×1 sampling, raster order)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    bw, bh = -(-w // 8), -(-h // 8)
    comps = []
    for pl in planes:
        padded = np.pad(pl, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _C @ (blk - 128.0) @ _C.T
                q = np.rint(coef / _QUANT).astype(np.int64)
                blocks.append(q.reshape(-1)[_ZIGZAG])
        comps.append(blocks)
    return comps, bw, bh


def encode_jpeg_progressive(
    pixels: np.ndarray,
    dc_al: int = 0,
    ac_al: int = 0,
    bands: tuple = ((1, 63),),
) -> bytes:
    """Progressive (SOF2) writer over the same tables as encode_jpeg:
    interleaved DC first scan at Al=dc_al with refinement scans down to
    0, then per-component per-band AC first scans at Al=ac_al with full
    G.1.2.2-style refinement scans (newly-nonzero (r,1) symbols, sign
    bits, buffered correction bits).  1×1 sampling only."""
    comps, bw, bh = _quant_zz_planes(pixels)
    nc = len(comps)
    h, w = pixels.shape[:2]
    nblocks = bw * bh
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0)
    out += bytes(int(x) for x in _QUANT.reshape(-1)[_ZIGZAG])
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, 0])
    for tc, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc << 4)
        out += bytes(bits) + vals

    def sos(cids, ss, se, ah, al, payload):
        seg = bytearray(
            b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(cids), len(cids))
        )
        for cid in cids:
            seg += bytes([cid, 0x00])
        seg += bytes([ss, se, (ah << 4) | al])
        return bytes(seg) + payload

    # DC first (interleaved; 1x1 sampling ⇒ one block per comp per MCU)
    wr = _BitWriter()
    pred = [0] * nc
    for bi in range(nblocks):
        for ci in range(nc):
            v = int(comps[ci][bi][0]) >> dc_al
            s, mag = _magnitude(v - pred[ci])
            c, l = _DC_CODES[s]
            wr.put(c, l)
            if s:
                wr.put(mag, s)
            pred[ci] = v
    wr.align_ones()
    out += sos(list(range(1, nc + 1)), 0, 0, 0, dc_al, bytes(wr.out))
    for lev in range(dc_al - 1, -1, -1):
        wr = _BitWriter()
        for bi in range(nblocks):
            for ci in range(nc):
                wr.put((int(comps[ci][bi][0]) >> lev) & 1, 1)
        wr.align_ones()
        out += sos(list(range(1, nc + 1)), 0, 0, lev + 1, lev, bytes(wr.out))

    # AC first scans (per component, per band)
    for ci in range(nc):
        for ss, se in bands:
            wr = _BitWriter()
            for bi in range(nblocks):
                r = 0
                for k in range(ss, se + 1):
                    v = int(comps[ci][bi][k])
                    t = abs(v) >> ac_al
                    if t == 0:
                        r += 1
                        continue
                    while r > 15:
                        c, l = _AC_CODES[0xF0]
                        wr.put(c, l)
                        r -= 16
                    tv = t if v > 0 else -t
                    s, mag = _magnitude(tv)
                    c, l = _AC_CODES[(r << 4) | s]
                    wr.put(c, l)
                    wr.put(mag, s)
                    r = 0
                if r > 0:
                    c, l = _AC_CODES[0x00]
                    wr.put(c, l)
            wr.align_ones()
            out += sos([ci + 1], ss, se, 0, ac_al, bytes(wr.out))

    # AC refinement scans
    for lev in range(ac_al - 1, -1, -1):
        ah = lev + 1
        for ci in range(nc):
            for ss, se in bands:
                wr = _BitWriter()
                for bi in range(nblocks):
                    r = 0
                    br: list[int] = []

                    def flush_br():
                        for b_ in br:
                            wr.put(b_, 1)
                        br.clear()

                    for k in range(ss, se + 1):
                        v = int(comps[ci][bi][k])
                        a = abs(v)
                        if (a >> lev) == 0:
                            r += 1
                            continue
                        if (a >> ah) == 0:  # newly nonzero at this level
                            while r > 15:
                                c, l = _AC_CODES[0xF0]
                                wr.put(c, l)
                                flush_br()
                                r -= 16
                            c, l = _AC_CODES[(r << 4) | 1]
                            wr.put(c, l)
                            wr.put(1 if v > 0 else 0, 1)
                            flush_br()
                            r = 0
                        else:  # correction bit, buffered
                            br.append((a >> lev) & 1)
                    if r > 0 or br:
                        c, l = _AC_CODES[0x00]
                        wr.put(c, l)
                        flush_br()
                wr.align_ones()
                out += sos([ci + 1], ss, se, ah, lev, bytes(wr.out))
    out += b"\xff\xd9"
    return bytes(out)


class TestProgressiveJpeg:
    def test_spectral_selection_matches_baseline(self):
        # same coefficients through SOF2 spectral-selection scans must
        # reconstruct byte-identically to the baseline encoding
        img = _gradient(24, 33)
        base = decode_jpeg(encode_jpeg(img))[3]
        prog = decode_jpeg(
            encode_jpeg_progressive(img, bands=((1, 5), (6, 20), (21, 63)))
        )[3]
        assert np.array_equal(base, prog)

    def test_rgb_interleaved_dc_and_band_scans(self):
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, size=(17, 26, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img))[3]
        prog = decode_jpeg(encode_jpeg_progressive(img, bands=((1, 63),)))[3]
        assert np.array_equal(base, prog)

    def test_successive_approximation_full(self):
        # DC Al=1 + refinement, AC Al=2 + two refinement levels — every
        # decoder path: newly-nonzero symbols, sign bits, buffered
        # correction bits, EOB-with-corrections, ZRL-in-refinement
        img = _gradient(40, 31)
        base = decode_jpeg(encode_jpeg(img))[3]
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, dc_al=1, ac_al=2, bands=((1, 9), (10, 63))
            )
        )[3]
        assert np.array_equal(base, prog)

    def test_successive_approximation_noise_rgb(self):
        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img))[3]
        prog = decode_jpeg(
            encode_jpeg_progressive(img, dc_al=2, ac_al=1, bands=((1, 63),))
        )[3]
        assert np.array_equal(base, prog)

    def test_truncated_progressive_is_valueerror(self):
        img = _gradient(24, 24)
        data = encode_jpeg_progressive(img, ac_al=1)
        with pytest.raises(ValueError):
            decode_jpeg(data[: int(len(data) * 0.4)])
