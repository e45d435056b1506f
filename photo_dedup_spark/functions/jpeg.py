"""Pure-numpy baseline JPEG (SOF0) decoder.

The reference's actual image path opens compressed files via PIL
(/root/reference/photo_dedup/hasher.py:95-154); JPEG is the dominant
codec of any real photo corpus.  This module decodes baseline
sequential-DCT JPEG natively — stdlib ``struct`` + numpy only:

  * markers: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI;
  * Huffman tables and quantization tables are read FROM THE FILE
    (DHT/DQT), never assumed;
  * entropy decode: canonical Huffman, DC prediction + EXTEND,
    AC run/size with ZRL and EOB, 0xFF00 byte unstuffing, RSTn
    restart markers with predictor reset;
  * dequantize → un-zigzag → batched separable IDCT (one tensordot
    per component, not per block) → level shift;
  * chroma upsampling for any (h,v) sampling factors (4:4:4, 4:2:0,
    4:2:2, ...) by pixel repetition; BT.601 YCbCr→RGB.

Progressive (SOF2) decodes too (round 4): per-scan coefficient
accumulation across DC-first/DC-refinement/AC-band/AC-refinement
scans (T.81 G.2, incl. EOB runs and successive-approximation
correction bits), then the same shared IDCT reconstruction.

Unsupported (raise ValueError → the per-row ``decode_error``
count-and-drop contract in multimodal.decode_image_features):
lossless (SOF3) and arithmetic-coded JPEGs, 12-bit precision,
component counts other than 1 or 3.

Scale note: the bit-serial Huffman walk is interpreter-bound (~the
cost PIL pays in C); at 100 TB the decode stage parallelizes per
payload across executors via mapInPandas, so per-image decode speed
bounds single-task latency, not pipeline throughput.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index z in scan order -> (row, col) flat index
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

# 8-point DCT-II basis: C[k, n] = c(k) cos((2n+1) k pi / 16)
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _idct2(coefs: np.ndarray) -> np.ndarray:
    """Batched 2-D inverse DCT: (n, 8, 8) coefficient blocks ->
    (n, 8, 8) spatial blocks.  block = C^T @ coef @ C."""
    return np.einsum("ki,nkl,lj->nij", _C, coefs, _C, optimize=True)


class _HuffTable:
    """Canonical Huffman decoder built from DHT (BITS, HUFFVAL)."""

    __slots__ = ("min_code", "max_code", "val_ptr", "huffval")

    def __init__(self, bits: list[int], huffval: bytes):
        # JPEG F.2.2.3 DECODE: per length l, codes are consecutive;
        # min_code/max_code delimit them, val_ptr indexes huffval
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        self.huffval = huffval
        code = 0
        k = 0
        for l in range(1, 17):
            if bits[l - 1]:
                self.val_ptr[l] = k
                self.min_code[l] = code
                code += bits[l - 1]
                k += bits[l - 1]
                self.max_code[l] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing and restart-marker awareness."""

    __slots__ = ("data", "pos", "bitbuf", "bitcnt")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.bitcnt = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            # the module contract is typed ValueError on malformed input
            # (ADVICE r3) — a bare IndexError here would escape as an
            # internal error instead of a decode error
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                # marker reached (EOI / RSTn seen early): JPEG pads the
                # tail with 1-bits by spec
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.bitcnt += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.bitcnt += 8

    def read_bit(self) -> int:
        if self.bitcnt == 0:
            self._fill()
        self.bitcnt -= 1
        return (self.bitbuf >> self.bitcnt) & 1

    def receive(self, n: int) -> int:
        v = 0
        while self.bitcnt < n:
            self._fill()
        self.bitcnt -= n
        v = (self.bitbuf >> self.bitcnt) & ((1 << n) - 1)
        return v

    def align_and_expect_rst(self) -> None:
        """Byte-align and consume an RSTn marker (F.2.1.3.1)."""
        self.bitbuf = 0
        self.bitcnt = 0
        d = self.data
        # skip pad bytes up to the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")

    def decode_huff(self, table: _HuffTable) -> int:
        code = 0
        for l in range(1, 17):
            code = (code << 1) | self.read_bit()
            if table.max_code[l] >= 0 and code <= table.max_code[l]:
                return table.huffval[table.val_ptr[l] + code - table.min_code[l]]
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """F.2.2.1 EXTEND: map s received bits to a signed magnitude."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline JPEG bytes -> (w, h, channels, HxWxC uint8 pixels).

    channels is 3 (RGB, from YCbCr) or 1 (grayscale).  Raises
    ValueError for anything outside baseline sequential 8-bit."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("unsupported codec (not JPEG)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    progressive = False
    prog: dict | None = None  # stores/geometry once the first SOS arrives
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte before a marker (B.1.1.2)
            i += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        body = data[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise ValueError("unsupported 16-bit quant table")
                qt[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=j + 1
                ).astype(np.int32)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                huff[(tc, th)] = _HuffTable(bits, body[j + 17 : j + 17 + n])
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = (w, h, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("unsupported JPEG mode (lossless/arithmetic)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if not progressive:
                scan_tables = {}
                for c in range(ns):
                    cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                    scan_tables[cs] = (tt >> 4, tt & 0xF)
                return _decode_scan(
                    data, i, frame, qt, huff, scan_tables, restart_interval
                )
            # progressive: accumulate this scan's coefficients and keep
            # walking markers (DHT may precede each scan)
            scan_comps = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if prog is None:
                prog = _init_prog_stores(frame)
            i = _decode_prog_scan(
                data,
                i,
                frame,
                prog,
                huff,
                scan_comps,
                ss,
                se,
                ahal >> 4,
                ahal & 0xF,
                restart_interval,
            )
    if progressive and prog is not None and prog["scans"] > 0:
        w, h, comps = frame
        return _reconstruct(
            w, h, comps, qt, prog["stores"], prog["mcux"], prog["mcuy"]
        )
    raise ValueError("no SOS marker (truncated JPEG)")


def _init_prog_stores(frame) -> dict:
    """Per-component full-image coefficient stores for progressive
    decode (filled across scans, reconstructed at EOI)."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    stores = [
        np.zeros(((mcux * c["h"]) * (mcuy * c["v"]), 64), dtype=np.int32)
        for c in comps
    ]
    return {"stores": stores, "mcux": mcux, "mcuy": mcuy, "scans": 0}


def _decode_prog_scan(
    data: bytes,
    pos: int,
    frame,
    prog: dict,
    huff: dict,
    scan_comps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> int:
    """Decode one progressive scan (T.81 G.2) into ``prog['stores']``;
    returns the offset of the next marker after the entropy data.

    Covers all four scan kinds: DC first (diff-coded, << Al), DC
    refinement (one bit per block), AC first (run/size with EOB runs,
    << Al), and AC refinement (correction bits, G.1.2.3).  DC scans may
    be interleaved; AC scans are single-component by spec."""
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux, mcuy = prog["mcux"], prog["mcuy"]
    stores = prog["stores"]
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
    reader = _BitReader(data, pos)

    if not 0 <= al <= 13 or se > 63 or ss > se:
        raise ValueError("bad progressive scan parameters")
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("DC scan must have Se=0")

    p1 = 1 << al

    def _refine_nonzero(blk: np.ndarray, k: int, upto: int) -> None:
        """Correction bits for already-nonzero coeffs in blk[k..upto]."""
        for kk in range(k, upto + 1):
            v = int(blk[kk])
            if v != 0 and reader.read_bit():
                if v > 0:
                    if not v & p1:
                        blk[kk] = v + p1
                else:
                    if not (-v) & p1:
                        blk[kk] = v - p1

    state = {"eobrun": 0}

    def _ac_first(blk: np.ndarray) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ac_tab = huff[(1, scan_comps[0][2])]
        k = ss
        while k <= se:
            rs = reader.decode_huff(ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.receive(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1

    def _ac_refine(blk: np.ndarray) -> None:
        if state["eobrun"] > 0:
            _refine_nonzero(blk, ss, se)
            state["eobrun"] -= 1
            return
        ac_tab = huff[(1, scan_comps[0][2])]
        k = ss
        while k <= se:
            rs = reader.decode_huff(ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r != 15:  # EOBn: refine the rest of the band, run on
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.receive(r)
                    _refine_nonzero(blk, k, se)
                    return
                newval = 0  # ZRL in refinement: skip 16 zero-history slots
            elif s == 1:
                newval = p1 if reader.read_bit() else -p1
            else:
                raise ValueError("bad refinement size")
            # advance over r zero-history coeffs, emitting correction
            # bits for nonzero-history ones passed along the way
            while k <= se:
                v = int(blk[k])
                if v != 0:
                    if reader.read_bit():
                        if v > 0:
                            if not v & p1:
                                blk[k] = v + p1
                        else:
                            if not (-v) & p1:
                                blk[k] = v - p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                blk[k] = newval
            k += 1

    if is_dc:
        # DC scans iterate the full MCU grid (interleaved when ns>1)
        members = []
        for cs, td, _ta in scan_comps:
            if cs not in by_id:
                raise ValueError(f"unknown scan component {cs}")
            ci, c = by_id[cs]
            if ah == 0 and (0, td) not in huff:
                raise ValueError("missing Huffman table")
            members.append((ci, c, td))
        pred = [0] * len(members)
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    reader.align_and_expect_rst()
                    pred = [0] * len(members)
                for mi, (ci, c, td) in enumerate(members):
                    wblocks = mcux * c["h"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            bi = (my * c["v"] + by) * wblocks + (mx * c["h"] + bx)
                            blk = stores[ci][bi]
                            if ah == 0:
                                s = reader.decode_huff(huff[(0, td)])
                                if s > 11:
                                    raise ValueError("bad DC category")
                                diff = (
                                    _extend(reader.receive(s), s) if s else 0
                                )
                                pred[mi] += diff
                                blk[0] = pred[mi] << al
                            else:  # refinement: one appended bit
                                if reader.read_bit():
                                    blk[0] = int(blk[0]) | p1
                mcu_count += 1
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        cs, _td, ta = scan_comps[0]
        if cs not in by_id:
            raise ValueError(f"unknown scan component {cs}")
        ci, c = by_id[cs]
        if (1, ta) not in huff:
            raise ValueError("missing Huffman table")
        # non-interleaved block grid: the component's true extent
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        bw = -(-cw // 8)
        bh = -(-ch // 8)
        stride = mcux * c["h"]
        mcu_count = 0
        for by in range(bh):
            for bx in range(bw):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    reader.align_and_expect_rst()
                    state["eobrun"] = 0
                blk = stores[ci][by * stride + bx]
                if ah == 0:
                    _ac_first(blk)
                else:
                    _ac_refine(blk)
                mcu_count += 1

    prog["scans"] += 1
    # skip to the next true marker (not stuffing, not RSTn)
    end = reader.pos
    while end + 1 < len(data):
        if (
            data[end] == 0xFF
            and data[end + 1] != 0x00
            and not 0xD0 <= data[end + 1] <= 0xD7
        ):
            break
        end += 1
    return end


def _decode_scan(
    data: bytes,
    pos: int,
    frame,
    qt: dict,
    huff: dict,
    scan_tables: dict,
    restart_interval: int,
) -> tuple[int, int, int, np.ndarray]:
    w, h, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(data, pos)

    # per component: coefficient store (n_blocks, 64) in raster block order
    stores = []
    for c in comps:
        nb = (mcux * c["h"]) * (mcuy * c["v"])
        stores.append(np.zeros((nb, 64), dtype=np.int32))
        if c["tq"] not in qt:
            raise ValueError(f"missing quant table {c['tq']}")
        td_ta = scan_tables.get(c["id"])
        if td_ta is None:
            raise ValueError(f"component {c['id']} absent from scan")
        c["td"], c["ta"] = td_ta
        if (0, c["td"]) not in huff or (1, c["ta"]) not in huff:
            raise ValueError("missing Huffman table")

    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_and_expect_rst()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = huff[(0, c["td"])]
                ac_tab = huff[(1, c["ta"])]
                wblocks = mcux * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = reader.decode_huff(dc_tab)
                        if s > 11:
                            raise ValueError("bad DC category")
                        diff = _extend(reader.receive(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        bi = (my * c["v"] + by) * wblocks + (mx * c["h"] + bx)
                        stores[ci][bi] = zz
            mcu_count += 1

    return _reconstruct(w, h, comps, qt, stores, mcux, mcuy)


def _reconstruct(
    w: int, h: int, comps, qt: dict, stores, mcux: int, mcuy: int
) -> tuple[int, int, int, np.ndarray]:
    """Shared tail of baseline and progressive decode: dequantize →
    un-zigzag → batched IDCT → upsample → color convert."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        deq = stores[ci] * q[np.newaxis, :]
        blocks = np.zeros((deq.shape[0], 64), dtype=np.float64)
        blocks[:, _ZIGZAG] = deq  # un-zigzag
        spatial = _idct2(blocks.reshape(-1, 8, 8)) + 128.0
        wb = mcux * c["h"]
        vb = mcuy * c["v"]
        plane = (
            spatial.reshape(vb, wb, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(vb * 8, wb * 8)
        )
        # crop to the component's true extent, then upsample to full res
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        px = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return w, h, 1, px[:, :, np.newaxis]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return w, h, 3, px


# ---------------------------------------------------------------------------
# EXIF datetime extraction (reference metadata.py:63-90)
# ---------------------------------------------------------------------------
# The reference reads the capture date from the image's EXIF block with
# strict priority DateTimeOriginal (36867) -> DateTimeDigitized (36868)
# before falling back to mtime (metadata.py:96-121).  We walk the APP1
# "Exif\0\0" segment's TIFF structure directly (both byte orders):
# IFD0 -> ExifIFD pointer (0x8769) -> ASCII tags.  Any malformed EXIF
# yields None, never an error — the reference logs and continues
# (metadata.py:91-93); EXIF damage must not fail an otherwise
# decodable image.

_EXIF_DT_ORIGINAL = 0x9003   # 36867 DateTimeOriginal
_EXIF_DT_DIGITIZED = 0x9004  # 36868 DateTimeDigitized
_EXIF_IFD_PTR = 0x8769


def _find_app1_exif(data: bytes) -> bytes | None:
    """Return the TIFF payload of the first APP1 Exif segment, or None.
    Same marker walk as :func:`decode_jpeg`, stopping at SOS."""
    if data[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return None
        marker = data[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 before image data
            return None
        (seglen,) = struct.unpack(">H", data[i + 2 : i + 4])
        body = data[i + 4 : i + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return body[6:]
        i += 2 + seglen
    return None


def _ifd_entries(tiff: bytes, bo: str, off: int) -> list[tuple[int, int, int, bytes]]:
    """(tag, type, count, raw 4-byte value field) entries of the IFD at
    *off* (offsets are relative to the TIFF header start, per spec)."""
    (n,) = struct.unpack_from(bo + "H", tiff, off)
    out = []
    for k in range(n):
        base = off + 2 + 12 * k
        tag, typ = struct.unpack_from(bo + "HH", tiff, base)
        (cnt,) = struct.unpack_from(bo + "I", tiff, base + 4)
        out.append((tag, typ, cnt, tiff[base + 8 : base + 12]))
    return out


def _ascii_value(tiff: bytes, bo: str, typ: int, cnt: int, raw: bytes) -> str | None:
    if typ != 2:  # ASCII
        return None
    if cnt <= 4:
        val = raw[:cnt]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        val = tiff[off : off + cnt]
    return val.split(b"\x00", 1)[0].decode("ascii", errors="replace")


def exif_datetime(data: bytes) -> str | None:
    """Raw EXIF datetime string ("YYYY:MM:DD HH:MM:SS") with the
    reference's priority DateTimeOriginal -> DateTimeDigitized
    (metadata.py:83-89), or None.  Never raises."""
    try:
        tiff = _find_app1_exif(data)
        if tiff is None:
            return None
        bo = {b"II": "<", b"MM": ">"}.get(tiff[:2])
        if bo is None or struct.unpack_from(bo + "H", tiff, 2)[0] != 42:
            return None
        (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
        ifd0 = _ifd_entries(tiff, bo, ifd0_off)
        entries = list(ifd0)
        for tag, typ, cnt, raw in ifd0:
            if tag == _EXIF_IFD_PTR:
                (exif_off,) = struct.unpack(bo + "I", raw)
                # ExifIFD first: the datetime tags canonically live there
                entries = _ifd_entries(tiff, bo, exif_off) + entries
                break
        for want in (_EXIF_DT_ORIGINAL, _EXIF_DT_DIGITIZED):
            for tag, typ, cnt, raw in entries:
                if tag == want:
                    v = _ascii_value(tiff, bo, typ, cnt, raw)
                    if v and v.strip():
                        return v
        return None
    except Exception:
        return None  # malformed EXIF: log-and-continue contract
