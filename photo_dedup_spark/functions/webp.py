"""Pure-Python WEBP lossless (VP8L) decoder — full bitstream to RGBA.

The reference's image envelope includes ``.webp`` via PIL
(/root/reference/photo_dedup/hasher.py:23, opened at hasher.py:95-154).
WEBP has two coding modes: lossy (VP8 intra frames) and lossless
(VP8L).  This module decodes the LOSSLESS mode natively per the public
bitstream specification (RFC 9649 / WebP Lossless Bitstream Spec):

  * RIFF container walk — bare ``VP8L`` chunks and extended ``VP8X``
    files whose image chunk is VP8L;
  * canonical prefix (Huffman) codes, both the "simple" (1-2 symbol)
    and normal forms, the code-length code with 16/17/18 repeats and
    the max-symbol trimming;
  * LZ77 backward references with the 120-entry 2D distance-code
    neighborhood map, the color cache (hash-indexed recent pixels),
    and meta-prefix tiling (per-tile code groups);
  * all four transforms, inverted in reverse order: predictor (the 14
    spatial predictors with edge rules), cross-color, subtract-green,
    and color-indexing (palette, including sub-byte pixel bundling).

Lossy ``VP8 `` payloads stay in the gated tier (a full VP8 intra-frame
decoder — boolean arithmetic coder, loop filter — is out of scope);
they raise the typed per-row decode error like HEIC.

Decoding is an interpreter-bound per-pixel walk like the JPEG Huffman
path (jpeg.py:24-27) — correct first; per-payload parallelism bounds
latency at scale, not throughput.  Malformed input raises ValueError
(the count-and-drop contract in multimodal.decode_image_features).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit reader: LSB-first within bytes (VP8L spec §3)
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


# ---------------------------------------------------------------------------
# canonical prefix codes (spec §4.1): code bits consumed MSB-first
# ---------------------------------------------------------------------------


class _Huff:
    """Canonical prefix code: decode by accumulating stream bits
    (LSB-first from bytes) as MSB-first code bits, like DEFLATE."""

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]  # 0-bit code
            self.table = {}
            return
        self.single = None
        # canonical assignment: symbols ordered by (length, symbol)
        nz.sort()
        code = 0
        prev_len = nz[0][0]
        table: dict[tuple[int, int], int] = {}
        kraft = 0
        for length, sym in nz:
            code <<= length - prev_len
            prev_len = length
            table[(length, code)] = sym
            code += 1
            kraft += 1 << (15 - length) if length <= 15 else 0
        if kraft != (1 << 15) or any(l > 15 for l, _ in nz):
            raise ValueError("invalid (non-complete) prefix code")
        self.table = table

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad prefix code in VP8L stream")


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_code_lengths(br: _Bits, alphabet: int) -> list[int]:
    """Normal-form prefix code: code-length code + 16/17/18 repeats
    (spec §4.1.1), with the optional max-symbol trimming."""
    cl_lens = [0] * 19
    n_cl = 4 + br.read(4)
    for i in range(n_cl):
        cl_lens[_CL_ORDER[i]] = br.read(3)
    cl = _Huff(cl_lens)
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    if i > alphabet:
        raise ValueError("prefix code lengths overflow alphabet")
    return lengths


def _read_prefix_code(br: _Bits, alphabet: int) -> _Huff:
    if br.read(1):  # simple form (spec §4.1.2)
        n_sym = 1 + br.read(1)
        if br.read(1):  # first symbol in 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        lengths = [0] * alphabet
        if n_sym == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet or sym1 >= alphabet:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1  # single symbol: 0-bit code (handled in _Huff)
        return _Huff(lengths)
    return _Huff(_read_code_lengths(br, alphabet))


# ---------------------------------------------------------------------------
# LZ77 prefix values + the 2D distance-code neighborhood (spec §4.2.2)
# ---------------------------------------------------------------------------


def _lz77_value(br: _Bits, code: int) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _make_distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance codes as (dy, dx) pairs, ordered by
    squared Euclidean distance, then dy descending, then dx
    descending — the ordering that generates libwebp's code↔plane
    lookup tables (verified against that table in tests)."""
    cand = [
        (y, x)
        for y in range(8)
        for x in range(-7, 9)
        if y > 0 or x > 0
    ]
    cand.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[0], -p[1]))
    return cand


_DIST_MAP = _make_distance_map()


def _plane_code_to_distance(xsize: int, code: int) -> int:
    if code > 120:
        return code - 120
    dy, dx = _DIST_MAP[code - 1]
    return max(dy * xsize + dx, 1)


# ---------------------------------------------------------------------------
# entropy-coded image (spec §4.2.3 / §5): shared by ARGB + subimages
# ---------------------------------------------------------------------------

_GROUP_ALPHABETS = (None, 256, 256, 256, 40)  # green computed per cache size


def _read_group(br: _Bits, cache_bits: int) -> list[_Huff]:
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    return [
        _read_prefix_code(br, green_alpha if i == 0 else _GROUP_ALPHABETS[i])
        for i in range(5)
    ]


def _decode_image(br: _Bits, w: int, h: int, is_level0: bool) -> np.ndarray:
    """One entropy-coded image → (h, w, 4) uint8 ARGB planes [A,R,G,B]."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError(f"bad color-cache size {cache_bits}")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    groups: list[list[_Huff]]
    meta = None
    meta_bits = 0
    if is_level0 and br.read(1):  # meta-prefix tiling
        meta_bits = 2 + br.read(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_image(br, mw, mh, False)
        meta = (
            meta_img[:, :, 1].astype(np.int32) << 8
        ) | meta_img[:, :, 2].astype(np.int32)
        n_groups = int(meta.max()) + 1
    else:
        n_groups = 1
    groups = [_read_group(br, cache_bits) for _ in range(n_groups)]

    out = np.zeros((h * w, 4), dtype=np.uint8)
    pos = 0
    total = h * w
    cache_shift = 32 - cache_bits if cache_bits else 0

    def cache_insert(a: int, r: int, g: int, b: int) -> None:
        argb = (a << 24) | (r << 16) | (g << 8) | b
        cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> cache_shift] = argb

    g_codes = groups[0]
    cur_tile = -1
    while pos < total:
        if meta is not None:
            y, x = divmod(pos, w)
            tile = int(meta[y >> meta_bits, x >> meta_bits])
            if tile != cur_tile:
                g_codes = groups[tile]
                cur_tile = tile
        sym = g_codes[0].read(br)
        if sym < 256:  # literal
            g = sym
            r = g_codes[1].read(br)
            b = g_codes[2].read(br)
            a = g_codes[3].read(br)
            out[pos] = (a, r, g, b)
            if cache is not None:
                cache_insert(a, r, g, b)
            pos += 1
        elif sym < 280:  # LZ77 backward reference
            length = _lz77_value(br, sym - 256)
            dist_code = _lz77_value(br, g_codes[4].read(br))
            dist = _plane_code_to_distance(w, dist_code)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            for i in range(length):
                out[pos] = out[pos - dist]
                if cache is not None:
                    a, r, g, b = out[pos]
                    cache_insert(int(a), int(r), int(g), int(b))
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("cache symbol without color cache")
            argb = cache[sym - 280]
            out[pos] = (argb >> 24 & 0xFF, argb >> 16 & 0xFF, argb >> 8 & 0xFF, argb & 0xFF)
            pos += 1
    return out.reshape(h, w, 4)


# ---------------------------------------------------------------------------
# inverse transforms (spec §3)
# ---------------------------------------------------------------------------


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a.astype(np.uint16) + b.astype(np.uint16)) >> 1).astype(np.uint8)


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """One of the 14 spatial predictors over int arrays of shape (4,)."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.uint8)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # select
        pa_minus_pb = int(
            np.sum(
                np.abs(L.astype(np.int32) - TL.astype(np.int32))
                - np.abs(T.astype(np.int32) - TL.astype(np.int32))
            )
        )
        return T if pa_minus_pb <= 0 else L
    if mode == 12:  # clamp-add-subtract-full
        return np.clip(
            L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32), 0, 255
        ).astype(np.uint8)
    if mode == 13:  # clamp-add-subtract-half
        ave = (L.astype(np.int32) + T.astype(np.int32)) >> 1
        d = ave - TL.astype(np.int32)
        # C int division truncates toward zero
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(ave + half, 0, 255).astype(np.uint8)
    raise ValueError(f"bad predictor mode {mode}")


def _inv_predictor(argb: np.ndarray, modes: np.ndarray, bits: int) -> np.ndarray:
    h, w = argb.shape[:2]
    px = argb.astype(np.uint8).copy()
    black = np.array([255, 0, 0, 0], dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits])
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                # linear pixel addressing: TR of the last column is the
                # CURRENT row's first pixel (pos - width + 1), already
                # reconstructed at this point
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            px[y, x] = (
                px[y, x].astype(np.int32) + pred.astype(np.int32)
            ).astype(np.uint8)
    return px


def _ctdelta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """(int8(t) * int8(c)) >> 5, elementwise (spec §3.2)."""
    ts = t.astype(np.int8).astype(np.int32)
    cs = c.astype(np.int8).astype(np.int32)
    return (ts * cs) >> 5


def _inv_color_transform(argb: np.ndarray, elems: np.ndarray, bits: int) -> np.ndarray:
    h, w = argb.shape[:2]
    ys = np.arange(h) >> bits
    xs = np.arange(w) >> bits
    tiles = elems[np.ix_(ys, xs)]  # (h, w, 4) ARGB of transform elements
    g2r = tiles[:, :, 3]  # blue channel
    g2b = tiles[:, :, 2]  # green channel
    r2b = tiles[:, :, 1]  # red channel
    out = argb.copy()
    g = argb[:, :, 2]
    r = (argb[:, :, 1].astype(np.int32) + _ctdelta(g2r, g)) & 0xFF
    b = argb[:, :, 3].astype(np.int32) + _ctdelta(g2b, g)
    b = (b + _ctdelta(r2b, r.astype(np.uint8))) & 0xFF
    out[:, :, 1] = r.astype(np.uint8)
    out[:, :, 3] = b.astype(np.uint8)
    return out


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    out = argb.copy()
    g = argb[:, :, 2].astype(np.uint16)
    out[:, :, 1] = ((argb[:, :, 1] + g) & 0xFF).astype(np.uint8)
    out[:, :, 3] = ((argb[:, :, 3] + g) & 0xFF).astype(np.uint8)
    return out


def _inv_color_index(
    argb: np.ndarray, palette: np.ndarray, w_real: int, pack_bits: int
) -> np.ndarray:
    h = argb.shape[0]
    if pack_bits == 0:
        idx = argb[:, :, 2].astype(np.intp)
    else:
        per = 1 << pack_bits
        field = 8 >> pack_bits  # bits per packed index
        packed = argb[:, :, 2]  # (h, packed_w)
        cols = []
        for k in range(per):
            cols.append((packed >> (k * field)) & ((1 << field) - 1))
        idx = np.stack(cols, axis=2).reshape(h, -1)[:, :w_real].astype(np.intp)
    if int(idx.max(initial=0)) >= palette.shape[0]:
        raise ValueError("palette index out of range")
    return palette[idx]


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def _decode_vp8l_stream(data: bytes) -> tuple[int, int, int, np.ndarray]:
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _Bits(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    has_alpha = br.read(1)
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    if w * h > 64_000_000:
        raise ValueError(f"unsupported VP8L dimensions {w}x{h}")

    transforms: list[tuple] = []
    seen: set[int] = set()
    xsize = w  # may shrink under color-indexing bundling
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            bits = 2 + br.read(3)
            sw = (xsize + (1 << bits) - 1) >> bits
            sh = (h + (1 << bits) - 1) >> bits
            modes = _decode_image(br, sw, sh, False)[:, :, 2]  # green
            transforms.append(("pred", bits, modes))
        elif ttype == 1:  # cross-color
            bits = 2 + br.read(3)
            sw = (xsize + (1 << bits) - 1) >> bits
            sh = (h + (1 << bits) - 1) >> bits
            elems = _decode_image(br, sw, sh, False)
            transforms.append(("color", bits, elems))
        elif ttype == 2:  # subtract green
            transforms.append(("subgreen",))
        else:  # color indexing
            n_colors = 1 + br.read(8)
            pal_deltas = _decode_image(br, n_colors, 1, False)[0]  # (n, 4)
            palette = np.cumsum(pal_deltas.astype(np.uint16), axis=0).astype(
                np.uint8
            )  # componentwise mod-256 running sum
            if n_colors <= 2:
                pack_bits = 3
            elif n_colors <= 4:
                pack_bits = 2
            elif n_colors <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            transforms.append(("palette", palette, w, pack_bits))
            if pack_bits:
                xsize = (w + (1 << pack_bits) - 1) >> pack_bits
            else:
                xsize = w

    argb = _decode_image(br, xsize, h, True)
    for t in reversed(transforms):
        if t[0] == "pred":
            argb = _inv_predictor(argb, t[2], t[1])
        elif t[0] == "color":
            argb = _inv_color_transform(argb, t[2], t[1])
        elif t[0] == "subgreen":
            argb = _inv_subtract_green(argb)
        else:
            argb = _inv_color_index(argb, t[1], t[2], t[3])
    if argb.shape[1] != w:
        raise ValueError("width mismatch after inverse transforms")

    if has_alpha and not bool((argb[:, :, 0] == 255).all()):
        rgba = argb[:, :, [1, 2, 3, 0]]
        return w, h, 4, np.ascontiguousarray(rgba)
    rgb = argb[:, :, [1, 2, 3]]
    return w, h, 3, np.ascontiguousarray(rgb)


def decode_webp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """WEBP container → (w, h, channels, HxWxC uint8 pixels).

    Lossless (VP8L) decodes natively; lossy (VP8) raises the typed
    gated-tier error."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("unsupported codec (not RIFF/WEBP)")
    i = 12
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        (size,) = struct.unpack("<I", data[i + 4 : i + 8])
        body = data[i + 8 : i + 8 + size]
        if cid == b"VP8L":
            return _decode_vp8l_stream(body)
        if cid == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 (boolean-coder intra frames) needs external "
                "codecs this container does not ship; WEBP-lossless "
                "(VP8L) decodes natively"
            )
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("RIFF/WEBP with no VP8L or VP8 image chunk")
