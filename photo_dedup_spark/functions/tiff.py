"""Pure-numpy TIFF / DNG decoder — best decodable IFD to RGB/gray pixels.

The reference's image envelope includes ``.dng`` (and PIL's TIFF plugin
behind it — /root/reference/photo_dedup/hasher.py:23, opened at
hasher.py:95-154).  DNG *is* TIFF: same header, same IFD structure,
with the raw CFA mosaic in a SubIFD and one or more RGB previews in the
IFD chain.  PIL (and therefore the reference) renders the best
non-raw image it can decode; this module does the same natively:

  * classic TIFF header, both byte orders (``II*\\0`` / ``MM\\0*``);
  * full IFD chain walk plus SubIFD descent (tag 0x014A), collecting
    every image directory in the file;
  * per-IFD decode of: compression 1 (none), 5 (TIFF LZW with the
    spec's early-change code widening + horizontal predictor 2),
    32773 (PackBits), and 7 (new-style JPEG — each strip/tile is an
    SOI-led stream, decoded by :mod:`.jpeg`, with a shared JPEGTables
    (tag 347) segment spliced in when the strip carries none);
  * photometric 0/1 (grayscale, WhiteIsZero inverted), 2 (RGB),
    3 (palette via the 16-bit ColorMap);
  * 1-, 8- and 16-bit samples (16-bit scaled to 8), strip AND tile
    layouts, PlanarConfiguration 1 (chunky);
  * IFD selection mirrors PIL-on-DNG: prefer the full-resolution
    directory (NewSubFileType == 0) when decodable, else the largest
    decodable directory (a CFA main image — photometric 32803 — is
    not decodable without a demosaic pipeline, so DNGs resolve to
    their embedded preview, which is what PIL hashes too).

Malformed input raises ValueError (the per-row ``decode_error``
count-and-drop contract in multimodal.decode_image_features).
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}

_SUBIFDS = 0x014A
_NEW_SUBFILE_TYPE = 0x00FE


def _read_entries(data: bytes, off: int, bo: str) -> tuple[dict[int, tuple], int]:
    """IFD at *off* → ({tag: (type, count, value_field_bytes, value_off)},
    next-IFD offset).  Values are materialized lazily by _tag_values."""
    if off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (n,) = struct.unpack_from(bo + "H", data, off)
    entries: dict[int, tuple] = {}
    base = off + 2
    if base + 12 * n + 4 > len(data):
        raise ValueError("truncated TIFF IFD entries")
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", data, base + 12 * i)
        vfield = data[base + 12 * i + 8 : base + 12 * i + 12]
        entries[tag] = (typ, cnt, vfield)
    (nxt,) = struct.unpack_from(bo + "I", data, base + 12 * n)
    return entries, nxt


def _tag_values(data: bytes, bo: str, entry: tuple) -> list:
    typ, cnt, vfield = entry
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"unknown TIFF tag type {typ}")
    total = size * cnt
    if total <= 4:
        raw = vfield[:total]
    else:
        (off,) = struct.unpack(bo + "I", vfield)
        raw = data[off : off + total]
        if len(raw) < total:
            raise ValueError("TIFF tag value beyond EOF")
    if typ == 2:  # ASCII
        return [raw.split(b"\0", 1)[0].decode("ascii", "replace")]
    if typ in (5, 10):  # RATIONAL
        fmt = "I" if typ == 5 else "i"
        pairs = struct.unpack(bo + fmt * (2 * cnt), raw)
        return [
            (pairs[2 * i] / pairs[2 * i + 1]) if pairs[2 * i + 1] else 0.0
            for i in range(cnt)
        ]
    if typ == 7:  # UNDEFINED: raw bytes
        return [raw]
    return list(struct.unpack(bo + _TYPE_FMT[typ] * cnt, raw))


def _collect_ifds(data: bytes) -> tuple[str, list[dict[int, tuple]]]:
    if len(data) < 8:
        raise ValueError("truncated TIFF header")
    if data[:4] == b"II*\0":
        bo = "<"
    elif data[:4] == b"MM\0*":
        bo = ">"
    else:
        raise ValueError(f"unsupported codec (magic {data[:4]!r})")
    (off,) = struct.unpack_from(bo + "I", data, 4)
    ifds: list[dict[int, tuple]] = []
    seen: set[int] = set()
    stack = [off]
    while stack and len(ifds) < 64:  # bound malicious chains
        off = stack.pop()
        if off == 0 or off in seen:
            continue
        seen.add(off)
        entries, nxt = _read_entries(data, off, bo)
        ifds.append(entries)
        if nxt:
            stack.append(nxt)
        if _SUBIFDS in entries:
            try:
                stack.extend(int(v) for v in _tag_values(data, bo, entries[_SUBIFDS]))
            except (ValueError, struct.error):
                pass  # unreadable SubIFD pointer: skip the branch
    if not ifds:
        raise ValueError("TIFF contains no IFD")
    return bo, ifds


def _unpackbits_tiff(comp: bytes, expect: int) -> bytes:
    """PackBits (TIFF §9): n∈[0,127] copy n+1; n∈[-127,-1] repeat 1-n;
    -128 noop."""
    out = bytearray()
    i = 0
    while i < len(comp) and len(out) < expect:
        n = comp[i]
        i += 1
        if n < 128:
            out += comp[i : i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(comp):
                break
            out += comp[i : i + 1] * (257 - n)
            i += 1
        # 128: noop
    if len(out) < expect:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expect])


def _lzw_decode_tiff(comp: bytes, expect: int) -> bytes:
    """TIFF-variant LZW (§13): MSB-first bit packing, 9→12-bit codes,
    clear=256/EOI=257, EARLY code-width change (widen when the next
    table index reaches 2^w − 1, one code earlier than GIF)."""
    if not comp:
        raise ValueError("empty LZW strip")
    out = bytearray()
    # dictionary as bytes list; rebuilt on clear
    dict_base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(dict_base)
    width = 9
    bitbuf = 0
    bitcnt = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < expect:
        while bitcnt < width:
            if pos >= len(comp):
                raise ValueError("truncated LZW strip")
            bitbuf = (bitbuf << 8) | comp[pos]
            pos += 1
            bitcnt += 8
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == 256:  # clear
            table = list(dict_base)
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("bad first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW code out of range")
        out += entry
        prev = entry
        # early change: widen when the NEXT append would need more bits
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("truncated LZW strip")
    return bytes(out[:expect])


def _splice_jpeg_tables(strip: bytes, tables: bytes | None) -> bytes:
    """TIFF/EP compression-7 strip + optional JPEGTables → standalone
    JPEG stream.  Tables segment is SOI..EOI wrapping DQT/DHT; splice
    its body after the strip's SOI when the strip has no DQT."""
    if strip[:2] != b"\xff\xd8":
        raise ValueError("compression-7 strip is not an SOI-led JPEG stream")
    if tables is None or b"\xff\xdb" in strip[:4096]:
        return strip
    body = tables
    if body[:2] == b"\xff\xd8":
        body = body[2:]
    if body[-2:] == b"\xff\xd9":
        body = body[:-2]
    return strip[:2] + body + strip[2:]


def _decode_ifd(data: bytes, bo: str, ifd: dict[int, tuple]) -> tuple[int, int, int, np.ndarray]:
    def val(tag: int, default=None):
        if tag not in ifd:
            if default is None:
                raise ValueError(f"TIFF IFD missing required tag {tag}")
            return default
        return _tag_values(data, bo, ifd[tag])

    w = int(val(256)[0])
    h = int(val(257)[0])
    if w <= 0 or h <= 0 or w * h > 256_000_000:
        raise ValueError(f"unsupported TIFF dimensions {w}x{h}")
    spp = int(val(277, [1])[0])
    bits_l = val(258, [1])
    bits = int(bits_l[0])
    if any(int(b) != bits for b in bits_l):
        raise ValueError("mixed per-sample bit depths unsupported")
    comp = int(val(259, [1])[0])
    photo = int(val(262)[0])
    planar = int(val(284, [1])[0])
    predictor = int(val(317, [1])[0])
    if planar != 1:
        raise ValueError(f"unsupported planar configuration {planar}")
    if comp != 7 and bits not in (1, 8, 16):
        raise ValueError(f"unsupported bit depth {bits}")
    # comp 7 strips are self-describing JPEG streams: the embedded
    # SOF/YCbCr transform supersedes the TIFF photometric tag (6=YCbCr)
    if comp != 7 and photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported photometric {photo}")
    if photo == 3 and spp != 1:
        raise ValueError("palette image with >1 sample/pixel")

    tiled = 322 in ifd and 324 in ifd
    if tiled:
        tw = int(val(322)[0])
        th = int(val(323)[0])
        offs = [int(v) for v in val(324)]
        cnts = [int(v) for v in val(325)]
        tiles_across = (w + tw - 1) // tw
        tiles_down = (h + th - 1) // th
        if len(offs) < tiles_across * tiles_down:
            raise ValueError("missing TIFF tiles")
    else:
        offs = [int(v) for v in val(273)]
        cnts = [int(v) for v in val(279)]
        rps = int(val(278, [h])[0]) or h
        if len(offs) != len(cnts) or len(offs) < (h + rps - 1) // rps:
            raise ValueError("missing TIFF strips")

    def decompress(seg: bytes, expect: int) -> bytes:
        if comp == 1:
            if len(seg) < expect:
                raise ValueError("truncated uncompressed strip")
            return seg[:expect]
        if comp == 5:
            raw = _lzw_decode_tiff(seg, expect)
        elif comp == 32773:
            raw = _unpackbits_tiff(seg, expect)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
        return raw

    def undo_predictor(rows: np.ndarray) -> np.ndarray:
        # horizontal differencing per row, one running sum PER SAMPLE
        # channel (TIFF §14: differences are between same-channel
        # neighbors, so cumsum over the pixel axis of (rows, w, spp))
        if predictor == 1:
            return rows
        if predictor == 2 and bits == 8:
            r3 = rows.reshape(rows.shape[0], -1, spp)
            return (
                np.cumsum(r3.astype(np.int64), axis=1)
                .astype(np.uint8)
                .reshape(rows.shape)
            )
        raise ValueError(f"unsupported predictor {predictor} at {bits}-bit")

    if comp == 7:
        # each strip/tile is its own JPEG stream (TIFF/EP, DNG previews)
        from photo_dedup_spark.functions.jpeg import decode_jpeg

        tables = None
        if 347 in ifd:
            tv = _tag_values(data, bo, ifd[347])
            tables = tv[0] if tv and isinstance(tv[0], bytes) else None
        pieces = []
        for off, cnt in zip(offs, cnts):
            seg = data[off : off + cnt]
            jw, jh, jc, px = decode_jpeg(_splice_jpeg_tables(seg, tables))
            pieces.append((jw, jh, jc, px))
        if tiled:
            c = pieces[0][2]
            canvas = np.zeros((tiles_down * th, tiles_across * tw, c), dtype=np.uint8)
            for idx, (jw, jh, jc, px) in enumerate(pieces):
                ty, tx = divmod(idx, tiles_across)
                if px.ndim == 2:
                    px = px[:, :, None]
                canvas[ty * th : ty * th + jh, tx * tw : tx * tw + jw, :] = px[:th, :tw]
            out = canvas[:h, :w]
        else:
            rows = []
            for jw, jh, jc, px in pieces:
                if px.ndim == 2:
                    px = px[:, :, None]
                rows.append(px[:, :w])
            out = np.concatenate(rows, axis=0)[:h]
        return w, h, out.shape[2], out

    # raster assembly for 1/5/32773
    if tiled:
        row_bytes_t = (tw * spp * bits + 7) // 8
        canvas = np.zeros((tiles_down * th, tiles_across * tw, spp), dtype=np.uint8)
        for idx in range(tiles_across * tiles_down):
            seg = data[offs[idx] : offs[idx] + cnts[idx]]
            raw = decompress(seg, row_bytes_t * th)
            tile = _rows_to_samples(raw, th, tw, spp, bits, bo)
            tile = undo_predictor(tile.reshape(th, tw * spp)).reshape(th, tw, spp)
            ty, tx = divmod(idx, tiles_across)
            canvas[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw, :] = tile
        samples = canvas[:h, :w, :]
    else:
        rps = int(val(278, [h])[0]) or h
        row_bytes = (w * spp * bits + 7) // 8
        chunks = []
        rows_done = 0
        for off, cnt in zip(offs, cnts):
            if rows_done >= h:
                break
            nrows = min(rps, h - rows_done)
            seg = data[off : off + cnt]
            raw = decompress(seg, row_bytes * nrows)
            strip = _rows_to_samples(raw, nrows, w, spp, bits, bo)
            strip = undo_predictor(strip.reshape(nrows, w * spp)).reshape(nrows, w, spp)
            chunks.append(strip)
            rows_done += nrows
        if rows_done < h:
            raise ValueError("TIFF strips cover fewer rows than ImageLength")
        samples = np.concatenate(chunks, axis=0)

    if photo == 0:  # WhiteIsZero
        samples = 255 - samples
    if photo == 3:
        cmap = val(320)
        n = 1 << bits
        if len(cmap) < 3 * n:
            raise ValueError("short TIFF ColorMap")
        lut = (np.asarray(cmap[: 3 * n], dtype=np.uint32).reshape(3, n) >> 8).astype(
            np.uint8
        )
        idx = samples[:, :, 0]
        samples = np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=2)
    channels = samples.shape[2]
    if photo == 2 and channels > 3:
        samples = samples[:, :, :3]  # drop extra samples (alpha)
        channels = 3
    return w, h, channels, np.ascontiguousarray(samples)


def _rows_to_samples(
    raw: bytes, nrows: int, width: int, spp: int, bits: int, bo: str = "<"
) -> np.ndarray:
    """Packed row bytes → (nrows, width, spp) uint8 (16-bit samples
    collapse to their high byte, which follows the file byte order)."""
    row_bytes = (width * spp * bits + 7) // 8
    arr = np.frombuffer(raw, dtype=np.uint8, count=row_bytes * nrows).reshape(
        nrows, row_bytes
    )
    if bits == 8:
        return arr[:, : width * spp].reshape(nrows, width, spp)
    if bits == 16:
        pairs = arr[:, : width * spp * 2].reshape(nrows, width * spp, 2)
        hi = pairs[:, :, 0] if bo == ">" else pairs[:, :, 1]
        return np.ascontiguousarray(hi).reshape(nrows, width, spp)
    # bits == 1: MSB-first bilevel
    unpacked = np.unpackbits(arr, axis=1)[:, : width * spp]
    return (unpacked * 255).astype(np.uint8).reshape(nrows, width, spp)


def decode_tiff(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """TIFF/DNG → (w, h, channels, HxWxC uint8 pixels) from the best
    decodable IFD (full-resolution preferred, else largest)."""
    bo, ifds = _collect_ifds(data)

    def keyof(ifd: dict[int, tuple]) -> tuple:
        try:
            full = int(_tag_values(data, bo, ifd[_NEW_SUBFILE_TYPE])[0]) == 0
        except (KeyError, ValueError, struct.error):
            full = True  # absent NewSubFileType means primary image
        try:
            area = int(_tag_values(data, bo, ifd[256])[0]) * int(
                _tag_values(data, bo, ifd[257])[0]
            )
        except (KeyError, ValueError, struct.error):
            area = 0
        return (full, area)

    last_err: Exception | None = None
    for ifd in sorted(ifds, key=keyof, reverse=True):
        try:
            return _decode_ifd(data, bo, ifd)
        except (ValueError, struct.error, IndexError, OverflowError) as e:
            last_err = e
    raise ValueError(f"no decodable TIFF IFD ({last_err})")
