"""Pure-Python GIF (87a/89a) decoder — first frame to RGB pixels.

The reference opens GIFs via PIL (`IMAGE_EXTENSIONS` includes ``.gif``
— /root/reference/photo_dedup/hasher.py:23, opened at hasher.py:95-154)
and hashes frame 0; this module decodes the first image block natively
with stdlib-only LZW so the multimodal tier covers the format without
external codecs:

  * logical screen descriptor + global/local color tables;
  * variable-width LZW (3..12-bit codes, clear/EOI, dictionary growth
    per GIF89a appendix F), data read across sub-blocks;
  * interlaced images (the 4-pass row schedule);
  * extensions (GCE/comment/application) are skipped; animation and
    transparency are intentionally out of scope — frame 0's palette
    colors are used as-is, matching PIL's default first-frame open.

Malformed input raises ValueError (the per-row ``decode_error``
count-and-drop contract in multimodal.decode_image_features).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: returns exactly *n_pixels* palette indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    # bit reader: LSB-first within bytes (GIF packs codes little-endian)
    bitbuf = 0
    bitcnt = 0
    pos = 0
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def reset_dict():
        # entries 0..clear-1 are single indices; clear/eoi reserved
        return {i: bytes([i]) for i in range(clear)}

    table = reset_dict()
    code_size = min_code_size + 1
    next_code = eoi + 1
    prev: bytes | None = None

    while True:
        while bitcnt < code_size:
            if pos >= len(data):
                # spec requires EOI, but truncated streams exist in the
                # wild; stop if the frame is already complete
                if n_out == n_pixels:
                    return out
                raise ValueError("truncated GIF LZW stream")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        bitcnt -= code_size

        if code == clear:
            table = reset_dict()
            code_size = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            if n_out != n_pixels:
                raise ValueError(
                    f"GIF LZW ended early ({n_out}/{n_pixels} pixels)"
                )
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("bad first LZW code")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("bad LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        if n_out == n_pixels:
            return out  # ignore trailing codes before EOI
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _deinterlace(idx: np.ndarray, h: int) -> np.ndarray:
    rows = np.empty(h, dtype=np.int64)
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    rows[np.asarray(order, dtype=np.int64)] = np.arange(h)
    return idx[rows]


def decode_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """GIF bytes -> (w, h, 3, HxWx3 uint8 RGB pixels of frame 0)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("unsupported codec (not GIF)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=i).reshape(
            n, 3
        )
        i += 3 * n
    while i < len(data):
        block = data[i]
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            i += 2
            while i < len(data) and data[i] != 0:
                i += 1 + data[i]
            i += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, i + 1)
        i += 10
        ct = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=i
            ).reshape(n, 3)
            i += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        if w == 0 or h == 0:
            raise ValueError("empty GIF image")
        min_code = data[i]
        i += 1
        chunks = []
        while i < len(data) and data[i] != 0:
            ln = data[i]
            chunks.append(data[i + 1 : i + 1 + ln])
            i += 1 + ln
        idx = _lzw_decode(min_code, b"".join(chunks), w * h).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx, h)
        if int(idx.max()) >= ct.shape[0]:
            raise ValueError("GIF palette index out of range")
        px = ct[idx]  # (h, w, 3)
        return int(w), int(h), 3, px
    raise ValueError("GIF contains no image data")
