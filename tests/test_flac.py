"""FLAC decoder tests: round-trip against a self-contained minimal
encoder (the same pattern as test_jpeg/test_webp/test_gif — the
encoder here exists only to referee the decoder; it shares no code
with it) plus malformed-input contracts.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from photo_dedup_spark.functions.flac import crc8, crc16, decode_flac


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def put_signed(self, value: int, n: int) -> None:
        self.put(value & ((1 << n) - 1), n)

    def align(self) -> None:
        while self.nbits:
            self.put(0, 1)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _rice_encode(w: _BitWriter, residuals: np.ndarray, param: int) -> None:
    for r in residuals:
        u = (int(r) << 1) ^ (int(r) >> 63)  # zigzag (arith shift)
        q, low = u >> param, u & ((1 << param) - 1)
        w.put(0, q) if q else None
        w.put(1, 1)
        if param:
            w.put(low, param)


def encode_flac(
    channels: list[np.ndarray],
    rate: int = 8000,
    bps: int = 16,
    block: int = 256,
    fixed_order: int | None = 2,
) -> bytes:
    """Minimal FLAC encoder: independent channels, per-frame 16-bit
    block size, FIXED-predictor subframes with one rice partition
    (or VERBATIM when fixed_order is None)."""
    n_ch, total = len(channels), len(channels[0])
    si = bytearray()
    si += struct.pack(">HH", block, block)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (rate << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | total
    si += packed.to_bytes(8, "big")
    si += b"\x00" * 16  # md5 unset
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    for fi, start in enumerate(range(0, total, block)):
        n = min(block, total - start)
        w = _BitWriter()
        w.put(0x3FFE, 14)
        w.put(0, 1)  # reserved
        w.put(0, 1)  # fixed-blocksize strategy
        w.put(7, 4)  # 16-bit block size at end
        w.put(0, 4)  # sample rate from STREAMINFO
        w.put(n_ch - 1, 4)  # independent channels
        w.put(4, 3)  # 16-bit samples
        w.put(0, 1)  # reserved
        assert fi < 0x80
        w.put(fi, 8)  # UTF-8 coded frame number (single byte)
        w.put(n - 1, 16)
        w.align()
        hdr = w.bytes()
        body = _BitWriter()
        for ch in channels:
            blk = ch[start : start + n].astype(np.int64)
            body.put(0, 1)  # padding
            order = fixed_order
            if order is None or n <= order:
                body.put(1, 6)  # VERBATIM
                body.put(0, 1)  # no wasted bits
                for s in blk:
                    body.put_signed(int(s), bps)
                continue
            body.put(8 + order, 6)  # FIXED
            body.put(0, 1)
            for s in blk[:order]:
                body.put_signed(int(s), bps)
            res = blk.copy()
            for _ in range(order):
                res = np.diff(res)
            body.put(0, 2)  # rice method 0 (4-bit params)
            body.put(0, 4)  # partition order 0
            mean_abs = max(1.0, float(np.abs(res).mean()))
            param = min(14, max(0, int(mean_abs).bit_length()))
            body.put(param, 4)
            _rice_encode(body, res, param)
        body.align()
        frame = hdr + bytes([crc8(hdr)]) + body.bytes()
        out += frame + crc16(frame).to_bytes(2, "big")
    return bytes(out)


def _sine(n: int, freq: float, amp: int = 12000, phase: float = 0.0) -> np.ndarray:
    t = np.arange(n)
    return np.round(amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.int64)


class TestFlacRoundtrip:
    def test_verbatim_mono(self):
        sig = _sine(700, 0.013)
        rate, n, ch, mono = decode_flac(encode_flac([sig], fixed_order=None))
        assert (rate, n, ch) == (8000, 700, 1)
        assert np.array_equal(np.round(mono * 32768).astype(np.int64), sig)

    def test_fixed_order2_stereo_partial_last_block(self):
        left = _sine(1000, 0.007)
        right = _sine(1000, 0.011, phase=1.0)
        rate, n, ch, mono = decode_flac(encode_flac([left, right], block=256))
        assert (rate, n, ch) == (8000, 1000, 2)
        want = (left + right) / 2.0 / 32768.0
        assert np.allclose(mono, want, atol=0, rtol=0)

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_all_fixed_orders(self, order):
        sig = _sine(400, 0.019, amp=6000) + _sine(400, 0.003, amp=5000)
        rate, n, ch, mono = decode_flac(encode_flac([sig], fixed_order=order))
        assert np.array_equal(np.round(mono * 32768).astype(np.int64), sig)

    def test_noise_is_exact(self):
        rng = np.random.RandomState(3)
        sig = rng.randint(-(2**15), 2**15, size=513).astype(np.int64)
        rate, n, ch, mono = decode_flac(encode_flac([sig]))
        assert n == 513
        assert np.array_equal(np.round(mono * 32768).astype(np.int64), sig)


class TestFlacContracts:
    def test_not_flac(self):
        with pytest.raises(ValueError, match="not FLAC"):
            decode_flac(b"RIFFxxxxWAVE")

    def test_header_crc_detected(self):
        blob = bytearray(encode_flac([_sine(300, 0.01)]))
        # STREAMINFO is 4 + 4 + 34 bytes; frame starts right after.
        frame_at = 4 + 4 + 34
        # header: 4 fixed bytes + 1 utf8 + 2 blocksize, CRC at offset 7
        blob[frame_at + 7] ^= 0xFF
        with pytest.raises(ValueError, match="CRC-8"):
            decode_flac(bytes(blob))

    def test_frame_crc_detected(self):
        blob = bytearray(encode_flac([_sine(300, 0.01)], fixed_order=None))
        blob[-1] ^= 0xFF  # last frame's CRC-16 low byte
        with pytest.raises(ValueError, match="CRC-16"):
            decode_flac(bytes(blob))

    def test_truncated(self):
        blob = encode_flac([_sine(300, 0.01)])
        with pytest.raises(ValueError):
            decode_flac(blob[: len(blob) // 2])


class TestFlacThroughAudioFeatures:
    def test_flac_and_wav_payloads_mix(self, spark):
        """decode_audio_features dispatches WAV vs FLAC by magic, and a
        FLAC of the same samples yields the same energy profile as the
        WAV (lossless ⇒ feature-identical)."""
        import struct as _s

        from photo_dedup_spark.functions.multimodal import decode_audio_features

        sig = _sine(800, 0.009)
        pcm = sig.astype("<i2").tobytes()
        wav = (
            b"RIFF" + _s.pack("<I", 36 + len(pcm)) + b"WAVE"
            b"fmt " + _s.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + _s.pack("<I", len(pcm)) + pcm
        )
        flac = encode_flac([sig])
        media = spark.createDataFrame(
            [(1, bytearray(wav)), (2, bytearray(flac)), (3, bytearray(b"OggS????"))],
            "media_id long, payload binary",
        )
        rows = {r.media_id: r for r in decode_audio_features(media).collect()}
        assert rows[1].decode_error is None and rows[2].decode_error is None
        assert rows[1].sample_rate == rows[2].sample_rate == 8000
        assert rows[1].n_samples == rows[2].n_samples == 800
        assert rows[1].features == rows[2].features
        assert rows[3].decode_error is not None