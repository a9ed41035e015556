"""Minimal FLAC encoder — test fixture only.

Produces spec-conformant FLAC streams exercising the decoder's subframe
types (constant / verbatim / fixed 0-2 / LPC), partitioned Rice residuals
(incl. the escape code), and stereo decorrelation modes.  Not a product
component; exists because the image ships no FLAC encoder to generate
golden files with.
"""

from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value: int, bits: int):
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def write_rice(self, v: int, param: int):
        u = 2 * v if v >= 0 else -2 * v - 1
        self.write_unary(u >> param)
        self.write(u & ((1 << param) - 1), param)

    def align(self):
        while self.nbits != 0:
            self.write(0, 1)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def _utf8_number(bw: BitWriter, n: int):
    if n < 0x80:
        bw.write(n, 8)
    elif n < 0x800:
        bw.write(0xC0 | (n >> 6), 8)
        bw.write(0x80 | (n & 0x3F), 8)
    else:
        bw.write(0xE0 | (n >> 12), 8)
        bw.write(0x80 | ((n >> 6) & 0x3F), 8)
        bw.write(0x80 | (n & 0x3F), 8)


def _write_residual(bw: BitWriter, resid, order: int, partition_order: int = 0,
                    param: int = None, escape: bool = False):
    bw.write(0, 2)  # rice method 0 (4-bit params)
    bw.write(partition_order, 4)
    nparts = 1 << partition_order
    block = len(resid) + order
    per_part = block >> partition_order
    idx = 0
    for p in range(nparts):
        count = per_part - (order if p == 0 else 0)
        chunk = resid[idx : idx + count]
        idx += count
        if escape:
            bw.write(0xF, 4)
            nbits = 18
            bw.write(nbits, 5)
            for v in chunk:
                bw.write_signed(int(v), nbits)
        else:
            pp = param
            if pp is None:
                mean = max(1.0, float(np.mean(np.abs(chunk))) if len(chunk) else 1.0)
                pp = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
            bw.write(pp, 4)
            for v in chunk:
                bw.write_rice(int(v), pp)


FIXED_COEFS = {0: [], 1: [1], 2: [2, -1]}


def _write_subframe(bw: BitWriter, samples, bps: int, mode: str,
                    partition_order: int = 0, escape: bool = False):
    bw.write(0, 1)  # padding
    s = np.asarray(samples, dtype=np.int64)
    if mode == "constant":
        assert np.all(s == s[0])
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(s[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in s:
            bw.write_signed(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bps)
        resid = s.copy()
        coefs = FIXED_COEFS[order]
        pred = np.zeros_like(s)
        for j, c in enumerate(coefs):
            pred[order:] += c * s[order - 1 - j : len(s) - 1 - j]
        resid = (s - pred)[order:]
        _write_residual(bw, resid, order, partition_order, escape=escape)
    elif mode == "lpc":
        order = 2
        precision = 12
        shift = 10
        coefs = [int(round(1.6 * (1 << shift))), int(round(-0.7 * (1 << shift)))]
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for v in s[:order]:
            bw.write_signed(int(v), bps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        resid = []
        for i in range(order, len(s)):
            p = sum(coefs[j] * int(s[i - 1 - j]) for j in range(order)) >> shift
            resid.append(int(s[i]) - p)
        _write_residual(bw, np.asarray(resid), order, partition_order)
    else:
        raise ValueError(mode)


def encode_flac(
    pcm: np.ndarray,  # (channels, time) int samples
    sample_rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    subframe_mode: str = "fixed1",
    stereo_mode: str = "independent",  # independent | left_side | mid_side
    partition_order: int = 0,
    escape: bool = False,
) -> bytes:
    channels, total = pcm.shape
    out = bytearray(b"fLaC")

    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    for _ in range(16):
        si.write(0, 8)
    body = si.getvalue()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, total, block_size):
        chunk = pcm[:, start : start + block_size]
        bs = chunk.shape[1]
        bw = BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(0b0111, 4)  # 16-bit block size follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if channels == 1 or stereo_mode == "independent":
            bw.write(channels - 1, 4)
        elif stereo_mode == "left_side":
            bw.write(8, 4)
        elif stereo_mode == "mid_side":
            bw.write(10, 4)
        else:
            raise ValueError(stereo_mode)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        bw.write(0, 1)
        _utf8_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.write(0, 8)  # CRC-8 (decoder doesn't verify)

        if channels == 1 or stereo_mode == "independent":
            for c in range(channels):
                _write_subframe(bw, chunk[c], bps, subframe_mode,
                                partition_order, escape)
        elif stereo_mode == "left_side":
            side = chunk[0].astype(np.int64) - chunk[1].astype(np.int64)
            _write_subframe(bw, chunk[0], bps, subframe_mode, partition_order)
            _write_subframe(bw, side, bps + 1, subframe_mode, partition_order)
        elif stereo_mode == "mid_side":
            l = chunk[0].astype(np.int64)
            r = chunk[1].astype(np.int64)
            mid = (l + r) >> 1
            side = l - r
            _write_subframe(bw, mid, bps, subframe_mode, partition_order)
            _write_subframe(bw, side, bps + 1, subframe_mode, partition_order)
        bw.align()
        bw.write(0, 16)  # CRC-16 (decoder doesn't verify)
        out += bw.getvalue()
        frame_no += 1
    return bytes(out)
