"""Minimal FLAC *encoder*: test-vector generator + corpus writer.

Two jobs:

1. Validate the native decoder (``native/dataloader.cpp``): this image
   ships no FLAC tooling (no ``flac``, ``ffmpeg``, ``soundfile``,
   ``torchaudio``), so the decoder is tested against bitstreams produced
   here. The encoder is deliberately small but spec-exact: it emits real
   FLAC (magic, STREAMINFO, framed bitstream with CRC-8/CRC-16) covering
   every subframe type the decoder claims — CONSTANT, VERBATIM,
   FIXED(0-4), LPC with caller-chosen coefficients — plus Rice
   partitions, raw-bits escapes, wasted bits and all three stereo
   decorrelation modes. FLAC is lossless, so tests assert exact integer
   round-trips (tests/test_native_flac.py).

2. Write compressed on-disk corpora (:func:`write_flac_pcm16`, used by
   ``tools/make_corpus.py``) so the file-based training path can be
   exercised on FLAC corpora, the format real music archives ship in.

Pure Python, unoptimized by design — encoding is a corpus-preparation
step, never on the training or serving hot path.
"""

from __future__ import annotations

import numpy as np


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _BitWriter:
    """MSB-first bit accumulator."""

    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self._acc = (self._acc << bits) | value
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self._bytes.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        self.write(1, q + 1)  # q zeros then a terminating one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def getvalue(self) -> bytes:
        assert self._n == 0, "unaligned"
        return bytes(self._bytes)

    @property
    def byte_length(self) -> int:
        assert self._n == 0
        return len(self._bytes)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    for nbytes, capacity in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31),
                             (7, 36)):
        if n < (1 << capacity):
            lead_bits = capacity - 6 * (nbytes - 1)
            out = [((0xFF << (8 - nbytes)) & 0xFF)
                   | ((n >> (6 * (nbytes - 1))) & ((1 << lead_bits) - 1))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError(f"number too large for FLAC utf8 coding: {n}")


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _write_residual(bw: _BitWriter, residual: np.ndarray, pred_order: int,
                    blocksize: int, partition_order: int = 0,
                    escape: bool = False) -> None:
    """Rice-coded (method 0) residual section; ``escape`` forces the
    raw-bits escape code in every partition instead."""
    bw.write(0, 2)  # method 0: 4-bit Rice parameters
    bw.write(partition_order, 4)
    partitions = 1 << partition_order
    assert blocksize % partitions == 0
    psize = blocksize // partitions
    pos = 0
    for p in range(partitions):
        count = psize - (pred_order if p == 0 else 0)
        part = residual[pos:pos + count].astype(np.int64)
        pos += count
        if escape:
            raw_bits = 1
            if count:
                raw_bits = max(1, int(np.max(np.abs(part))).bit_length() + 1)
            bw.write(0xF, 4)
            bw.write(raw_bits, 5)
            for v in part:
                bw.write_signed(int(v), raw_bits)
            continue
        # Cheapest 4-bit Rice parameter by exact cost.
        mapped = [_zigzag(int(v)) for v in part]
        best_param, best_cost = 0, None
        for param in range(15):
            cost = sum((u >> param) + 1 + param for u in mapped)
            if best_cost is None or cost < best_cost:
                best_param, best_cost = param, cost
        bw.write(best_param, 4)
        for u in mapped:
            bw.write_unary(u >> best_param)
            bw.write(u & ((1 << best_param) - 1), best_param)


def _write_subframe(bw: _BitWriter, samples: np.ndarray, bps: int,
                    mode: str, partition_order: int = 0,
                    lpc: tuple[list[int], int, int] | None = None,
                    wasted: int = 0, escape: bool = False) -> None:
    s = samples.astype(np.int64)
    if wasted:
        assert not np.any(s & ((1 << wasted) - 1)), \
            "wasted-bits samples must be multiples of 2**wasted"
        s = s >> wasted
    ebps = bps - wasted
    blocksize = len(s)

    def header(type_bits: int) -> None:
        bw.write(0, 1)  # pad
        bw.write(type_bits, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if mode == "constant":
        assert np.all(s == s[0])
        header(0b000000)
        bw.write_signed(int(s[0]), ebps)
    elif mode == "verbatim":
        header(0b000001)
        for v in s:
            bw.write_signed(int(v), ebps)
    elif mode.startswith("fixed"):
        order = int(mode[-1])
        header(0b001000 | order)
        for i in range(order):
            bw.write_signed(int(s[i]), ebps)
        res = np.diff(s, n=order) if order else s.copy()
        _write_residual(bw, res, order, blocksize, partition_order, escape)
    elif mode == "lpc":
        coefs, shift, precision = lpc
        order = len(coefs)
        header(0b100000 | (order - 1))
        for i in range(order):
            bw.write_signed(int(s[i]), ebps)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write_signed(int(c), precision)
        res = np.empty(blocksize - order, dtype=np.int64)
        for i in range(order, blocksize):
            acc = sum(int(coefs[j]) * int(s[i - 1 - j]) for j in range(order))
            res[i - order] = int(s[i]) - (acc >> shift)
        _write_residual(bw, res, order, blocksize, partition_order, escape)
    else:
        raise ValueError(f"unknown subframe mode {mode!r}")


_SS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}
_STEREO_ASGN = {"left_side": 8, "right_side": 9, "mid_side": 10}


def write_flac(path, audio: np.ndarray, sample_rate: int = 44100,
               bits: int = 16, blocksize: int | None = None,
               mode: str = "verbatim", stereo: str = "independent",
               partition_order: int = 0,
               lpc: tuple[list[int], int, int] | None = None,
               wasted: int = 0, escape: bool = False,
               corrupt_crc16: bool = False) -> None:
    """Write integer samples ``audio[C, T]`` as a FLAC file.

    ``mode`` selects the subframe type for every channel: ``constant`` /
    ``verbatim`` / ``fixed0..fixed4`` / ``lpc`` (with ``lpc=(coefs, shift,
    precision)``). ``stereo`` selects channel decorrelation for C == 2.
    ``corrupt_crc16`` flips a bit in the first frame's CRC so tests can
    assert the decoder rejects damaged frames.
    """
    audio = np.atleast_2d(np.asarray(audio, dtype=np.int64))
    channels, total = audio.shape
    if blocksize is None:
        blocksize = total
    assert 1 <= channels <= 8
    lim = 1 << (bits - 1)
    assert np.all(audio >= -lim) and np.all(audio < lim)

    out = bytearray(b"fLaC")
    # STREAMINFO (type 0, last metadata block, 34 bytes).
    si = _BitWriter()
    last_bs = total % blocksize or blocksize
    si.write(min(blocksize, last_bs), 16)
    si.write(blocksize, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    si.write(0, 128)  # md5 unknown (frames carry CRC-16)
    out += bytes([0x80, 0, 0, 34]) + si.getvalue()

    asgn = _STEREO_ASGN.get(stereo, channels - 1) if channels == 2 \
        else channels - 1
    if channels != 2:
        assert stereo == "independent"

    frame_index = 0
    for start in range(0, total, blocksize):
        block = audio[:, start:start + blocksize]
        bs = block.shape[1]
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(0b0111, 4)  # blocksize: explicit 16-bit at header end
        bw.write(0b0000, 4)  # sample rate: from STREAMINFO
        bw.write(asgn, 4)
        bw.write(_SS_CODE[bits], 3)
        bw.write(0, 1)  # reserved
        for byte in _utf8_number(frame_index):
            bw.write(byte, 8)
        bw.write(bs - 1, 16)
        header = bw.getvalue()
        bw.write(_crc8(header), 8)

        if asgn == 8:  # left/side
            subs = [(block[0], bits), (block[0] - block[1], bits + 1)]
        elif asgn == 9:  # right/side
            subs = [(block[0] - block[1], bits + 1), (block[1], bits)]
        elif asgn == 10:  # mid/side
            side = block[0] - block[1]
            mid = (block[0] + block[1]) >> 1
            subs = [(mid, bits), (side, bits + 1)]
        else:
            subs = [(block[c], bits) for c in range(channels)]
        for sub, sub_bits in subs:
            _write_subframe(bw, sub, sub_bits, mode, partition_order, lpc,
                            wasted, escape)
        bw.align()
        frame = bw.getvalue()
        crc = _crc16(frame)
        if corrupt_crc16 and frame_index == 0:
            crc ^= 1
        out += frame + bytes([crc >> 8, crc & 0xFF])
        frame_index += 1

    with open(path, "wb") as f:
        f.write(out)


def write_flac_pcm16(path, audio: np.ndarray,
                     sample_rate: int = 44100) -> None:
    """Write (T,) or (T, C) float32 [-1, 1] audio as 16-bit FLAC.

    Mirrors :func:`data.audio.write_wav`'s contract. Uses the sensible
    compressing defaults: fixed-order-2 prediction, mid/side stereo
    decorrelation for C == 2, 4096-sample blocks.
    """
    from pathlib import Path

    audio = np.asarray(audio, dtype=np.float32)
    if audio.ndim == 1:
        audio = audio[:, None]
    pcm = (np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int64).T  # (C, T)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    stereo = "mid_side" if pcm.shape[0] == 2 else "independent"
    write_flac(path, pcm, sample_rate=sample_rate, bits=16,
               blocksize=min(4096, pcm.shape[1]), mode="fixed2",
               stereo=stereo)
