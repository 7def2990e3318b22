"""ctypes binding for the native C++ data-loader core (native/dataloader.cpp).

Builds ``libmacloader.so`` on demand with g++ (no pybind11 in this image)
and exposes :class:`NativeAudioLoader`, a drop-in batch iterator matching
the Python pipeline's output contract ([B, frame_size, C] float32). Falls
back cleanly (``available() -> False``) when no toolchain is present.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

from meanflow_audio_codec_tpu.native_build import NativeLibrary

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
#: Source-content-addressed name (libmacloader-<sha>.so, gitignored):
#: a stale or foreign binary is never dlopened — any source change (or
#: fresh clone) forces a local rebuild (native_build.NativeLibrary).
_LIBRARY = NativeLibrary(_NATIVE_DIR / "dataloader.cpp", "libmacloader",
                         extra_flags=("-pthread",))


_configured = False


def _load() -> ctypes.CDLL | None:
    global _configured
    lib = _LIBRARY.load()
    if lib is not None and not _configured:
        lib.mac_loader_create.restype = ctypes.c_void_p
        lib.mac_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int]
        lib.mac_loader_next.restype = ctypes.c_int
        lib.mac_loader_next.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float)]
        lib.mac_loader_frames_produced.restype = ctypes.c_uint64
        lib.mac_loader_frames_produced.argtypes = [ctypes.c_void_p]
        lib.mac_loader_files_skipped.restype = ctypes.c_uint64
        lib.mac_loader_files_skipped.argtypes = [ctypes.c_void_p]
        lib.mac_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.mac_decode_wav.restype = ctypes.c_long
        lib.mac_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mac_decode_audio.restype = ctypes.c_long
        lib.mac_decode_audio.argtypes = lib.mac_decode_wav.argtypes
        _configured = True
    return lib


def available() -> bool:
    """True when the native library is (or can be) built and loaded."""
    return _load() is not None


def load_error() -> str | None:
    return _LIBRARY.error


def _wav_sample_bound(path: Path) -> int | None:
    """Exact interleaved-sample count from the container header, or None.

    Scans WAV/AIFF chunks for bits-per-sample and the payload byte size
    (a byte-count bound over-allocates 8x for 16-bit PCM), or reads the
    FLAC STREAMINFO total-samples field — compressed payload bytes say
    nothing about decoded size, so the header count is the only honest
    bound there."""
    try:
        with open(path, "rb") as f:
            magic = f.read(12)[:4]
            if magic == b"RIFF":
                order, fmt_id, data_id, bits_off = "little", b"fmt ", b"data", 14
            elif magic == b"FORM":
                order, fmt_id, data_id, bits_off = "big", b"COMM", b"SSND", 6
            elif magic == b"fLaC":
                # STREAMINFO is mandatory and first: 4-byte block header,
                # then 34 bytes; channels-1 sits at bit offset 100,
                # total samples (36 bits) at offset 108.
                f.seek(4)
                block = f.read(4 + 34)
                if len(block) < 38 or block[0] & 0x7F != 0:
                    return None
                si = block[4:]
                channels = ((si[12] >> 1) & 0x7) + 1
                total = ((si[13] & 0xF) << 32) | int.from_bytes(
                    si[14:18], "big")
                return max(total * channels, 64) if total else None
            else:
                return None
            bytes_per = None
            for _ in range(64):  # bounded chunk scan
                head = f.read(8)
                if len(head) < 8:
                    return None
                size = int.from_bytes(head[4:8], order)
                if head[:4] == fmt_id and size >= bits_off + 2:
                    fmt = f.read(min(size, 4096))
                    bits = int.from_bytes(fmt[bits_off:bits_off + 2], order)
                    if bits not in (8, 16, 24, 32):
                        return None
                    bytes_per = bits // 8
                    f.seek(max(size - 4096, 0) + (size & 1), 1)
                elif head[:4] == data_id and bytes_per:
                    return max(size // bytes_per, 64)
                else:
                    f.seek(size + (size & 1), 1)
    except OSError:
        return None
    return None


def decode_wav_native(path: Path | str,
                      max_samples: int | None = None
                      ) -> tuple[np.ndarray, int] | None:
    """Decode one WAV or AIFF/AIFC via the native parser
    -> ((C, T) float32, rate).

    ``max_samples`` defaults to the exact sample count read from the
    container header (falling back to the file byte size capped at 256 Mi
    samples), so the float32 scratch buffer is sized to the real payload —
    never a multi-GB allocation for a large file.
    """
    lib = _load()
    if lib is None:
        return None
    if max_samples is None:
        max_samples = _wav_sample_bound(Path(path))
        if max_samples is None:
            try:
                max_samples = min(max(Path(path).stat().st_size, 64), 1 << 28)
            except OSError:
                return None
    buf = np.empty(max_samples, dtype=np.float32)
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    n = lib.mac_decode_audio(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_samples, ctypes.byref(channels), ctypes.byref(rate))
    if n < 0:
        return None
    interleaved = buf[:n].reshape(-1, channels.value)
    return np.ascontiguousarray(interleaved.T), rate.value


#: container-sniffing decode (WAV or AIFF/AIFC) — same contract.
decode_audio_native = decode_wav_native


class NativeAudioLoader:
    """Multi-threaded native loader yielding [B, frame_size, C] batches."""

    def __init__(self, files: list[Path | str], frame_size: int,
                 channels: int = 2, batch_size: int = 32,
                 buffer_frames: int = 64, n_threads: int = 2,
                 target_rate: int = 44100, seed: int = 0,
                 loop: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                f"native loader unavailable: {_LIBRARY.error}")
        if not files:
            raise ValueError("no input files")
        self._lib = lib
        self.frame_size = frame_size
        self.channels = channels
        self.batch_size = batch_size
        encoded = [str(f).encode() for f in files]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self._handle = lib.mac_loader_create(
            arr, len(encoded), frame_size, channels, batch_size,
            buffer_frames, n_threads, target_rate, seed, int(loop))
        if not self._handle:
            raise RuntimeError("mac_loader_create failed")
        self._out = np.empty((batch_size, frame_size, channels),
                             dtype=np.float32)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        n = self._lib.mac_loader_next(
            self._handle,
            self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if n < self.batch_size:
            raise StopIteration
        return self._out.copy()

    @property
    def frames_produced(self) -> int:
        return int(self._lib.mac_loader_frames_produced(self._handle))

    @property
    def files_skipped(self) -> int:
        return int(self._lib.mac_loader_files_skipped(self._handle))

    def close(self) -> None:
        if self._handle:
            self._lib.mac_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
