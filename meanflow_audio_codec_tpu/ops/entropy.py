"""ctypes binding for the native rANS entropy coder (native/entropy.cpp).

Turns int8 latent codes into true compressed bytes: a static-model byte
rANS fitted to each stream's code histogram, so storage tracks the
empirical entropy (~5-6 bits/symbol for peak-normalized scalar codes
instead of the stored 8). Same on-demand g++ build discipline as
data/native.py: source-content-addressed library name, thread-safe build,
clean ``available() -> False`` fallback when no toolchain exists.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

from meanflow_audio_codec_tpu.native_build import NativeLibrary

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIBRARY = NativeLibrary(_NATIVE_DIR / "entropy.cpp", "libmacentropy")
_configured = False


def _load() -> ctypes.CDLL | None:
    global _configured
    lib = _LIBRARY.load()
    if lib is not None and not _configured:
        i8p = ctypes.POINTER(ctypes.c_int8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.mac_entropy_encode.restype = ctypes.c_longlong
        lib.mac_entropy_encode.argtypes = [i8p, ctypes.c_longlong,
                                           u8p, ctypes.c_longlong]
        lib.mac_entropy_decode.restype = ctypes.c_longlong
        lib.mac_entropy_decode.argtypes = [u8p, ctypes.c_longlong,
                                           i8p, ctypes.c_longlong]
        lib.mac_entropy_bound.restype = ctypes.c_longlong
        lib.mac_entropy_bound.argtypes = [ctypes.c_longlong]
        _configured = True
    return lib


def available() -> bool:
    """True when the native coder built (g++ present) and loaded."""
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _LIBRARY.error


def entropy_encode(codes: np.ndarray) -> bytes:
    """int8 array (any shape) -> compressed bytes (table + rANS payload)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native entropy coder unavailable: {_LIBRARY.error}")
    flat = np.ascontiguousarray(codes, dtype=np.int8).reshape(-1)
    n = flat.size
    out = np.empty(int(lib.mac_entropy_bound(n)), dtype=np.uint8)
    written = lib.mac_entropy_encode(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size)
    if written < 0:
        raise RuntimeError("entropy encode failed (buffer bound violated)")
    return out[:written].tobytes()


def entropy_decode(data: bytes, n: int) -> np.ndarray:
    """Compressed bytes -> flat int8 array of exactly ``n`` codes."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native entropy coder unavailable: {_LIBRARY.error}")
    buf = np.frombuffer(data, dtype=np.uint8)
    codes = np.empty(int(n), dtype=np.int8)
    consumed = lib.mac_entropy_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), codes.size)
    if consumed < 0:
        raise ValueError("malformed entropy stream")
    return codes
