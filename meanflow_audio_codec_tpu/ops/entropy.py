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
import hashlib
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SOURCE = _NATIVE_DIR / "entropy.cpp"
_BUILD_LOCK = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_error: str | None = None


def _library_path() -> Path:
    digest = hashlib.sha256(_SOURCE.read_bytes()).hexdigest()[:16]
    return _NATIVE_DIR / f"libmacentropy-{digest}.so"


def _build(library: Path) -> bool:
    global _load_error
    cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
           "-o", str(library), str(_SOURCE)]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True,
                                timeout=120)
    except (OSError, subprocess.TimeoutExpired) as exc:
        _load_error = f"g++ invocation failed: {exc}"
        return False
    if result.returncode != 0:
        _load_error = f"g++ failed: {result.stderr[-500:]}"
        return False
    return True


def _load() -> ctypes.CDLL | None:
    global _lib, _load_error
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        if not _SOURCE.exists():
            _load_error = f"source missing: {_SOURCE}"
            return None
        library = _library_path()
        if not library.exists() and not _build(library):
            return None
        try:
            lib = ctypes.CDLL(str(library))
        except OSError as exc:
            _load_error = f"dlopen failed: {exc}"
            return None
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
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native coder built (g++ present) and loaded."""
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _load_error


def entropy_encode(codes: np.ndarray) -> bytes:
    """int8 array (any shape) -> compressed bytes (table + rANS payload)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native entropy coder unavailable: {_load_error}")
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
        raise RuntimeError(f"native entropy coder unavailable: {_load_error}")
    buf = np.frombuffer(data, dtype=np.uint8)
    codes = np.empty(int(n), dtype=np.int8)
    consumed = lib.mac_entropy_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), codes.size)
    if consumed < 0:
        raise ValueError("malformed entropy stream")
    return codes
