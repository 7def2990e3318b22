"""Shared on-demand builder/loader for the native C++ cores.

One implementation of the content-addressed g++ build pipeline used by
both native touchpoints (data/native.py's loader core and
ops/entropy.py's rANS coder):

* the library name embeds a SHA of the source, so a stale or foreign
  binary is never dlopened — any source change forces a local rebuild;
* the compile goes to a temp file and is renamed into place atomically,
  so a concurrent process can never dlopen a half-written .so;
* portable ISA flags only (no -march=native): a cached build from
  another host of the same arch family still runs;
* failures degrade cleanly — ``load()`` returns None and ``error`` says
  why, so callers can expose an honest ``available() -> False``.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path


class NativeLibrary:
    """Lazy, thread-safe build+load of one C++ source file."""

    def __init__(self, source: Path, prefix: str,
                 extra_flags: tuple[str, ...] = ()):
        self.source = Path(source)
        self.prefix = prefix
        self.extra_flags = tuple(extra_flags)
        self._lock = threading.Lock()
        self._lib: ctypes.CDLL | None = None
        self._error: str | None = None

    @property
    def error(self) -> str | None:
        return self._error

    def library_path(self) -> Path:
        digest = hashlib.sha256(self.source.read_bytes()).hexdigest()[:16]
        return self.source.parent / f"{self.prefix}-{digest}.so"

    def _build(self, library: Path) -> bool:
        tmp = library.with_suffix(f".tmp{os.getpid()}.so")
        cmd = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared",
               *self.extra_flags, "-o", str(tmp), str(self.source)]
        try:
            result = subprocess.run(cmd, capture_output=True, text=True,
                                    timeout=120)
        except (OSError, subprocess.TimeoutExpired) as exc:
            self._error = f"g++ invocation failed: {exc}"
            return False
        if result.returncode != 0:
            self._error = f"g++ failed: {result.stderr[-500:]}"
            return False
        try:
            os.replace(tmp, library)  # atomic: no half-written dlopen
        except OSError as exc:
            self._error = f"install failed: {exc}"
            return False
        return True

    def load(self) -> ctypes.CDLL | None:
        if self._lib is not None:
            return self._lib
        with self._lock:
            if self._lib is not None:
                return self._lib
            if not self.source.exists():
                self._error = f"source missing: {self.source}"
                return None
            library = self.library_path()
            if not library.exists() and not self._build(library):
                return None
            try:
                self._lib = ctypes.CDLL(str(library))
            except OSError as exc:
                self._error = f"dlopen failed: {exc}"
                return None
            return self._lib
