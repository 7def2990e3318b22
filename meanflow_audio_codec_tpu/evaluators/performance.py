"""Performance instrumentation (reference: meanflow_audio_codec/evaluators/
performance.py:22-230): device-synced inference timing, memory snapshots,
parameter counting with per-module breakdown, timing context managers."""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import numpy as np

from meanflow_audio_codec_tpu.training.profiling import (
    device_memory_stats,
    force_completion,
)

#: re-exported for reference-API parity
memory_usage = device_memory_stats


def inference_time(fn: Callable, *args, warmup: int = 5, runs: int = 50,
                   **kwargs) -> dict:
    """Wall-clock statistics of a device function with warmup and forced
    host-read synchronisation (reference performance.py:52-105;
    block_until_ready alone under-measures on remote-dispatch backends)."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    force_completion(out)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        force_completion(out)
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return {
        "mean_sec": float(arr.mean()),
        "std_sec": float(arr.std()),
        "min_sec": float(arr.min()),
        "max_sec": float(arr.max()),
        "p50_sec": float(np.percentile(arr, 50)),
        "p99_sec": float(np.percentile(arr, 99)),
        "runs": runs,
    }


def count_parameters(params: Any) -> dict:
    """Total + top-level per-module parameter counts
    (reference performance.py:159-198)."""
    total = sum(int(np.size(p)) for p in jax.tree_util.tree_leaves(params))
    breakdown = {}
    if isinstance(params, dict):
        for name, subtree in params.items():
            breakdown[name] = sum(
                int(np.size(p)) for p in jax.tree_util.tree_leaves(subtree))
    return {"total": total, "by_module": breakdown}


class TrainingTimer:
    """Context manager measuring a training span
    (reference performance.py:22-49)."""

    def __init__(self, name: str = "training"):
        self.name = name
        self.elapsed: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0


@contextlib.contextmanager
def memory_profiler(label: str = ""):
    """Yield a dict filled with before/after/delta device memory
    (reference performance.py:201-230)."""
    snapshot = {"label": label, "before": device_memory_stats()}
    yield snapshot
    snapshot["after"] = device_memory_stats()
    before = snapshot["before"]
    after = snapshot["after"]
    deltas = {}
    for device in after:
        if (device in before and isinstance(after[device], dict)
                and isinstance(before[device], dict)):
            a = after[device].get("bytes_in_use")
            b = before[device].get("bytes_in_use")
            if a is not None and b is not None:
                deltas[device] = a - b
    snapshot["delta_bytes"] = deltas
