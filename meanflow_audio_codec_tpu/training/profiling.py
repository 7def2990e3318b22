"""Training profiler: step timing, memory, MFU accounting, XLA traces.

Re-design of the reference profiler (meanflow_audio_codec/trainers/
profiling.py:17-118) with two TPU-native additions the reference lacked:

  * **MFU accounting** — the trainer passes the per-step model FLOPs
    (estimated from the jit-lowered cost analysis) and the profiler reports
    achieved / peak utilisation;
  * **XLA trace capture** — ``capture_trace(workdir)`` wraps a window of
    steps in ``jax.profiler`` for xprof, instead of wall-clock only.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any

import jax

#: bf16 peak TFLOP/s per chip by platform (v5e ~197 bf16; CPU unknown).
PEAK_TFLOPS = {"tpu": 197e12, "cpu": None, "gpu": None}


def force_completion(out) -> float:
    """Synchronise by *fetching* a scalar from the output tree.

    ``block_until_ready`` can return before device execution completes on
    remote-dispatch backends (observed on the axon tunnel: a pure matmul
    "measured" 160x over chip peak with block_until_ready, 87% of peak with
    a forced read). Every timing path must end with a host read.
    """
    import numpy as np
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    leaf = leaves[-1]
    flat = leaf.reshape(-1)[:1] if getattr(leaf, "ndim", 0) else leaf
    return float(np.asarray(jax.device_get(flat)).reshape(-1)[0])


def device_time(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Seconds per call with completion forced by a host read."""
    for _ in range(warmup):
        out = fn(*args)
    force_completion(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    force_completion(out)
    return (time.perf_counter() - t0) / iters


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them
    (reference evaluators/performance.py:108-156)."""
    stats: dict[str, Any] = {}
    for device in jax.local_devices():
        try:
            mem = device.memory_stats()
        except Exception:
            mem = None
        if mem:
            stats[str(device)] = {
                "bytes_in_use": mem.get("bytes_in_use"),
                "peak_bytes_in_use": mem.get("peak_bytes_in_use"),
                "bytes_limit": mem.get("bytes_limit"),
            }
    try:
        import psutil
        stats["host_rss_bytes"] = psutil.Process().memory_info().rss
    except Exception:
        pass
    return stats


def estimate_step_flops(jitted_fn, *args) -> float | None:
    """FLOPs of one compiled step from XLA's cost analysis (0 if opaque)."""
    try:
        lowered = jitted_fn.lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", 0.0)) or None
    except Exception:
        return None


class ProfilingTrainer:
    """Wall-clock + memory + MFU instrumentation around the train loop
    (hook points mirror reference profiling.py:31-118)."""

    def __init__(self, log_writer=None, window: int = 100,
                 flops_per_step: float | None = None):
        self.log = log_writer
        self.window = window
        self.flops_per_step = flops_per_step
        self.step_times: list[float] = []
        self._t_step = 0.0
        self._t_start = 0.0
        self.param_count: int | None = None

    # ---- lifecycle ----------------------------------------------------------
    def start_training(self, param_count: int | None = None) -> None:
        self.param_count = param_count
        self._t_start = time.perf_counter()
        if self.log is not None:
            self.log.write_step(0, event="start", param_count=param_count,
                                memory=device_memory_stats())

    def before_step(self) -> None:
        self._t_step = time.perf_counter()

    def after_step(self, step: int) -> dict:
        elapsed = time.perf_counter() - self._t_step
        self.step_times.append(elapsed)
        if len(self.step_times) > self.window:
            self.step_times.pop(0)
        avg = sum(self.step_times) / len(self.step_times)
        record = {"step_time": elapsed, "avg_step_time": avg}
        if self.flops_per_step:
            peak = PEAK_TFLOPS.get(jax.default_backend())
            record["achieved_tflops"] = self.flops_per_step / avg / 1e12
            if peak:
                record["mfu"] = self.flops_per_step / avg / peak
        if step % self.window == 0:
            record["memory"] = device_memory_stats()
        return record

    def end_training(self, total_steps: int) -> dict:
        total = time.perf_counter() - self._t_start
        summary = {
            "total_time_sec": total,
            "total_time_hours": total / 3600.0,
            "steps_per_sec": total_steps / total if total > 0 else None,
            "param_count": self.param_count,
        }
        if self.flops_per_step and self.step_times:
            avg = sum(self.step_times) / len(self.step_times)
            peak = PEAK_TFLOPS.get(jax.default_backend())
            summary["achieved_tflops"] = self.flops_per_step / avg / 1e12
            if peak:
                summary["mfu"] = self.flops_per_step / avg / peak
        return summary

    @property
    def total_time(self) -> float:
        return time.perf_counter() - self._t_start


class TraceCapture:
    """Context manager around ``jax.profiler`` for xprof traces."""

    def __init__(self, logdir: Path | str):
        self.logdir = str(logdir)

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
