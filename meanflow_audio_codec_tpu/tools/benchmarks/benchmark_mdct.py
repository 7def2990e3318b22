"""MDCT kernel benchmark (reference: tools/benchmarks/benchmark_mdct.py:28-90):
direct (MXU matmul) vs FFT path vs NumPy baseline across signal/window
configurations."""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from meanflow_audio_codec_tpu.ops.mdct import mdct_direct, mdct_fft

CONFIGS = [  # (signal_length, window_size)
    (2048, 512), (16384, 512), (65536, 1024), (65536, 4096),
]


def _numpy_baseline(x: np.ndarray, window: int, hop: int) -> np.ndarray:
    w = np.sin(np.pi * (np.arange(2 * window) + 0.5) / (2 * window))
    n = np.arange(2 * window)[:, None]
    k = np.arange(window)[None, :]
    basis = np.cos(np.pi / window * (n + window / 2 + 0.5) * (k + 0.5))
    nf = (x.shape[-1] - window) // hop + 1
    need = (nf - 1) * hop + 2 * window
    x = np.pad(x, ((0, 0), (0, max(0, need - x.shape[-1]))))
    return np.stack([(x[:, i * hop:i * hop + 2 * window] * w) @ basis
                     for i in range(nf)], 1)


def _time(fn, *args, iters: int = 10) -> float:
    out = fn(*args)
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    if hasattr(out, "block_until_ready"):
        out.block_until_ready()
    return (time.perf_counter() - t0) / iters


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--skip-fft", action="store_true",
                        help="skip the FFT path (complex64 unsupported on "
                             "some TPU backends)")
    args = parser.parse_args(argv)
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")
    for length, window in CONFIGS:
        hop = window // 2
        x_np = rng.standard_normal((args.batch, length)).astype(np.float32)
        x = jnp.asarray(x_np)
        t_np = _time(lambda: _numpy_baseline(x_np, window, hop), iters=2)
        direct = jax.jit(lambda a: mdct_direct(a, window, hop))
        t_direct = _time(direct, x)
        row = (f"T={length:6d} W={window:5d}: numpy {t_np*1e3:8.2f} ms | "
               f"direct {t_direct*1e3:8.3f} ms ({t_np/t_direct:7.1f}x)")
        if not args.skip_fft and jax.default_backend() == "cpu":
            fft = jax.jit(lambda a: mdct_fft(a, window, hop))
            t_fft = _time(fft, x)
            row += f" | fft {t_fft*1e3:8.3f} ms"
        print(row)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
