"""Tiny PyTorch oracle training loop
(reference: meanflow_audio_codec/references/train.py:10-181).

Trains the torch reference model with a chosen strategy on synthetic
low-rank data — a known-good baseline to compare JAX training dynamics
against when triaging method-vs-port bugs.
"""

from __future__ import annotations

import argparse

import numpy as np
import torch

from meanflow_audio_codec_tpu.references.model import TorchConditionalFlow
from meanflow_audio_codec_tpu.references.strategy import get_strategy


def make_data(n: int, dim: int, seed: int = 0) -> torch.Tensor:
    rng = np.random.default_rng(seed)
    basis = rng.standard_normal((4, dim))
    coeffs = rng.standard_normal((n, 4))
    return torch.tensor((coeffs @ basis).astype(np.float32))


def train(method: str = "improved_mean_flow", steps: int = 500,
          batch_size: int = 64, dim: int = 16, lr: float = 1e-3,
          seed: int = 0, log_every: int = 100) -> list[float]:
    torch.manual_seed(seed)
    model = TorchConditionalFlow(noise_dim=dim)
    strategy = get_strategy(method)
    optimizer = torch.optim.AdamW(model.parameters(), lr=lr)
    data = make_data(4096, dim, seed)
    losses = []
    generator = torch.Generator().manual_seed(seed)
    for step in range(steps):
        idx = torch.randint(0, len(data), (batch_size,), generator=generator)
        x0 = data[idx]
        e = torch.randn(x0.shape, generator=generator)
        t = torch.rand((batch_size, 1), generator=generator)
        r = torch.rand((batch_size, 1), generator=generator)
        t, r = torch.maximum(t, r), torch.minimum(t, r)
        if method == "flow_matching":
            loss = strategy.loss_fn(model, x0, t, e)
        else:
            loss = strategy.loss_fn(model, x0, t, r, e)
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        losses.append(float(loss))
        if log_every and step % log_every == 0:
            print(f"step {step}: loss={losses[-1]:.5f}")
    return losses


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--method", default="improved_mean_flow",
                        choices=["flow_matching", "mean_flow",
                                 "improved_mean_flow"])
    parser.add_argument("--steps", type=int, default=500)
    args = parser.parse_args()
    losses = train(method=args.method, steps=args.steps)
    print(f"final loss: {losses[-1]:.5f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
