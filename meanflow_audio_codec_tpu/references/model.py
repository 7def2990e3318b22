"""Minimal PyTorch dual-time flow model for the oracle tier
(reference: meanflow_audio_codec/references/model.py:9-105).

Small enough to train on CPU in seconds; the (t, h = t - r) conditioning
convention matches the JAX models so samplers are interchangeable.
"""

from __future__ import annotations

import math

import torch
from torch import nn


def sinusoidal_embedding(x: torch.Tensor, dim: int,
                         max_period: float = 10000.0) -> torch.Tensor:
    """[B] -> [B, dim], cos half then sin half (matches the JAX embedding)."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = x.float().reshape(-1, 1) * freqs.reshape(1, -1)
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class AdaLNBlock(nn.Module):
    """LayerNorm (no affine) -> cond scale/shift -> MLP -> cond out-scale,
    residual / num_blocks."""

    def __init__(self, dim: int, cond_dim: int, num_blocks: int):
        super().__init__()
        self.norm = nn.LayerNorm(dim, elementwise_affine=False)
        self.modulation = nn.Sequential(
            nn.Linear(cond_dim, cond_dim), nn.GELU(approximate="tanh"),
            nn.Linear(cond_dim, 3 * dim))
        self.mlp = nn.Sequential(
            nn.Linear(dim, dim), nn.GELU(approximate="tanh"),
            nn.Linear(dim, dim))
        self.num_blocks = num_blocks

    def forward(self, x: torch.Tensor, cond: torch.Tensor) -> torch.Tensor:
        scale1, shift, scale2 = self.modulation(cond).chunk(3, dim=-1)
        h = self.mlp((1.0 + scale1) * self.norm(x) + shift)
        return h * (1.0 + scale2) / self.num_blocks + x


class TorchConditionalFlow(nn.Module):
    """u(z, t, r) with dual-time sinusoidal conditioning."""

    def __init__(self, noise_dim: int = 16, cond_dim: int = 32,
                 num_blocks: int = 2):
        super().__init__()
        self.cond_dim = cond_dim
        self.blocks = nn.ModuleList(
            [AdaLNBlock(noise_dim, cond_dim, num_blocks)
             for _ in range(num_blocks)])

    def forward(self, z: torch.Tensor, t: torch.Tensor,
                r: torch.Tensor) -> torch.Tensor:
        cond = (sinusoidal_embedding(t[:, 0], self.cond_dim)
                + sinusoidal_embedding((t - r)[:, 0], self.cond_dim))
        h = z
        for block in self.blocks:
            h = block(h, cond)
        return h
