"""Noise schedules (reference: meanflow_audio_codec/trainers/noise_schedules.py).

A schedule defines the forward interpolant z_t between data x0 and noise x1
and the velocity target the model regresses. Frozen dataclasses so they are
hashable static arguments to jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def _col(t: jnp.ndarray) -> jnp.ndarray:
    """Broadcast time to a trailing singleton for [B, ...] data."""
    return t[:, None] if t.ndim == 1 else t


@dataclass(frozen=True)
class LinearNoiseSchedule:
    """z_t = (1-t) x0 + (noise_min + noise_max * t) x1; target = noise_max*x1 - x0."""

    noise_min: float = 0.001
    noise_max: float = 0.999

    def interpolate(self, x0, x1, t):
        t = _col(t)
        return (1.0 - t) * x0 + (self.noise_min + self.noise_max * t) * x1

    def compute_target(self, x0, x1):
        return self.noise_max * x1 - x0


@dataclass(frozen=True)
class UniformNoiseSchedule:
    """Standard flow matching: z_t = (1-t) x0 + t x1; target = x1 - x0."""

    def interpolate(self, x0, x1, t):
        t = _col(t)
        return (1.0 - t) * x0 + t * x1

    def compute_target(self, x0, x1):
        return x1 - x0


_SCHEDULES = {
    "linear": LinearNoiseSchedule,
    "uniform": UniformNoiseSchedule,
}


def create_noise_schedule(name: str | None, **kwargs):
    """Build a schedule by config name (None -> linear)."""
    if name is None:
        name = "linear"
    if name not in _SCHEDULES:
        raise ValueError(
            f"Unknown noise schedule {name!r}; expected one of {sorted(_SCHEDULES)}"
        )
    return _SCHEDULES[name](**kwargs)
