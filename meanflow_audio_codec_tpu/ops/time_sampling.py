"""Time-sampling strategies (reference: meanflow_audio_codec/trainers/time_sampling.py,
utils.py:32-45).

Implemented as a tiny registry of pure functions closed over their
hyper-parameters, rather than an ABC hierarchy: everything must trace
cleanly inside the single jit-compiled train step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def logit_normal(key, shape, mean: float = -0.4, std: float = 1.0,
                 dtype=jnp.float32) -> jnp.ndarray:
    """sigmoid(N(mean, std)) — concentrates mass near 0 and 1."""
    return jax.nn.sigmoid(jax.random.normal(key, shape, dtype=dtype) * std + mean)


def sample_tr(key, batch_size: int, dtype=jnp.float32, mean: float = -0.4,
              std: float = 1.0, data_proportion: float = 0.5):
    """Sample an ordered (t, r) pair, forcing r = t on a deterministic prefix.

    The first ``int(batch_size * data_proportion)`` rows get r := t (the
    flow-matching boundary slice); the rest keep r < t. Matches the
    reference's deterministic prefix mask (utils.py:36-45).

    Returns:
        (t, r), each ``[B, 1]`` with r <= t.
    """
    k_t, k_r = jax.random.split(key, 2)
    t = logit_normal(k_t, (batch_size, 1), mean=mean, std=std, dtype=dtype)
    r = logit_normal(k_r, (batch_size, 1), mean=mean, std=std, dtype=dtype)
    t, r = jnp.maximum(t, r), jnp.minimum(t, r)
    mask = (jnp.arange(batch_size) < int(batch_size * data_proportion))[:, None]
    return t, jnp.where(mask, t, r)


@dataclass(frozen=True)
class UniformTimeSampling:
    """t ~ U[0, 1]."""

    def sample_time(self, key, batch_size: int, dtype=jnp.float32):
        return jax.random.uniform(key, (batch_size, 1), dtype=dtype)


@dataclass(frozen=True)
class LogitNormalTimeSampling:
    """t ~ sigmoid(N(mean, std))."""

    mean: float = -0.4
    std: float = 1.0

    def sample_time(self, key, batch_size: int, dtype=jnp.float32):
        return logit_normal(key, (batch_size, 1), mean=self.mean,
                            std=self.std, dtype=dtype)


@dataclass(frozen=True)
class MeanFlowTimeSampling:
    """Ordered (t, r) pairs for mean-flow objectives."""

    mean: float = -0.4
    std: float = 1.0
    data_proportion: float = 0.5

    def sample_time(self, key, batch_size: int, dtype=jnp.float32):
        return logit_normal(key, (batch_size, 1), mean=self.mean,
                            std=self.std, dtype=dtype)

    def sample_time_pair(self, key, batch_size: int, dtype=jnp.float32):
        return sample_tr(key, batch_size, dtype=dtype, mean=self.mean,
                         std=self.std, data_proportion=self.data_proportion)


_TIME_SAMPLERS = {
    "uniform": UniformTimeSampling,
    "logit_normal": LogitNormalTimeSampling,
    "mean_flow": MeanFlowTimeSampling,
}


def create_time_sampling(name: str | None, **kwargs):
    """Build a time sampler by config name (None -> logit_normal)."""
    if name is None:
        name = "logit_normal"
    if name not in _TIME_SAMPLERS:
        raise ValueError(
            f"Unknown time sampling {name!r}; expected one of {sorted(_TIME_SAMPLERS)}"
        )
    return _TIME_SAMPLERS[name](**kwargs)
