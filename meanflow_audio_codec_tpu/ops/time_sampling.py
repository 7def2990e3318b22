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
              std: float = 1.0, data_proportion: float = 0.5,
              full_interval_proportion: float = 0.0):
    """Sample an ordered (t, r) pair, forcing r = t on a deterministic prefix.

    The first ``int(batch_size * data_proportion)`` rows get r := t (the
    flow-matching boundary slice); the rest keep r < t. Matches the
    reference's deterministic prefix mask (utils.py:36-45).

    ``full_interval_proportion`` forces the NEXT slice of rows to exactly
    (t, r) = (1, 0) — the query a 1-NFE codec decode evaluates. Under
    logit-normal pair sampling that point has ~0 training mass (t > 0.95
    AND r < 0.05 is a ~1e-5 joint), so 1-NFE decode quality rests entirely
    on the mean-flow identity extrapolating; supervising the corner
    directly closes that gap. An extension over the reference (its
    sampler never trains the full interval, utils.py:36-45).

    Returns:
        (t, r), each ``[B, 1]`` with r <= t.
    """
    k_t, k_r = jax.random.split(key, 2)
    t = logit_normal(k_t, (batch_size, 1), mean=mean, std=std, dtype=dtype)
    r = logit_normal(k_r, (batch_size, 1), mean=mean, std=std, dtype=dtype)
    t, r = jnp.maximum(t, r), jnp.minimum(t, r)
    rows = jnp.arange(batch_size)[:, None]
    n_data = int(batch_size * data_proportion)
    mask = rows < n_data
    r = jnp.where(mask, t, r)
    if full_interval_proportion:
        n_full = int(batch_size * full_interval_proportion)
        full = (rows >= n_data) & (rows < n_data + n_full)
        t = jnp.where(full, jnp.ones_like(t), t)
        r = jnp.where(full, jnp.zeros_like(r), r)
    return t, r


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
    full_interval_proportion: float = 0.0

    def sample_time(self, key, batch_size: int, dtype=jnp.float32):
        return logit_normal(key, (batch_size, 1), mean=self.mean,
                            std=self.std, dtype=dtype)

    def sample_time_pair(self, key, batch_size: int, dtype=jnp.float32):
        return sample_tr(
            key, batch_size, dtype=dtype, mean=self.mean, std=self.std,
            data_proportion=self.data_proportion,
            full_interval_proportion=self.full_interval_proportion)


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
