"""Loss primitives (reference: meanflow_audio_codec/utils.py:16-29).

All functions are pure and reduce in float32 regardless of input dtype so
that bf16 activations do not poison the loss statistics (TPU mixed-precision
discipline: MXU in bf16, reductions in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _per_example_sq(delta: jnp.ndarray) -> jnp.ndarray:
    """Sum of squares over all non-batch axes, accumulated in f32."""
    delta = delta.astype(jnp.float32)
    return jnp.sum(delta * delta, axis=tuple(range(1, delta.ndim)))


def weighted_l2_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     p: float = 1.0, c: float = 1e-3) -> jnp.ndarray:
    """Adaptively weighted L2: ``mean(sg(1/(||d||^2+c)^p) * ||d||^2)``."""
    per_example = _per_example_sq(pred - target)
    weights = jax.lax.stop_gradient(1.0 / (per_example + c) ** p)
    return jnp.mean(weights * per_example)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain mean squared error, f32-accumulated."""
    delta = (pred - target).astype(jnp.float32)
    return jnp.mean(delta * delta)


def adaptive_weighted_loss(err: jnp.ndarray, gamma: float = 0.5,
                           c: float = 1e-3) -> jnp.ndarray:
    """MeanFlow adaptive reweighting: ``mean(sg(1/(e+c)^(1-gamma)) * e)``
    where ``e`` is the per-example *mean* squared error
    (reference loss_strategies.py:190-196 uses mean, not sum).
    """
    err = err.astype(jnp.float32)
    delta_sq = jnp.mean(err * err, axis=tuple(range(1, err.ndim)))
    w = jax.lax.stop_gradient(1.0 / (delta_sq + c) ** (1.0 - gamma))
    return jnp.mean(w * delta_sq)


def normalized_mse_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        eps: float = 1e-8) -> jnp.ndarray:
    """``||pred - target||^2 / (||target||^2 + eps)`` per example, meaned
    (reference flow_matching_trainer.py:13-42)."""
    num = _per_example_sq(pred - target)
    den = _per_example_sq(target)
    return jnp.mean(num / (den + eps))


def ema(mu, dx, beta: float = 0.99):
    """Scalar EMA for loss logging; returns ``dx`` when ``mu`` is None."""
    return beta * mu + (1.0 - beta) * dx if mu is not None else dx
