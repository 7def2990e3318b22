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


def weighted_l2_per_example(pred: jnp.ndarray, target: jnp.ndarray,
                            p: float = 1.0, c: float = 1e-3) -> jnp.ndarray:
    """Per-example adaptively weighted L2 terms; ``mean`` of this equals
    :func:`weighted_l2_loss`."""
    per_example = _per_example_sq(pred - target)
    weights = jax.lax.stop_gradient(1.0 / (per_example + c) ** p)
    return weights * per_example


def mse_per_example(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-example mean squared error; ``mean`` of this equals
    :func:`mse_loss`."""
    delta = (pred - target).astype(jnp.float32)
    return jnp.mean(delta * delta, axis=tuple(range(1, delta.ndim)))


def adaptive_weighted_per_example(err: jnp.ndarray, gamma: float = 0.5,
                                  c: float = 1e-3) -> jnp.ndarray:
    """Per-example MeanFlow adaptive terms; ``mean`` of this equals
    :func:`adaptive_weighted_loss`."""
    err = err.astype(jnp.float32)
    delta_sq = jnp.mean(err * err, axis=tuple(range(1, err.ndim)))
    w = jax.lax.stop_gradient(1.0 / (delta_sq + c) ** (1.0 - gamma))
    return w * delta_sq


# ---------------------------------------------------------------------------
# Time-dependent loss weighting (the ``loss_weighting`` config knob)
# ---------------------------------------------------------------------------

#: reserved top-level key in the param tree holding learned-weighting params.
LEARNED_WEIGHT_KEY = "loss_weighting"


def time_dependent_weight(t: jnp.ndarray, c: float = 1e-2) -> jnp.ndarray:
    """SNR-style weight ``w(t) = 1/(t^2 + c)``, normalised to batch-mean 1.

    With the linear schedule, noise power grows ~t^2, so this down-weights
    high-noise (uninformative) times — a min-SNR-flavoured weighting. The
    batch normalisation keeps the loss scale comparable to ``uniform``.
    """
    t = t.astype(jnp.float32).reshape(-1)
    w = 1.0 / (t * t + c)
    return w / jnp.mean(w)


def init_learned_weight_params() -> dict:
    """Fresh params for ``loss_weighting='learned'``: s(t) = a0+a1 t+a2 t^2
    initialised to zero (i.e. w(t)=1, regulariser 0)."""
    return {"poly": jnp.zeros((3,), dtype=jnp.float32)}


def learned_weight_terms(weight_params: dict, t: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Kendall-style uncertainty weighting: returns ``(w(t), regulariser)``.

    The objective uses ``mean(w(t) * per_example) + regulariser`` with
    ``w(t) = exp(-s(t))`` and ``reg = mean(s(t))``; the log-variance
    polynomial s is trained jointly with the model, so the weighting is
    *learned* rather than prescribed.
    """
    poly = weight_params["poly"].astype(jnp.float32)
    t = t.astype(jnp.float32).reshape(-1)
    s = poly[0] + poly[1] * t + poly[2] * t * t
    return jnp.exp(-s), jnp.mean(s)


def apply_loss_weighting(per_example: jnp.ndarray, t: jnp.ndarray,
                         weighting: str, params) -> jnp.ndarray:
    """Reduce per-example loss terms under the configured time weighting.

    ``weighting``: ``uniform`` (plain mean), ``time_dependent``
    (:func:`time_dependent_weight`), or ``learned``
    (:func:`learned_weight_terms`; requires ``params[LEARNED_WEIGHT_KEY]``,
    see :func:`init_learned_weight_params`).
    """
    if weighting in (None, "uniform"):
        return jnp.mean(per_example)
    if weighting == "time_dependent":
        return jnp.mean(time_dependent_weight(t) * per_example)
    if weighting == "learned":
        if LEARNED_WEIGHT_KEY not in params:
            raise ValueError(
                "loss_weighting='learned' requires learned-weight params; "
                "merge ops.losses.init_learned_weight_params() under "
                f"params[{LEARNED_WEIGHT_KEY!r}] at init (the trainer does "
                "this automatically)")
        w, reg = learned_weight_terms(params[LEARNED_WEIGHT_KEY], t)
        return jnp.mean(w * per_example) + reg
    raise ValueError(
        f"Unknown loss_weighting: {weighting}. Must be one of: "
        "'uniform', 'time_dependent', 'learned'")


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
