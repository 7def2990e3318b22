"""The fused train step.

One jit-compiled program per training run containing: (optional) in-graph
tokenization -> objective loss (encoder fwd + boundary fwd + JVP dual fwd)
-> backward -> optimizer update, with the state donated so parameters and
optimizer slots update in place in HBM.

This replaces the reference's eager, per-op dispatched step
(meanflow_audio_codec/trainers/training_steps.py:37-61 — never jitted — and
the eager per-batch host-side tokenization at trainers/train.py:337-341),
and fixes its broken legacy wrapper (train_step_improved_mean_flow called an
undefined jit symbol, training_steps.py:64-74).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from meanflow_audio_codec_tpu.training.objectives import Objective


def _guard_nonfinite(state, new_state, loss, grad_norm):
    """Keep the old state when the update is non-finite (in-graph select).

    Checks loss, gradient norm AND the updated parameters: a finite but
    enormous gradient (e.g. 1e20) passes an isfinite(grads) test yet
    overflows the Adam second moment (1e40 -> inf), turning the update into
    inf/inf = NaN — observed in bf16 mean-flow JVP training. The parameter
    sweep costs one extra pass over the weights.

    Returns ``(guarded_state, ok)``; ok is a traced bool for the metrics.
    """
    params_ok = jnp.array(True)
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        params_ok &= jnp.all(jnp.isfinite(leaf))
    ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm) & params_ok
    guarded = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), new_state, state)
    return guarded, ok


def make_train_step(objective: Objective,
                    tokenizer: Any | None = None,
                    flatten: bool = True,
                    donate: bool = True,
                    remat: bool = False,
                    skip_nonfinite: bool = False) -> Callable:
    """Build the jitted ``(state, key, batch) -> (state, metrics)`` step.

    Args:
        objective: the loss strategy (pure ``loss(params, apply_fn, key, x)``).
        tokenizer: optional TokenizationStrategy applied in-graph.
        flatten: flatten tokens to [B, n_tokens * token_dim] for the flat
            models (the reference's noise_dimension convention).
        donate: donate the state argument (in-place HBM update).
        remat: rematerialise the loss computation in the backward pass
            (trades ~1/3 more FLOPs for activation memory on big decoders).
        skip_nonfinite: drop (do not apply) updates whose loss or gradient
            norm is NaN/inf; metrics gain an ``update_ok`` flag.
    """

    def step(state, key, batch):
        x = batch
        if tokenizer is not None:
            x = tokenizer.tokenize(x)
        if flatten and x.ndim > 2:
            x = x.reshape(x.shape[0], -1)

        def loss_fn(params):
            return objective.loss(params, state.apply_fn, key, x)

        if remat:
            loss_fn = jax.checkpoint(loss_fn)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grad_norm = optax.global_norm(grads)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "grad_norm": grad_norm, **aux}
        if skip_nonfinite:
            new_state, ok = _guard_nonfinite(state, new_state, loss,
                                             grad_norm)
            metrics["update_ok"] = ok
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_step(objective: Objective, num_steps: int,
                    tokenizer: Any | None = None, flatten: bool = True,
                    donate: bool = True, remat: bool = False,
                    skip_nonfinite: bool = False) -> Callable:
    """K train steps per device call via ``lax.scan``.

    One compiled program advances the state ``num_steps`` times over a
    stacked batch ``[K, B, ...]`` — amortising per-call host dispatch (the
    dominant cost on remote-dispatch links) and letting XLA overlap the
    optimizer update with the next microbatch. Returns
    ``(state, key, batches) -> (state, stacked_metrics)``.
    """

    def one(carry, batch):
        state, key = carry
        key, sub = jax.random.split(key)
        x = batch
        if tokenizer is not None:
            x = tokenizer.tokenize(x)
        if flatten and x.ndim > 2:
            x = x.reshape(x.shape[0], -1)

        def loss_fn(params):
            return objective.loss(params, state.apply_fn, sub, x)

        inner = jax.checkpoint(loss_fn) if remat else loss_fn
        (loss, aux), grads = jax.value_and_grad(inner, has_aux=True)(
            state.params)
        grad_norm = optax.global_norm(grads)
        new_state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "grad_norm": grad_norm, **aux}
        if skip_nonfinite:
            new_state, ok = _guard_nonfinite(state, new_state, loss,
                                             grad_norm)
            metrics["update_ok"] = ok
        return (new_state, key), metrics

    def run(state, key, batches):
        (state, _), metrics = jax.lax.scan(one, (state, key), batches)
        return state, metrics

    return jax.jit(run, donate_argnums=(0,) if donate else ())


def train_step(state, key, x, loss_strategy: Objective):
    """Reference-compatible single step (training_steps.py:37-61): strategy
    computes (loss, grads), optimizer applies. Prefer ``make_train_step`` —
    this entry point is eager unless the caller jits it."""
    loss, grads = loss_strategy.compute_loss(state, key, x)
    return state.apply_gradients(grads=grads), loss


def make_eval_step(objective: Objective, tokenizer: Any | None = None,
                   flatten: bool = True) -> Callable:
    """Jitted loss-only step for validation passes."""

    def step(state, key, batch):
        x = batch
        if tokenizer is not None:
            x = tokenizer.tokenize(x)
        if flatten and x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        loss, aux = objective.loss(state.params, state.apply_fn, key, x)
        return {"loss": loss, **aux}

    return jax.jit(step)
