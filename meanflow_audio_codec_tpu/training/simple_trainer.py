"""Minimal standalone trainer (legacy API surface).

Counterpart of the reference's older parallel path (meanflow_audio_codec/
trainers/flow_matching_trainer.py:13-293): self-contained jitted FM and iMF
train steps with the normalized-MSE loss, a ``create_train_state`` that
initialises encoder+decoder, and an epoch driver — useful for notebooks and
quick experiments without the full trainer stack.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable

import jax
import jax.numpy as jnp
import optax

from meanflow_audio_codec_tpu.models import TrainState
from meanflow_audio_codec_tpu.ops.losses import normalized_mse_loss
from meanflow_audio_codec_tpu.ops.time_sampling import logit_normal, sample_tr


def create_train_state(model, key, batch_size: int, learning_rate: float = 1e-4,
                       weight_decay: float = 1e-4) -> TrainState:
    """Initialise every parameter (encoder + decoder) in one pass."""
    dummy_x = jnp.zeros((batch_size, model.noise_dimension))
    dummy_t = jnp.zeros((batch_size, 2))
    variables = model.init(key, dummy_x, dummy_t, method="init_all")
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=optax.adamw(learning_rate, weight_decay=weight_decay))


@partial(jax.jit, donate_argnums=(0,))
def train_step_flow_matching(state, key, x):
    """One FM step with normalized MSE (reference trainer's loss)."""
    k_noise, k_t = jax.random.split(key)
    noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
    t = logit_normal(k_t, (x.shape[0], 1), dtype=x.dtype)
    noised = (1.0 - t) * x + t * noise
    target = noise - x
    time_pair = jnp.concatenate([t, jnp.zeros_like(t)], axis=-1)

    def loss_fn(params):
        latents = state.apply_fn({"params": params}, x, method="encode")
        pred = state.apply_fn({"params": params}, noised, time_pair, latents)
        return normalized_mse_loss(pred, target)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


@partial(jax.jit, donate_argnums=(0,))
def train_step_improved_mean_flow(state, key, x):
    """One iMF step with normalized MSE."""
    k_noise, k_tr = jax.random.split(key)
    noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
    t, r = sample_tr(k_tr, x.shape[0], dtype=x.dtype)
    noised = (1.0 - t) * x + t * noise
    target = noise - x

    def loss_fn(params):
        latents = state.apply_fn({"params": params}, x, method="encode")

        def u_fn(z, t_in, r_in):
            pair = jnp.concatenate([t_in, t_in - r_in], axis=-1)
            return state.apply_fn({"params": params}, z, pair, latents)

        pair_t = jnp.concatenate([t, jnp.zeros_like(t)], axis=-1)
        v = state.apply_fn({"params": params}, noised, pair_t, latents)
        u, dudt = jax.jvp(u_fn, (noised, t, r),
                          (v.astype(noised.dtype), jnp.ones_like(t),
                           jnp.zeros_like(r)))
        v_pred = u + (t - r) * jax.lax.stop_gradient(dudt)
        return normalized_mse_loss(v_pred, target)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


def train_epoch(state, key, batches: Iterable,
                use_improved_mean_flow: bool = False):
    """Drive one epoch; returns (state, mean loss)."""
    step_fn = (train_step_improved_mean_flow if use_improved_mean_flow
               else train_step_flow_matching)
    total, count = 0.0, 0
    for batch in batches:
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, sub, jnp.asarray(batch))
        total += float(loss)
        count += 1
    return state, (total / count if count else float("nan"))
