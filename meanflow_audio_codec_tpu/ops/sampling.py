"""ODE / mean-flow samplers (reference: meanflow_audio_codec/evaluators/
sampling.py:5-95 and the PyTorch dual-time samplers the JAX reference never
wired up, references/strategy.py:251-263, 339-351).

Both samplers are single jit-compiled ``lax.scan`` programs (the reference
jitted each Heun step separately and re-dispatched per step). CFG doubles
the model batch instead of running two sequential forward passes: the
conditional and unconditional rows ride one MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial


def _velocity(apply_fn, params, x, time, latents, guidance_scale: float):
    """Model velocity with classifier-free guidance.

    guidance_scale == 1 -> single conditional pass. Otherwise the cond and
    uncond rows are stacked into one [2B, ...] forward (one compiled matmul
    instead of two kernels) and blended:
    g*v_cond + (1-g)*v_uncond.
    """
    variables = {"params": params}
    if guidance_scale == 1.0:
        return apply_fn(variables, x, time, latents)
    # Unconditional == zero latents (model contract), so stack both halves:
    batch = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    time2 = jnp.concatenate([time, time], axis=0)
    latents2 = jnp.concatenate([latents, jnp.zeros_like(latents)], axis=0)
    v2 = apply_fn(variables, x2, time2, latents2)
    v_cond, v_uncond = v2[:batch], v2[batch:]
    return guidance_scale * v_cond + (1.0 - guidance_scale) * v_uncond


@partial(jax.jit, static_argnames=("apply_fn", "noise_dimension", "n_steps",
                                   "guidance_scale"))
def _heun_sample(apply_fn, noise_dimension: int, params, key, latents,
                 n_steps: int, guidance_scale: float) -> jnp.ndarray:
    batch = latents.shape[0]
    x0 = jax.random.normal(key, (batch, noise_dimension), dtype=jnp.float32)
    dt = 1.0 / n_steps
    ts = jnp.linspace(1.0, 0.0, n_steps, dtype=jnp.float32)

    def body(x, t):
        t1 = jnp.full((batch, 1), t, dtype=x.dtype)
        pair1 = jnp.concatenate([t1, jnp.zeros_like(t1)], axis=-1)
        k1 = _velocity(apply_fn, params, x, pair1, latents, guidance_scale)
        t2 = t1 - dt
        pair2 = jnp.concatenate([t2, jnp.zeros_like(t2)], axis=-1)
        k2 = _velocity(apply_fn, params, x - dt * k1.astype(x.dtype), pair2,
                       latents, guidance_scale)
        return x - (dt / 2.0) * (k1 + k2).astype(x.dtype), None

    x, _ = jax.lax.scan(body, x0, ts)
    return x


def sample(apply_fn, noise_dimension: int, params, key,
           latents: jnp.ndarray | None = None, n_steps: int = 100,
           use_improved_mean_flow: bool = False,
           guidance_scale: float = 1.0) -> jnp.ndarray:
    """Heun (RK2) ODE integration t: 1 -> 0 with optional CFG.

    Args:
        apply_fn: model apply; called as ``apply_fn(vars, x, [t,h], latents)``.
        noise_dimension: flat sample dimension.
        params: model params.
        key: PRNG key for the initial noise.
        latents: [B, ...] conditioning (required; sets the batch size).
        n_steps: integration steps (2 model calls each).
        use_improved_mean_flow: route to the dual-time sampler (the reference
            accepted and ignored this flag, sampling.py:31 — here it works).
        guidance_scale: CFG blend; 1.0 disables.
    """
    if latents is None:
        if guidance_scale != 1.0:
            raise ValueError("guidance_scale != 1.0 requires latents")
        raise ValueError("latents must be provided for conditional sampling")
    if use_improved_mean_flow:
        return sample_dual_time(apply_fn, noise_dimension, params, key,
                                latents, n_steps=n_steps,
                                guidance_scale=guidance_scale)
    return _heun_sample(apply_fn, noise_dimension, params, key, latents,
                        int(n_steps), float(guidance_scale))


@partial(jax.jit, static_argnames=("apply_fn", "noise_dimension", "n_steps",
                                   "guidance_scale", "heun"))
def _dual_time_sample(apply_fn, noise_dimension: int, params, key, latents,
                      n_steps: int, guidance_scale: float,
                      heun: bool, noise=None) -> jnp.ndarray:
    batch = latents.shape[0]
    if noise is None:
        noise = jax.random.normal(key, (batch, noise_dimension),
                                  dtype=jnp.float32)
    x0 = noise
    t_vals = jnp.linspace(1.0, 0.0, n_steps + 1, dtype=jnp.float32)
    intervals = jnp.stack([t_vals[:-1], t_vals[1:]], axis=-1)  # rows (t, r)

    def body(x, interval):
        t = jnp.full((batch, 1), interval[0], dtype=x.dtype)
        r = jnp.full((batch, 1), interval[1], dtype=x.dtype)
        dt = t - r
        pair = jnp.concatenate([t, t - r], axis=-1)
        u1 = _velocity(apply_fn, params, x, pair, latents, guidance_scale)
        if heun:
            # Two-point refinement from the reference torch sampler
            # (references/strategy.py:251-263): second eval at (r, r).
            pair_r = jnp.concatenate([r, jnp.zeros_like(r)], axis=-1)
            u2 = _velocity(apply_fn, params, x - dt * u1.astype(x.dtype),
                           pair_r, latents, guidance_scale)
            u = 0.5 * (u1 + u2)
        else:
            u = u1
        return x - dt * u.astype(x.dtype), None

    x, _ = jax.lax.scan(body, x0, intervals)
    return x


def sample_dual_time(apply_fn, noise_dimension: int, params, key,
                     latents: jnp.ndarray, n_steps: int = 1,
                     guidance_scale: float = 1.0,
                     heun: bool = False, noise=None) -> jnp.ndarray:
    """Mean-flow interval sampler: x <- x - (t-r) * u(x, t, r).

    With ``n_steps=1`` this is the true 1-NFE codec decode (one model call
    maps noise to data along the full [1, 0] interval). ``heun=True`` adds
    the second (r, r) evaluation per interval as in the PyTorch reference.
    ``noise`` overrides the key-drawn ``[B, noise_dimension]`` start point —
    the streaming decoder passes per-frame fold_in noise so chunked and
    batch decodes of the same latents are identical (streaming.py).
    """
    if latents is None:
        raise ValueError("latents must be provided for conditional sampling")
    return _dual_time_sample(apply_fn, noise_dimension, params, key, latents,
                             int(n_steps), float(guidance_scale), bool(heun),
                             noise=noise)
