"""Differential tests: JAX objectives vs the PyTorch oracle strategies.

Both frameworks evaluate the SAME closed-form model
``u(z, t, r) = z @ A * s(t, r)`` with shared NumPy weights and identical
noise/time inputs, so any loss or gradient mismatch isolates a bug in the
objective math (JVP direction, stop-gradient placement, adaptive weighting)
— the triage role of the reference's trusted torch tier (README.md:57-79).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from meanflow_audio_codec_tpu.ops.losses import (
    adaptive_weighted_loss,
    weighted_l2_loss,
)
from meanflow_audio_codec_tpu.references.strategy import (
    FlowMatchingStrategy,
    ImprovedMeanFlowStrategy,
    MeanFlowStrategy,
)

DIM, BATCH = 6, 8
RNG = np.random.default_rng(0)
A_NP = RNG.standard_normal((DIM, DIM)).astype(np.float32) * 0.3
X0_NP = RNG.standard_normal((BATCH, DIM)).astype(np.float32)
E_NP = RNG.standard_normal((BATCH, DIM)).astype(np.float32)
T_NP = RNG.uniform(0.3, 0.9, (BATCH, 1)).astype(np.float32)
R_NP = (T_NP * RNG.uniform(0.1, 0.9, (BATCH, 1))).astype(np.float32)


def _torch_model(a_param):
    def model(z, t, r):
        return z @ a_param * (1.0 + 0.5 * t + 0.25 * (t - r))
    return model


def _jax_model(a_param):
    def model(z, t, r):
        return z @ a_param * (1.0 + 0.5 * t + 0.25 * (t - r))
    return model


def _torch_loss_and_grad(loss_fn):
    a = torch.tensor(A_NP, requires_grad=True)
    loss = loss_fn(_torch_model(a))
    loss.backward()
    return float(loss), a.grad.numpy()


def _jax_loss_and_grad(loss_fn):
    loss, grad = jax.value_and_grad(
        lambda a: loss_fn(_jax_model(a)))(jnp.asarray(A_NP))
    return float(loss), np.asarray(grad)


def test_flow_matching_differential():
    strategy = FlowMatchingStrategy()
    x0_t, t_t, e_t = map(torch.tensor, (X0_NP, T_NP, E_NP))

    loss_t, grad_t = _torch_loss_and_grad(
        lambda m: strategy.loss_fn(m, x0_t, t_t, e_t))

    def jax_loss(model):
        x0, t, e = map(jnp.asarray, (X0_NP, T_NP, E_NP))
        z = (1.0 - t) * x0 + (0.001 + 0.999 * t) * e
        target = 0.999 * e - x0
        pred = model(z, t, t)
        return weighted_l2_loss(pred, target)

    loss_j, grad_j = _jax_loss_and_grad(jax_loss)
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-5)
    np.testing.assert_allclose(grad_j, grad_t, rtol=1e-4, atol=1e-6)


def test_mean_flow_differential():
    strategy = MeanFlowStrategy(gamma=0.5, c=1e-3)
    x0_t, t_t, r_t, e_t = map(torch.tensor, (X0_NP, T_NP, R_NP, E_NP))
    loss_t, grad_t = _torch_loss_and_grad(
        lambda m: strategy.loss_fn(m, x0_t, t_t, r_t, e_t))

    def jax_loss(model):
        x0, t, r, e = map(jnp.asarray, (X0_NP, T_NP, R_NP, E_NP))
        z = (1.0 - t) * x0 + t * e
        v = e - x0
        u, dudt = jax.jvp(lambda z_, t_, r_: model(z_, t_, r_),
                          (z, t, r),
                          (v, jnp.ones_like(t), jnp.zeros_like(r)))
        u_target = v - jnp.clip(t - r, 0.0, 1.0) * jax.lax.stop_gradient(dudt)
        return adaptive_weighted_loss(u - u_target, gamma=0.5, c=1e-3)

    loss_j, grad_j = _jax_loss_and_grad(jax_loss)
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-5)
    np.testing.assert_allclose(grad_j, grad_t, rtol=1e-4, atol=1e-6)


def test_improved_mean_flow_differential():
    strategy = ImprovedMeanFlowStrategy()
    x0_t, t_t, r_t, e_t = map(torch.tensor, (X0_NP, T_NP, R_NP, E_NP))
    loss_t, grad_t = _torch_loss_and_grad(
        lambda m: strategy.loss_fn(m, x0_t, t_t, r_t, e_t))

    def jax_loss(model):
        x0, t, r, e = map(jnp.asarray, (X0_NP, T_NP, R_NP, E_NP))
        z = (1.0 - t) * x0 + (0.001 + 0.999 * t) * e
        target = 0.999 * e - x0
        v = model(z, t, t)
        u, dudt = jax.jvp(lambda z_, t_, r_: model(z_, t_, r_),
                          (z, t, r),
                          (v, jnp.ones_like(t), jnp.zeros_like(r)))
        v_pred = u + (t - r) * jax.lax.stop_gradient(dudt)
        return weighted_l2_loss(v_pred, target)

    loss_j, grad_j = _jax_loss_and_grad(jax_loss)
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-5)
    np.testing.assert_allclose(grad_j, grad_t, rtol=1e-4, atol=1e-6)


def test_torch_oracle_trains():
    """The oracle training loop itself converges (method sanity)."""
    from meanflow_audio_codec_tpu.references.train import train
    losses = train(method="improved_mean_flow", steps=60, batch_size=32,
                   dim=8, log_every=0)
    assert np.isfinite(losses).all()
    # weighted loss hovers near 1; require stability, not collapse
    assert np.mean(losses[-10:]) <= np.mean(losses[:10]) * 1.5


def test_dual_time_samplers_match():
    """JAX and torch iMF interval samplers agree on the closed-form model."""
    from meanflow_audio_codec_tpu.references.strategy import (
        ImprovedMeanFlowStrategy)
    x1 = RNG.standard_normal((BATCH, DIM)).astype(np.float32)

    out_t = ImprovedMeanFlowStrategy().sample_fn(
        _torch_model(torch.tensor(A_NP)), torch.tensor(x1), n_steps=3)

    # JAX interval stepping with the same closed-form model
    x = jnp.asarray(x1)
    a = jnp.asarray(A_NP)
    t_vals = np.linspace(1.0, 0.0, 4)
    for i in range(3):
        t = jnp.full((BATCH, 1), t_vals[i])
        r = jnp.full((BATCH, 1), t_vals[i + 1])
        x = x - (t - r) * _jax_model(a)(x, t, r)
    np.testing.assert_allclose(np.asarray(x), out_t.numpy(), rtol=1e-5,
                               atol=1e-6)
