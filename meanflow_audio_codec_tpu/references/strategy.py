"""Trusted PyTorch reference objectives — debugging oracles.

Counterpart of the reference's trusted-implementation tier (reference:
meanflow_audio_codec/references/strategy.py:107-388, README.md:57-79):
independent PyTorch implementations of the FM / MF / iMF losses and their
dual-time samplers, used to triage whether a discrepancy lives in the JAX
port or in the method itself (manual differential testing). The CPU torch
build in this image runs them; tests/test_differential.py compares loss
values *and* gradients against the JAX objectives on identical inputs.

Each strategy takes ``model(z, t, r) -> u`` (average velocity over [r, t]),
time tensors shaped [B, 1].
"""

from __future__ import annotations

from dataclasses import dataclass

import torch


def _interp_linear(x0, e, t, noise_min: float, noise_max: float):
    """(1-t) x0 + (noise_min + noise_max t) e — the JAX LinearNoiseSchedule."""
    return (1.0 - t) * x0 + (noise_min + noise_max * t) * e


@dataclass
class FlowMatchingStrategy:
    """Conditional flow matching with the linear schedule."""

    noise_min: float = 0.001
    noise_max: float = 0.999
    use_weighted_loss: bool = True
    weight_p: float = 1.0
    weight_c: float = 1e-3

    def loss_fn(self, model, x0, t, e):
        z = _interp_linear(x0, e, t, self.noise_min, self.noise_max)
        target = self.noise_max * e - x0
        pred = model(z, t, t)  # r = t: instantaneous velocity
        delta = pred - target
        if not self.use_weighted_loss:
            return delta.pow(2).mean()
        per_example = delta.pow(2).sum(dim=tuple(range(1, delta.ndim)))
        weights = (1.0 / (per_example + self.weight_c)
                   ** self.weight_p).detach()
        return (weights * per_example).mean()

    @torch.no_grad()
    def sample_fn(self, model, x1, n_steps: int):
        """Heun ODE t: 1 -> 0."""
        x = x1
        dt = 1.0 / n_steps
        for i in range(n_steps):
            t = torch.full((x.shape[0], 1), 1.0 - i * dt)
            k1 = model(x, t, t)
            k2 = model(x - dt * k1, t - dt, t - dt)
            x = x - dt / 2.0 * (k1 + k2)
        return x


@dataclass
class MeanFlowStrategy:
    """Mean flow: JVP along (e - x, 1, 0), adaptive reweighting."""

    gamma: float = 0.5
    c: float = 1e-3

    def loss_fn(self, model, x0, t, r, e):
        z = (1.0 - t) * x0 + t * e
        v = e - x0
        u, dudt = torch.autograd.functional.jvp(
            model, (z, t, r), (v, torch.ones_like(t), torch.zeros_like(r)),
            create_graph=True)
        u_target = v - torch.clip(t - r, 0.0, 1.0) * dudt.detach()
        err = u - u_target
        delta_sq = err.pow(2).mean(dim=tuple(range(1, err.ndim)))
        weights = (1.0 / (delta_sq + self.c).pow(1.0 - self.gamma)).detach()
        return (weights * delta_sq).mean()

    @torch.no_grad()
    def sample_fn(self, model, x1, n_steps: int):
        """Dual-time interval stepping with a second (r, r) refinement."""
        x = x1
        t_vals = torch.linspace(1.0, 0.0, n_steps + 1)
        for i in range(n_steps):
            t = t_vals[i].expand(x.shape[0], 1)
            r = t_vals[i + 1].expand(x.shape[0], 1)
            dt = t - r
            k1 = model(x, t, r)
            k2 = model(x - dt * k1, r, r)
            x = x - dt / 2.0 * (k1 + k2)
        return x


@dataclass
class ImprovedMeanFlowStrategy:
    """iMF: boundary v = u(z,t,t), JVP along (v, 1, 0), compound prediction
    u + (t-r) sg(du/dt) regressed on the linear-schedule target."""

    noise_min: float = 0.001
    noise_max: float = 0.999
    use_weighted_loss: bool = True
    weight_p: float = 1.0
    weight_c: float = 1e-3

    def loss_fn(self, model, x0, t, r, e):
        z = _interp_linear(x0, e, t, self.noise_min, self.noise_max)
        target = self.noise_max * e - x0
        v = model(z, t, t)  # boundary condition
        u, dudt = torch.autograd.functional.jvp(
            model, (z, t, r),
            (v, torch.ones_like(t), torch.zeros_like(r)),
            create_graph=True)
        v_pred = u + (t - r) * dudt.detach()
        delta = v_pred - target
        if not self.use_weighted_loss:
            return delta.pow(2).mean()
        per_example = delta.pow(2).sum(dim=tuple(range(1, delta.ndim)))
        weights = (1.0 / (per_example + self.weight_c)
                   ** self.weight_p).detach()
        return (weights * per_example).mean()

    @torch.no_grad()
    def sample_fn(self, model, x1, n_steps: int):
        """1..n-NFE interval transport: x <- x - (t-r) u(x, t, r)."""
        x = x1
        t_vals = torch.linspace(1.0, 0.0, n_steps + 1)
        for i in range(n_steps):
            t = t_vals[i].expand(x.shape[0], 1)
            r = t_vals[i + 1].expand(x.shape[0], 1)
            x = x - (t - r) * model(x, t, r)
        return x


def get_strategy(method: str):
    strategies = {
        "flow_matching": FlowMatchingStrategy,
        "mean_flow": MeanFlowStrategy,
        "improved_mean_flow": ImprovedMeanFlowStrategy,
    }
    if method not in strategies:
        raise ValueError(
            f"Unknown method: {method}. Choose from {sorted(strategies)}")
    return strategies[method]()
