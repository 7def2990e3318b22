"""Training objectives: autoencoder, flow matching, mean flow, improved mean flow.

Re-design of the reference loss strategies (meanflow_audio_codec/trainers/
loss_strategies.py:27-280) as *pure loss functions* on frozen dataclasses:
``objective.loss(params, apply_fn, key, x)`` returns ``(loss, aux)`` and is
called inside a single jit-compiled, donated train step — so the encoder
forward, the boundary forward, the ``jax.jvp`` dual forward and the backward
pass all fuse into one XLA program (the reference dispatched each op
eagerly, training_steps.py:37-61).

Math (identical to the reference):

  FM  : z = interp(x, e, t);  v̂ = f(z, [t,0], lat);  L = w‖v̂ - tgt‖²
  MF  : z = (1-t)x + te (uniform, by definition of the method);
        (u, du/dt) = jvp(f, (z,t,r), (e-x, 1, 0));
        u_tgt = (e-x) - clip(t-r)·sg(du/dt);
        L = mean(sg(1/(mse+c)^(1-γ)) · mse(u - u_tgt))
  iMF : v = f(z, [t,0], lat)          (boundary: u(z,t,t) = v(z,t))
        (u, du/dt) = jvp(f, (z,t,r), (v, 1, 0));
        v_pred = u + (t-r)·sg(du/dt);  L = w‖v_pred - tgt‖²
  AE  : lat = encode(x); x̂ = f(0, [0,0], lat);  L = ‖x̂ - x‖²

The model signature is ``apply_fn(variables, z, time, latents)`` with
``time = [t, h=t-r]`` columns and ``apply_fn(variables, x, method="encode")``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp

from meanflow_audio_codec_tpu.ops.losses import (
    adaptive_weighted_per_example,
    apply_loss_weighting,
    mse_loss,
    mse_per_example,
    weighted_l2_loss,
    weighted_l2_per_example,
)
from meanflow_audio_codec_tpu.ops.schedules import (
    LinearNoiseSchedule,
    UniformNoiseSchedule,
    create_noise_schedule,
)
from meanflow_audio_codec_tpu.ops.time_sampling import (
    LogitNormalTimeSampling,
    MeanFlowTimeSampling,
    UniformTimeSampling,
    create_time_sampling,
)

ApplyFn = Callable[..., jnp.ndarray]


def _time_pair(t: jnp.ndarray, h: jnp.ndarray | None = None) -> jnp.ndarray:
    """Stack (t, h) columns; h defaults to 0 (instantaneous velocity)."""
    if h is None:
        h = jnp.zeros_like(t)
    return jnp.concatenate([t, h], axis=-1)


class Objective:
    """Base: pure ``loss`` plus the reference-compatible ``compute_loss``."""

    def loss(self, params, apply_fn: ApplyFn, key, x: jnp.ndarray
             ) -> tuple[jnp.ndarray, dict]:
        raise NotImplementedError

    def _encode(self, variables, apply_fn: ApplyFn, key,
                x: jnp.ndarray) -> jnp.ndarray:
        """Encoder latents, quantization-aware when ``latent_qat`` is set.

        The QAT key is folded from the step key (not split) so runs
        without QAT keep their exact historical noise/time streams.
        """
        latents = apply_fn(variables, x, method="encode")
        qat = getattr(self, "latent_qat", None)
        if qat is not None:
            latents = qat(latents, jax.random.fold_in(key, 0x9A7))
        return latents

    def compute_loss(self, state, key, x: jnp.ndarray):
        """(loss, grads) — drop-in for the reference LossStrategy API
        (loss_strategies.py:30-47)."""
        def wrapped(params):
            loss, _ = self.loss(params, state.apply_fn, key, x)
            return loss
        return jax.value_and_grad(wrapped)(state.params)


@dataclass(frozen=True)
class AutoencoderObjective(Objective):
    """Deterministic reconstruction: decode(0, t=0, encode(x)) ≈ x.

    Trains encoder and decoder jointly for any flow architecture; for plain
    autoencoder models (MLPMixerAutoencoder) set ``direct_call=True`` to use
    ``model(x)`` (reference proj/audio_autoencoder semantics).
    """

    use_weighted_loss: bool = False
    direct_call: bool = False
    #: optional LatentQAT (ops.latent_quant) — train the decoder on the
    #: quantized latents it will see at serve time (stored-format QAT)
    latent_qat: Any = None

    def loss(self, params, apply_fn, key, x):
        variables = {"params": params}
        if self.direct_call:
            recon = apply_fn(variables, x)
        else:
            latents = self._encode(variables, apply_fn, key, x)
            zeros = jnp.zeros_like(x)
            recon = apply_fn(variables, zeros,
                             _time_pair(jnp.zeros((x.shape[0], 1), x.dtype)),
                             latents)
        loss_fn = weighted_l2_loss if self.use_weighted_loss else mse_loss
        loss = loss_fn(recon, x)
        return loss, {"mse": mse_loss(recon, x)}


@dataclass(frozen=True)
class FlowMatchingObjective(Objective):
    """Conditional flow matching (reference loss_strategies.py:50-112)."""

    noise_schedule: Any = field(default_factory=LinearNoiseSchedule)
    time_sampling: Any = field(default_factory=LogitNormalTimeSampling)
    use_weighted_loss: bool = True
    #: 'uniform' | 'time_dependent' | 'learned' (see ops.losses)
    loss_weighting: str = "uniform"
    #: optional LatentQAT (ops.latent_quant) — train the decoder on the
    #: quantized latents it will see at serve time (stored-format QAT)
    latent_qat: Any = None

    def loss(self, params, apply_fn, key, x):
        k_noise, k_time = jax.random.split(key)
        noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
        t = self.time_sampling.sample_time(k_time, x.shape[0], dtype=x.dtype)
        noised = self.noise_schedule.interpolate(x, noise, t)
        target = self.noise_schedule.compute_target(x, noise)
        variables = {"params": params}
        latents = self._encode(variables, apply_fn, key, x)
        pred = apply_fn(variables, noised, _time_pair(t), latents)
        per_fn = (weighted_l2_per_example if self.use_weighted_loss
                  else mse_per_example)
        loss = apply_loss_weighting(per_fn(pred, target), t,
                                    self.loss_weighting, params)
        return loss, {"mse": mse_loss(pred, target)}


@dataclass(frozen=True)
class MeanFlowObjective(Objective):
    """Mean flow with adaptive reweighting
    (reference loss_strategies.py:115-201).

    Uses the *uniform* interpolant by definition of the method (the
    reference silently ignored its injected schedule here — kept, but made
    explicit).
    """

    time_sampling: MeanFlowTimeSampling = field(
        default_factory=MeanFlowTimeSampling)
    gamma: float = 0.5
    c: float = 1e-3
    #: ablation knob: detach du/dt in the target (True = paper setting).
    use_stop_gradient: bool = True
    #: 'uniform' | 'time_dependent' | 'learned' (see ops.losses)
    loss_weighting: str = "uniform"
    #: optional LatentQAT (ops.latent_quant) — train the decoder on the
    #: quantized latents it will see at serve time (stored-format QAT)
    latent_qat: Any = None

    def loss(self, params, apply_fn, key, x):
        k_noise, k_tr = jax.random.split(key)
        noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
        t, r = self.time_sampling.sample_time_pair(k_tr, x.shape[0],
                                                   dtype=x.dtype)
        noised = (1.0 - t) * x + t * noise
        v = noise - x
        variables = {"params": params}
        latents = self._encode(variables, apply_fn, key, x)

        def u_fn(z, t_in, r_in):
            return apply_fn(variables, z, _time_pair(t_in, t_in - r_in),
                            latents)

        u, dudt = jax.jvp(u_fn, (noised, t, r),
                          (v, jnp.ones_like(t), jnp.zeros_like(r)))
        dudt_term = (jax.lax.stop_gradient(dudt) if self.use_stop_gradient
                     else dudt)
        u_target = v - jnp.clip(t - r, 0.0, 1.0) * dudt_term
        err = u - u_target
        per = adaptive_weighted_per_example(err, gamma=self.gamma, c=self.c)
        loss = apply_loss_weighting(per, t, self.loss_weighting, params)
        return loss, {"mse": mse_loss(u, u_target)}


@dataclass(frozen=True)
class ImprovedMeanFlowObjective(Objective):
    """Improved mean flow (reference loss_strategies.py:204-280): explicit
    boundary velocity, JVP along (v, 1, 0), compound prediction
    u + (t-r)·sg(du/dt) regressed on the schedule target."""

    noise_schedule: Any = field(default_factory=LinearNoiseSchedule)
    time_sampling: MeanFlowTimeSampling = field(
        default_factory=MeanFlowTimeSampling)
    use_weighted_loss: bool = True
    #: ablation knob: detach du/dt in the compound prediction.
    use_stop_gradient: bool = True
    #: 'uniform' | 'time_dependent' | 'learned' (see ops.losses)
    loss_weighting: str = "uniform"
    #: optional LatentQAT (ops.latent_quant) — train the decoder on the
    #: quantized latents it will see at serve time (stored-format QAT)
    latent_qat: Any = None

    def loss(self, params, apply_fn, key, x):
        k_noise, k_tr = jax.random.split(key)
        noise = jax.random.normal(k_noise, x.shape, dtype=x.dtype)
        t, r = self.time_sampling.sample_time_pair(k_tr, x.shape[0],
                                                   dtype=x.dtype)
        noised = self.noise_schedule.interpolate(x, noise, t)
        target = self.noise_schedule.compute_target(x, noise)
        variables = {"params": params}
        latents = self._encode(variables, apply_fn, key, x)

        def u_fn(z, t_in, r_in):
            return apply_fn(variables, z, _time_pair(t_in, t_in - r_in),
                            latents)

        v = apply_fn(variables, noised, _time_pair(t), latents)  # boundary
        # tangent dtype must match the primal (bf16 models emit bf16 v)
        u, dudt = jax.jvp(u_fn, (noised, t, r),
                          (v.astype(noised.dtype), jnp.ones_like(t),
                           jnp.zeros_like(r)))
        dudt_term = (jax.lax.stop_gradient(dudt) if self.use_stop_gradient
                     else dudt)
        v_pred = u + (t - r) * dudt_term
        per_fn = (weighted_l2_per_example if self.use_weighted_loss
                  else mse_per_example)
        loss = apply_loss_weighting(per_fn(v_pred, target), t,
                                    self.loss_weighting, params)
        return loss, {"mse": mse_loss(v_pred, target)}


# Backward-compatible aliases matching the reference class names.
FlowMatchingLoss = FlowMatchingObjective
MeanFlowLoss = MeanFlowObjective
ImprovedMeanFlowLoss = ImprovedMeanFlowObjective
LossStrategy = Objective


def create_loss_strategy(config: Any) -> Objective:
    """Build the objective from config (reference trainers/train.py:52-153).

    Resolution: explicit ``loss_strategy`` wins; else ``method``; else
    inferred from ``use_improved_mean_flow``.
    """
    name = config.loss_strategy
    if name is None:
        if config.method == "autoencoder":
            name = "autoencoder"
        elif config.method in ("mean_flow", "flow_matching",
                               "improved_mean_flow"):
            name = config.method
        else:
            name = ("improved_mean_flow" if config.use_improved_mean_flow
                    else "flow_matching")

    schedule_kwargs = {}
    if (config.noise_schedule or "linear") == "linear":
        schedule_kwargs = {
            "noise_min": config.noise_min if config.noise_min is not None else 0.001,
            "noise_max": config.noise_max if config.noise_max is not None else 0.999,
        }
    noise_schedule = create_noise_schedule(config.noise_schedule,
                                           **schedule_kwargs)

    mean = (config.time_sampling_mean
            if config.time_sampling_mean is not None else -0.4)
    std = (config.time_sampling_std
           if config.time_sampling_std is not None else 1.0)
    # flow_ratio is the legacy name for the r=t proportion (torch refs)
    proportion = config.time_sampling_data_proportion
    if proportion is None:
        proportion = (config.flow_ratio
                      if config.flow_ratio is not None else 0.5)
    full_proportion = getattr(config, "time_sampling_full_proportion",
                              None) or 0.0

    time_name = config.time_sampling or "logit_normal"
    if time_name == "uniform":
        time_sampling: Any = UniformTimeSampling()
    elif time_name == "logit_normal":
        time_sampling = LogitNormalTimeSampling(mean=mean, std=std)
    elif time_name == "mean_flow":
        time_sampling = MeanFlowTimeSampling(
            mean=mean, std=std, data_proportion=proportion,
            full_interval_proportion=full_proportion)
    else:
        raise ValueError(
            f"Unknown time_sampling: {time_name}. "
            "Must be one of: 'uniform', 'logit_normal', 'mean_flow'"
        )

    use_weighted = (config.use_weighted_loss
                    if config.use_weighted_loss is not None else True)
    mf_sampling = (time_sampling if isinstance(time_sampling,
                                               MeanFlowTimeSampling)
                   else MeanFlowTimeSampling(
                       mean=mean, std=std, data_proportion=proportion,
                       full_interval_proportion=full_proportion))

    weighting = getattr(config, "loss_weighting", None) or "uniform"

    qat = None
    qat_step = getattr(config, "qat_step_frac", None)
    qat_bits = getattr(config, "qat_bits", None)
    if qat_step is not None or qat_bits is not None:
        from meanflow_audio_codec_tpu.ops.latent_quant import LatentQAT
        qat = LatentQAT(mode=getattr(config, "qat_mode", None) or "ste",
                        step_frac=qat_step, bits=qat_bits)

    if name == "autoencoder":
        return AutoencoderObjective(use_weighted_loss=False, latent_qat=qat)
    if name == "flow_matching":
        return FlowMatchingObjective(noise_schedule=noise_schedule,
                                     time_sampling=time_sampling,
                                     use_weighted_loss=use_weighted,
                                     loss_weighting=weighting,
                                     latent_qat=qat)
    stop_grad = (config.use_stop_gradient
                 if config.use_stop_gradient is not None else True)
    if name == "mean_flow":
        return MeanFlowObjective(
            time_sampling=mf_sampling,
            gamma=config.gamma if config.gamma is not None else 0.5,
            c=config.c if config.c is not None else 1e-3,
            use_stop_gradient=stop_grad,
            loss_weighting=weighting,
            latent_qat=qat,
        )
    if name == "improved_mean_flow":
        return ImprovedMeanFlowObjective(noise_schedule=noise_schedule,
                                         time_sampling=mf_sampling,
                                         use_weighted_loss=use_weighted,
                                         use_stop_gradient=stop_grad,
                                         loss_weighting=weighting,
                                         latent_qat=qat)
    raise ValueError(
        f"Unknown loss_strategy: {name}. Must be one of: "
        "'autoencoder', 'flow_matching', 'mean_flow', 'improved_mean_flow'"
    )
