"""The training loop (reference: meanflow_audio_codec/trainers/train.py:156-507).

Orchestrates: tokenizer wiring -> workdir layout -> model/optimizer/state ->
resume -> data iterator -> ONE jit-compiled fused train step (tokenization
in-graph, state donated) -> JSONL logging + profiling (with MFU) -> periodic
sampling with REAL encoder latents -> checkpoints with retention -> summary.

Fix-by-design list vs the reference:
  * honours ``config.architecture`` via the factory (reference hard-coded
    ConditionalFlow, train.py:229);
  * the whole step is one jit with donated state (reference ran eagerly,
    training_steps.py:37-61, and tokenized per batch outside the step,
    train.py:337-341);
  * periodic sampling conditions on real encoder latents from a held-out
    batch (reference used zero dummy latents, train.py:365-370 TODO);
  * mean-flow methods sample through the dual-time interval sampler.

Token layout ("flatten mode"):
  * ``features`` — reference semantics: tokens flatten to one
    [B, n_tokens*token_dim] vector per example (images).
  * ``frames`` — TPU-native codec layout for audio+MDCT: every MDCT frame
    becomes an independent batch row [B*n_frames, token_dim] (the models are
    frame-local; frame independence is what makes 1-NFE decode and batch
    sharding subsume sequence scaling — SURVEY.md §5.7).
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from meanflow_audio_codec_tpu.configs import TrainFlowConfig
from meanflow_audio_codec_tpu.data.audio import (
    build_audio_pipeline,
    prefetch_batches,
    replay_pool_batches,
    synthetic_pipeline_for_family,
    write_wav,
)
from meanflow_audio_codec_tpu.data.mnist import load_mnist
from meanflow_audio_codec_tpu.models import TrainState, create_flow_model
from meanflow_audio_codec_tpu.ops.losses import ema
from meanflow_audio_codec_tpu.ops.sampling import sample, sample_dual_time
from meanflow_audio_codec_tpu.ops.tokenize import (
    compute_token_shape,
    create_tokenization_strategy,
)
from meanflow_audio_codec_tpu.training.checkpoints import (
    cleanup_old_checkpoints,
    count_params,
    load_checkpoint_and_resume,
    save_checkpoint_with_metadata,
)
from meanflow_audio_codec_tpu.training.logging import (
    LogWriter,
    collect_experiment_metadata,
    generate_config_diff,
    generate_training_summary,
    plot_loss_curve,
    plot_samples,
    save_json,
)
from meanflow_audio_codec_tpu.training.objectives import create_loss_strategy
from meanflow_audio_codec_tpu.training.profiling import (
    ProfilingTrainer,
    estimate_step_flops,
)
from meanflow_audio_codec_tpu.training.train_step import make_train_step


# ============================================================================
# Wiring helpers
# ============================================================================


def resolve_flatten_mode(config: TrainFlowConfig) -> str:
    """'frames' for audio+mdct (per-frame codec layout) unless overridden."""
    tok_cfg = config.tokenization_config or {}
    if "flatten" in tok_cfg:
        return tok_cfg["flatten"]
    if (config.dataset == "audio"
            and (config.tokenization_strategy or "mdct") == "mdct"):
        return "frames"
    return "features"


def input_example_shape(config: TrainFlowConfig) -> tuple[int, ...]:
    """Per-example raw data shape fed to the tokenizer."""
    if config.dataset == "audio":
        tok_cfg = config.tokenization_config or {}
        frame_size = tok_cfg.get("frame_size", 65536)
        channels = tok_cfg.get("channels", 2)
        return (frame_size, channels)
    return (784,)  # flat MNIST (reference convention)


def effective_noise_dimension(config: TrainFlowConfig) -> int:
    """Model input width after tokenization + flattening."""
    strategy = create_tokenization_strategy(config.tokenization_strategy,
                                            config.tokenization_config)
    n_tokens, token_dim = compute_token_shape(strategy,
                                              input_example_shape(config))
    if resolve_flatten_mode(config) == "frames":
        return token_dim
    return n_tokens * token_dim


def make_dataset_iterator(config: TrainFlowConfig) -> Iterator[np.ndarray]:
    """Infinite batch iterator of raw (untokenized) data."""
    if config.dataset == "audio":
        tok_cfg = config.tokenization_config or {}
        frame_size = tok_cfg.get("frame_size", 65536)
        if config.data_dir and Path(config.data_dir).exists():
            return build_audio_pipeline(
                config.data_dir, seed=config.seed, frame_size=frame_size,
                batch_size=config.batch_size,
                resample=bool(getattr(config, "resample_audio", False)))
        print("No audio data_dir found; using synthetic audio source")
        source = synthetic_pipeline_for_family(
            tok_cfg.get("synthetic_family"), seed=config.seed,
            frame_size=frame_size, batch_size=config.batch_size)
        # synthesis runs ~100x realtime on this host's single CPU while a
        # high-MFU train step consumes ~700x — decouple via a replay pool
        # whose slots a daemon thread keeps refreshing (data/audio.py)
        pool = tok_cfg.get("pool_batches", 0)
        if pool:
            return replay_pool_batches(source, pool_batches=pool,
                                       seed=config.seed)
        return prefetch_batches(source)
    train_iter, _ = load_mnist(config.batch_size, seed=config.seed)
    return train_iter


class TokenAdapter:
    """Tokenize + flatten wrapper used inside the jitted step and for
    round-tripping samples back to data space.

    ``scale`` divides tokens on the way in (and multiplies on the way out)
    so the flow sees roughly unit-variance data — MDCT coefficients of
    full-scale audio have std ~4 with sparse peaks near 100x that, which
    mis-conditions a unit-noise flow. Set via
    ``tokenization_config["coeff_scale"]`` (default 1.0 = reference parity).

    ``gain_norm`` > 0 enables gain/shape coding (the round-5 fix for the
    mixed-family stall): every flow example is normalised to unit RMS and
    the gain ``g = sqrt(mean(tok^2) + gain_norm^2)`` becomes codec side
    info (AudioCodec packs it as 8-bit log-gain, ~0.4% of the bitrate).
    Without it, per-example energy spans ~3 orders of magnitude across the
    synthetic families and the adaptive loss weight ``1/sqrt(d2+c)``
    (ops/losses.py:62) lets low-energy frames starve the learnable ones —
    the mixed-family ch256 frontier run sat at grad_norm ~0.003 (60-300x
    below tonal) and never converged (outputs/imf_frontier_ch256). The
    epsilon floor keeps true silence from being blown up to unit noise.
    """

    def __init__(self, strategy, mode: str, scale: float = 1.0,
                 gain_norm: float = 0.0):
        self.strategy = strategy
        self.mode = mode
        self.scale = float(scale)
        self.gain_norm = float(gain_norm)
        self._token_shape: tuple[int, int] | None = None

    def _gains(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """Per-example RMS gain of [B, nf, D] scaled tokens.

        frames mode: one gain per MDCT frame [B, nf, 1] (each frame is a
        flow example); flat mode: one gain per clip [B, 1, 1].
        """
        axes = (-1,) if self.mode == "frames" else (-2, -1)
        ms = jnp.mean(tokens * tokens, axis=axes, keepdims=True)
        return jnp.sqrt(ms + self.gain_norm * self.gain_norm)

    def _flatten(self, tokens: jnp.ndarray) -> jnp.ndarray:
        self._token_shape = (int(tokens.shape[1]), int(tokens.shape[2]))
        if self.mode == "frames":
            return tokens.reshape(-1, tokens.shape[-1])
        return tokens.reshape(tokens.shape[0], -1)

    def tokenize(self, x: jnp.ndarray) -> jnp.ndarray:
        tokens = self.strategy.tokenize(x)
        if self.scale != 1.0:
            tokens = tokens / self.scale
        if self.gain_norm:
            tokens = tokens / self._gains(tokens)
        return self._flatten(tokens)

    def tokenize_with_gain(self, x: jnp.ndarray
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Like :meth:`tokenize` but also returns the per-example gains
        ([B, nf, 1] in frames mode) the decoder needs to undo the
        normalisation. With ``gain_norm`` off the gains are all-ones."""
        tokens = self.strategy.tokenize(x)
        if self.scale != 1.0:
            tokens = tokens / self.scale
        if self.gain_norm:
            gains = self._gains(tokens)
            tokens = tokens / gains
        else:
            gains = jnp.ones(tokens.shape[:2] + (1,), tokens.dtype)
        return self._flatten(tokens), gains

    def detokenize_flat(self, flat: jnp.ndarray,
                        token_shape: tuple[int, int],
                        gains: jnp.ndarray | None = None) -> jnp.ndarray:
        n_tokens, token_dim = token_shape
        if self.mode == "frames":
            tokens = flat.reshape(-1, n_tokens, token_dim)
        else:
            tokens = flat.reshape(flat.shape[0], n_tokens, token_dim)
        if gains is not None:
            tokens = tokens * gains
        if self.scale != 1.0:
            tokens = tokens * self.scale
        return self.strategy.detokenize(tokens)

    @property
    def token_shape(self) -> tuple[int, int] | None:
        return self._token_shape


def adapter_from_config(config, strategy, mode: str | None = None
                        ) -> TokenAdapter:
    """The one place the token-scaling knobs are read: training, codec and
    evaluator must agree on ``coeff_scale``/``gain_norm`` or the encoder
    sees out-of-distribution inputs and the decode is mis-gained."""
    tok_cfg = config.tokenization_config or {}
    return TokenAdapter(strategy,
                        resolve_flatten_mode(config) if mode is None
                        else mode,
                        scale=tok_cfg.get("coeff_scale", 1.0),
                        gain_norm=tok_cfg.get("gain_norm", 0.0))


# ============================================================================
# Main entry
# ============================================================================


def make_lr_schedule(config: TrainFlowConfig):
    """The learning-rate schedule make_optimizer uses: a float (constant)
    or an optax schedule callable. Exposed so logging can report the
    *actual* per-step LR instead of the base value."""
    lr = config.base_lr
    warmup = getattr(config.base, "warmup_steps", 0) or 0
    if getattr(config.base, "lr_schedule", "constant") == "cosine":
        decay_steps = max(config.n_steps - warmup, 1)
        final = config.base_lr * getattr(config.base, "lr_final_fraction", 0.0)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=config.base_lr,
            warmup_steps=warmup, decay_steps=warmup + decay_steps,
            end_value=final)
    elif warmup:
        lr = optax.linear_schedule(init_value=0.0, end_value=config.base_lr,
                                   transition_steps=warmup)
    return lr


def lr_at_step(config: TrainFlowConfig, step: int) -> float:
    """Evaluate the schedule at a step for logging. Pure host math (no
    jnp): evaluating an optax schedule eagerly would round-trip the axon
    tunnel once per logged step. Mirrors make_lr_schedule exactly."""
    base = float(config.base_lr)
    warmup = getattr(config.base, "warmup_steps", 0) or 0
    if getattr(config.base, "lr_schedule", "constant") == "cosine":
        final = base * getattr(config.base, "lr_final_fraction", 0.0)
        decay = max(config.n_steps - warmup, 1)
        if warmup and step < warmup:
            return base * step / warmup
        frac = min(max((step - warmup) / decay, 0.0), 1.0)
        return final + 0.5 * (base - final) * (1.0 + math.cos(math.pi * frac))
    if warmup and step < warmup:
        return base * step / warmup
    return base


def make_optimizer(config: TrainFlowConfig):
    """AdamW with optional global-norm clipping and linear warmup.

    Checkpoint templates (load_flow_state) must build the identical chain —
    the optax state tree structure is part of the on-disk format.
    """
    opt = optax.adamw(make_lr_schedule(config),
                      weight_decay=config.weight_decay)
    clip = getattr(config.base, "grad_clip_norm", None)
    if clip:
        return optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt


def train_flow(config: TrainFlowConfig, resume: bool = False) -> dict:
    """Train a flow model per config; returns the run summary dict."""
    workdir = Path(config.workdir)
    samples_dir = workdir / "samples"
    checkpoints_dir = workdir / "checkpoints"
    logs_dir = workdir / "logs"
    for d in (samples_dir, checkpoints_dir, logs_dir):
        d.mkdir(parents=True, exist_ok=True)

    # ---- tokenizer + effective model width ---------------------------------
    strategy = create_tokenization_strategy(config.tokenization_strategy,
                                            config.tokenization_config)
    mode = resolve_flatten_mode(config)
    adapter = adapter_from_config(config, strategy, mode)
    example_shape = input_example_shape(config)
    n_tokens, token_dim = compute_token_shape(strategy, example_shape)
    noise_dim = token_dim if mode == "frames" else n_tokens * token_dim
    if noise_dim != config.noise_dimension:
        print(f"Overriding noise_dimension {config.noise_dimension} -> "
              f"{noise_dim} (tokenized width, mode={mode})")
        config.model.noise_dimension = noise_dim

    # ---- run metadata / config persistence ---------------------------------
    save_json(collect_experiment_metadata(config), workdir / "metadata.json")
    config_path = workdir / "config.json"
    if resume and config_path.exists():
        from meanflow_audio_codec_tpu.configs import load_config_from_json
        try:
            old = load_config_from_json(config_path)
            generate_config_diff(old, config, workdir / "config_diff.json")
        except Exception as exc:
            print(f"Could not diff previous config: {exc}")
    save_json(config.to_dict(), config_path)

    # ---- model / optimizer / state -----------------------------------------
    if (getattr(config.model, "architecture_options", None)
            or {}).get("quantized"):
        raise ValueError(
            "architecture_options.quantized is a serving-only knob: the int8 "
            "rounding has zero gradient a.e. and would silence the mean-flow "
            "JVP. Train in bf16 and pass quantized=True at load/eval time "
            "(tools.evaluate_all --quantized, AudioCodec(quantized=True)).")
    model = create_flow_model(config)
    tx = make_optimizer(config)
    rng = jax.random.PRNGKey(config.seed)
    rng, init_key = jax.random.split(rng)
    dummy_x = jnp.zeros((2, noise_dim), dtype=jnp.float32)
    dummy_t = jnp.zeros((2, 2), dtype=jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, dummy_x, dummy_t, method="init_all")
    )(init_key)
    if (config.loss_weighting or "uniform") == "learned":
        # learned time-weighting trains a small log-variance polynomial
        # jointly with the model (ops.losses.learned_weight_terms)
        from meanflow_audio_codec_tpu.ops.losses import (
            LEARNED_WEIGHT_KEY,
            init_learned_weight_params,
        )
        variables = dict(variables)
        variables["params"] = dict(variables["params"])
        variables["params"][LEARNED_WEIGHT_KEY] = init_learned_weight_params()
    ema_decay = config.training.ema_decay
    # EMA starts as a *copy* of params (sharing buffers would double-donate)
    ema_init = (jax.tree_util.tree_map(jnp.array, variables["params"])
                if ema_decay else None)
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        ema_params=ema_init, ema_decay=ema_decay if ema_decay else 0.999)
    param_count = count_params(state.params)

    start_step = 0
    if resume:
        restored = load_checkpoint_and_resume(checkpoints_dir, state)
        if restored is not None:
            state, start_step = restored
            print(f"Resumed from step {start_step}")
        else:
            print("No valid checkpoint found; starting from scratch")

    # ---- multi-device sharding (DP over 'data', TP over 'model') -----------
    data_sharding = None
    devices = jax.devices()
    if len(devices) > 1:
        from meanflow_audio_codec_tpu.parallel import (
            batch_sharding,
            mesh_from_config,
            shard_state,
        )
        mesh = mesh_from_config(config)
        data_size = mesh.shape["data"]
        if config.batch_size % data_size == 0:
            state = shard_state(state, mesh)
            data_sharding = batch_sharding(mesh)
            print(f"Sharding over mesh {dict(mesh.shape)}: batch "
                  f"{config.batch_size} -> {config.batch_size // data_size} "
                  f"per device")
        else:
            print(f"batch_size {config.batch_size} not divisible by mesh "
                  f"data axis {data_size}; running single-device")

    # ---- data / objective / fused step -------------------------------------
    data_iter = make_dataset_iterator(config)
    # Device-resident replay pool (audio): the axon tunnel moves batches at
    # ~30 MB/s while a step consumes ~4 MB — without the pool, training is
    # transfer-bound ~5x (data/device_pool.py). Sharded runs use the
    # mesh-aware variant (per-device sub-pools, shard_map-local replay).
    device_pool = None
    if config.dataset == "audio":
        # Default ON only for the synthetic source (where the transfer-bound
        # measurement motivating the pool applies and draws are i.i.d.
        # anyway). Real data_dir corpora must opt in explicitly: the pool
        # turns batches into with-replacement draws from a sliding window of
        # int16-quantized clips — a distribution/precision change that should
        # never happen silently to an existing config.
        synthetic = not (config.data_dir and Path(config.data_dir).exists())
        pool_clips = (config.tokenization_config or {}).get(
            "device_pool_clips", 1024 if synthetic else 0)
        if pool_clips and data_sharding is None:
            from meanflow_audio_codec_tpu.data.device_pool import (
                DeviceReplayPool,
            )
            device_pool = DeviceReplayPool(data_iter, pool_clips=pool_clips,
                                           seed=config.seed)
            print(f"Device replay pool: {device_pool.pool_size} clips "
                  f"resident in HBM, async int16 refresh")
        elif pool_clips:
            from meanflow_audio_codec_tpu.data.device_pool import (
                MeshDeviceReplayPool,
            )
            device_pool = MeshDeviceReplayPool(
                data_iter, data_sharding.mesh, pool_clips=pool_clips,
                seed=config.seed)
            print(f"Mesh device replay pool: {device_pool.pool_size} clips "
                  f"({device_pool.local_size}/device over "
                  f"{device_pool.data_size} data shards), async int16 "
                  f"refresh")
    objective = create_loss_strategy(config)
    steps_per_call = max(1, config.tpu.steps_per_call)
    if steps_per_call > 1:
        from meanflow_audio_codec_tpu.training.train_step import (
            make_multi_step,
        )
        step_fn = make_multi_step(objective, steps_per_call,
                                  tokenizer=adapter, flatten=True,
                                  donate=True, remat=config.tpu.remat,
                                  skip_nonfinite=config.tpu.skip_nonfinite_updates)
    else:
        step_fn = make_train_step(objective, tokenizer=adapter, flatten=True,
                                  donate=True, remat=config.tpu.remat,
                                  skip_nonfinite=config.tpu.skip_nonfinite_updates)

    def to_device(batch, stacked: bool = False):
        arr = jnp.asarray(batch)
        if data_sharding is None:
            return arr
        if stacked:  # [K, B, ...]: batch axis is dim 1
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.device_put(
                arr, NamedSharding(data_sharding.mesh, P(None, "data")))
        return jax.device_put(arr, data_sharding)

    log = LogWriter(logs_dir / "train_log.jsonl")
    first_batch = (device_pool.sample(1, config.batch_size)[0]
                   if device_pool else to_device(next(data_iter)))
    # FLOPs from a single-step probe program (works for both step modes)
    probe_fn = make_train_step(objective, tokenizer=adapter, flatten=True,
                               donate=False, remat=config.tpu.remat)
    flops = estimate_step_flops(probe_fn, state, rng, first_batch)
    profiler = ProfilingTrainer(
        log_writer=log,
        flops_per_step=flops * steps_per_call if flops else None)
    profiler.start_training(param_count=param_count)
    print(f"Training {config.architecture or 'mlp'} / "
          f"{config.method or 'flow_matching'} on {config.dataset}: "
          f"{param_count:,} params, noise_dim {noise_dim}, "
          f"{config.n_steps} steps")

    # fixed held-out batch for periodic sampling with real latents
    eval_batch = first_batch
    token_shape = (n_tokens, token_dim)

    loss_ema = None
    skipped_updates = 0  # count of guard-rejected (non-finite) updates
    batch = first_batch
    is_mean_flow = (config.method in ("mean_flow", "improved_mean_flow")
                    or config.use_improved_mean_flow)

    def run_sampling(state, step: int) -> None:
        if (config.method or "") == "autoencoder":
            return
        key = jax.random.PRNGKey(config.sample_seed)
        # samplers prefer the EMA weights when tracked
        params = (state.ema_params if state.ema_params is not None
                  else state.params)
        x_tokens, gains = adapter.tokenize_with_gain(jnp.asarray(eval_batch))
        latents = state.apply_fn({"params": params}, x_tokens,
                                 method="encode")
        sampler = sample_dual_time if is_mean_flow else sample
        guidance = config.training.sample_guidance_scale or 1.0
        flat = sampler(state.apply_fn, noise_dim, params, key, latents,
                       n_steps=config.sample_steps, guidance_scale=guidance)
        decoded = adapter.detokenize_flat(
            flat, token_shape, gains=gains if adapter.gain_norm else None)
        decoded_np = np.asarray(jax.device_get(decoded), dtype=np.float32)
        if config.dataset == "audio":
            write_wav(samples_dir / f"step_{step:05d}.wav",
                      decoded_np[0], sample_rate=44100)
        else:
            plot_samples(decoded_np[:16],
                         samples_dir / f"step_{step:05d}.png")

    # ---- hot loop -----------------------------------------------------------
    chunk_fns = {steps_per_call: step_fn}

    def chunk_fn(k: int):
        if k not in chunk_fns:
            from meanflow_audio_codec_tpu.training.train_step import (
                make_multi_step,
            )
            # always the scan form: the chunked path feeds [k, B, ...] even
            # for a final partial chunk of k == 1
            chunk_fns[k] = make_multi_step(
                objective, k, tokenizer=adapter, flatten=True,
                donate=True, remat=config.tpu.remat,
                skip_nonfinite=config.tpu.skip_nonfinite_updates)
        return chunk_fns[k]

    step = start_step
    first_chunk = True
    while step < config.n_steps:
        k = min(steps_per_call, config.n_steps - step)
        profiler.before_step()
        rng, step_key = jax.random.split(rng)
        if steps_per_call == 1:
            state, metrics = step_fn(state, step_key, batch)
            series = {name: [value] for name, value in metrics.items()}
            if device_pool:
                device_pool.refresh()
                batch = device_pool.sample(1, config.batch_size)[0]
            else:
                batch = to_device(next(data_iter))  # prefetch next
        elif device_pool:
            stacked = device_pool.sample(k, config.batch_size)
            state, series = chunk_fn(k)(state, step_key, stacked)
            device_pool.refresh()  # async slot overwrite overlaps the chunk
            series = {name: np.asarray(value)
                      for name, value in series.items()}
        else:
            raws = ([np.asarray(jax.device_get(batch))] if first_chunk else [])
            while len(raws) < k:
                raws.append(np.asarray(next(data_iter)))
            stacked = to_device(np.stack(raws), stacked=True)
            state, series = chunk_fn(k)(state, step_key, stacked)
            series = {name: np.asarray(value)
                      for name, value in series.items()}
        first_chunk = False
        # NB: the adaptive weighted-L2 loss is ~1 by construction (w ~
        # 1/||d||^2); 'mse' is the informative convergence signal.
        record = profiler.after_step(step)
        per_step_time = record["step_time"] / k
        for i in range(k):
            loss = float(series["loss"][i])
            mse = float(series["mse"][i]) if "mse" in series else None
            grad_norm = (float(series["grad_norm"][i])
                         if "grad_norm" in series else None)
            update_ok = (bool(series["update_ok"][i])
                         if "update_ok" in series else None)
            if update_ok is False:
                skipped_updates += 1
            if np.isfinite(loss):  # a skipped NaN step must not poison the EMA
                loss_ema = ema(loss_ema, loss)
            log.write_step(step + i, loss=loss, loss_avg=loss_ema, mse=mse,
                           lr=lr_at_step(config, step + i),
                           grad_norm=grad_norm, update_ok=update_ok,
                           step_time=per_step_time,
                           **{name: value for name, value in record.items()
                              if name not in ("step_time",)})
            if (step + i) % 50 == 0 or update_ok is False:
                mfu = record.get("mfu")
                mfu_str = f" mfu={mfu:.1%}" if mfu else ""
                if skipped_updates:
                    mfu_str += f" SKIPPED={skipped_updates}"
                mse_str = f" mse={mse:.5f}" if mse is not None else ""
                # loss_ema is None until the first FINITE loss (the
                # non-finite guard above skips the EMA update)
                avg_str = (f"avg={loss_ema:.5f}" if loss_ema is not None
                           else "avg=n/a")
                print(f"step {step + i}: loss={loss:.5f} "
                      f"{avg_str}{mse_str} "
                      f"t={per_step_time*1e3:.1f}ms{mfu_str}")
        prev_step, step = step, step + k

        def crossed(every: int | None) -> bool:
            return bool(every) and (step // every) > (prev_step // every)

        if crossed(config.sample_every):
            run_sampling(state, step)
        if crossed(config.checkpoint_step or config.sample_every):
            save_checkpoint_with_metadata(
                state, checkpoints_dir, step=step, config=config,
                fmt=config.training.checkpoint_format)
            cleanup_old_checkpoints(checkpoints_dir,
                                    config.max_checkpoints_to_keep,
                                    final_step=config.n_steps)

    # ---- finalisation -------------------------------------------------------
    run_sampling(state, config.n_steps)
    save_checkpoint_with_metadata(state, checkpoints_dir,
                                  step=config.n_steps, config=config,
                                  fmt=config.training.checkpoint_format)
    cleanup_old_checkpoints(checkpoints_dir, config.max_checkpoints_to_keep,
                            final_step=config.n_steps)
    from meanflow_audio_codec_tpu.training.checkpoints import (
        save_serving_checkpoint,
    )
    save_serving_checkpoint(state, checkpoints_dir, step=config.n_steps)
    perf = profiler.end_training(config.n_steps - start_step)
    summary = generate_training_summary(
        log.path, total_time=perf["total_time_sec"],
        total_steps=config.n_steps - start_step, param_count=param_count)
    summary.update({k: v for k, v in perf.items() if k not in summary})
    if device_pool is not None:
        # non-blocking refresh observability: how often the (disk) decoder
        # fell behind the step loop and a slot turnover was skipped
        summary["pool_skipped_refreshes"] = device_pool.skipped_refreshes
    save_json(summary, workdir / "summary.json")
    plot_loss_curve(log.path, samples_dir / "loss_curve.png")
    log.close()
    steps_per_sec = summary.get("steps_per_sec")
    if steps_per_sec:
        print(f"Done: {steps_per_sec:.2f} steps/s over "
              f"{config.n_steps - start_step} steps")
    return summary


def load_flow_state(checkpoint_path: Path | str, config: TrainFlowConfig):
    """Rebuild model + state template and load a checkpoint for evaluation
    (reference trainers/utils.py:439-470)."""
    from meanflow_audio_codec_tpu.training.checkpoints import (
        load_checkpoint,
        load_checkpoint_orbax,
    )

    noise_dim = effective_noise_dimension(config)
    if noise_dim != config.noise_dimension:
        config.model.noise_dimension = noise_dim
    model = create_flow_model(config)
    tx = make_optimizer(config)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, noise_dim)), jnp.zeros((2, 2)),
                           method="init_all")
    if (config.loss_weighting or "uniform") == "learned":
        # match the training-time param tree (learned weighting slot)
        from meanflow_audio_codec_tpu.ops.losses import (
            LEARNED_WEIGHT_KEY,
            init_learned_weight_params,
        )
        variables = dict(variables)
        variables["params"] = dict(variables["params"])
        variables["params"][LEARNED_WEIGHT_KEY] = init_learned_weight_params()
    is_orbax = Path(checkpoint_path).is_dir()
    loader = load_checkpoint_orbax if is_orbax else load_checkpoint

    def template(with_ema: bool):
        ema = (jax.tree_util.tree_map(jnp.array, variables["params"])
               if with_ema else None)
        return TrainState.create(apply_fn=model.apply,
                                 params=variables["params"], tx=tx,
                                 ema_params=ema)

    from meanflow_audio_codec_tpu.training.checkpoints import (
        is_serving_checkpoint,
        load_serving_checkpoint,
    )
    if not is_orbax and is_serving_checkpoint(checkpoint_path):
        # git-committable disaster-recovery artifact: the sampling-quality
        # param set only. Serve it through both slots (codec.params prefers
        # EMA); optimizer state stays freshly initialised — serving files
        # are for inference/eval, resume needs a full checkpoint.
        step, params = load_serving_checkpoint(checkpoint_path,
                                               variables["params"])
        state = template(with_ema=True)
        return state.replace(step=step, params=params,
                             ema_params=params), model

    # runs trained with --ema-decay store an EMA copy (evaluators sample
    # from it); pick the matching template by INSPECTING the checkpoint —
    # exception-driven fallback would mask real corruption errors
    if not is_orbax:
        import flax.serialization
        payload = flax.serialization.msgpack_restore(
            Path(checkpoint_path).read_bytes())
        return loader(checkpoint_path,
                      template(payload.get("ema_params") is not None)), model
    from meanflow_audio_codec_tpu.training.checkpoints import (
        orbax_checkpoint_has_ema,
    )
    return loader(checkpoint_path,
                  template(orbax_checkpoint_has_ema(checkpoint_path))), model
