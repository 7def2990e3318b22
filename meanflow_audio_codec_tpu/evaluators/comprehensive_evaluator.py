"""ComprehensiveEvaluator: checkpoint -> NFE sweep -> quality + speed report.

Re-design of the reference evaluator (meanflow_audio_codec/evaluators/
comprehensive_evaluator.py:26-264): load a trained state, sweep the NFE
list, generate samples (conditioned on REAL encoder latents from the given
data — the reference used zero dummy latents), time inference, and compute
domain metrics (MNIST: MSE/PSNR/SSIM; audio: spectral distance/SI-SNR/STOI,
PESQ when installed).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from meanflow_audio_codec_tpu.configs import TrainFlowConfig
from meanflow_audio_codec_tpu.evaluators import audio_metrics as am
from meanflow_audio_codec_tpu.evaluators import metrics as im
from meanflow_audio_codec_tpu.evaluators.performance import (
    count_parameters,
    inference_time,
    memory_usage,
)
from meanflow_audio_codec_tpu.ops.sampling import sample, sample_dual_time
from meanflow_audio_codec_tpu.training.profiling import force_completion
from meanflow_audio_codec_tpu.ops.tokenize import (
    compute_token_shape,
    create_tokenization_strategy,
)
from meanflow_audio_codec_tpu.training.trainer import (
    TokenAdapter,
    adapter_from_config,
    input_example_shape,
    load_flow_state,
    resolve_flatten_mode,
)

DEFAULT_NFE_SWEEP = [1, 10, 50, 250]


class ComprehensiveEvaluator:
    """Evaluate one trained checkpoint across an NFE sweep."""

    def __init__(self, checkpoint_path: Path | str, config: TrainFlowConfig,
                 nfe_list: list[int] | None = None, num_samples: int = 64,
                 batch_size: int = 32, seed: int = 0,
                 latent_bits: int | None = None,
                 latent_step: float | None = None,
                 timing_runs: int = 5):
        self.config = config
        self.nfe_list = nfe_list or list(DEFAULT_NFE_SWEEP)
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.seed = seed
        #: Repetitions for the inference-latency benchmark. 0 skips the
        #: timing loop entirely (metrics still come from the one decode) —
        #: the mode for metric recomputes on slow backends, where 5 timed
        #: decodes per NFE would dominate wall-clock for numbers nobody
        #: cites (quality tables cite metrics; RTF comes from
        #: tools/benchmarks/benchmark_codec_geometry on the TPU).
        self.timing_runs = timing_runs
        #: When set, decode from the quantized stored format
        #: (ops/latent_quant.py) instead of float latents — measures the
        #: bitstream's quality cost at a real kbps. ``latent_step`` selects
        #: the rate-aware ECSQ format (MACB v2) at that step fraction and
        #: takes precedence over the fixed-width ``latent_bits``.
        self.latent_bits = latent_bits
        self.latent_step = latent_step
        self.state, self.model = load_flow_state(checkpoint_path, config)
        self.noise_dim = config.noise_dimension
        strategy = create_tokenization_strategy(config.tokenization_strategy,
                                                config.tokenization_config)
        self.adapter = adapter_from_config(config, strategy)
        self.token_shape = compute_token_shape(
            strategy, input_example_shape(config))
        self.param_info = count_parameters(self.state.params)
        self._is_mean_flow = (
            config.method in ("mean_flow", "improved_mean_flow")
            or config.use_improved_mean_flow)

    # ---- generation ----------------------------------------------------------
    @property
    def eval_params(self):
        """EMA params when the run tracked them, else the live params."""
        ema = getattr(self.state, "ema_params", None)
        return ema if ema is not None else self.state.params

    def _sample_flat(self, latents, nfe: int, key) -> jnp.ndarray:
        sampler = sample_dual_time if self._is_mean_flow else sample
        return sampler(self.state.apply_fn, self.noise_dim, self.eval_params,
                       key, latents, n_steps=nfe)

    def evaluate(self, real_data: np.ndarray) -> dict:
        """real_data: raw (untokenized) examples, [N, ...]."""
        results: dict[str, Any] = {
            "param_count": self.param_info["total"],
            "nfe_sweep": {},
            "memory_before": memory_usage(),
        }
        data = np.asarray(real_data[:self.num_samples])
        # one jitted program for tokenize+encode — eager per-op dispatch is
        # pathologically slow on remote-dispatch backends (CLAUDE.md)
        def _encode(p, raw):
            flat, gains = self.adapter.tokenize_with_gain(raw)
            return self.state.apply_fn({"params": p}, flat,
                                       method="encode"), gains
        encode = jax.jit(_encode)
        latents, gains = encode(self.eval_params, jnp.asarray(data))
        # gain/shape runs restore per-frame energy after decode; plain
        # runs pass gains=None so the program is unchanged
        gains = gains if self.adapter.gain_norm else None
        force_completion(latents)
        if self.latent_bits or self.latent_step:
            import dataclasses

            from meanflow_audio_codec_tpu.ops.latent_quant import (
                dequantize_gains,
                dequantize_latents,
                pack_bitstream,
                quantize_gains,
                quantize_latents,
                quantize_latents_ecsq,
            )
            if self.latent_step:
                bitstream = quantize_latents_ecsq(latents,
                                                  step_frac=self.latent_step)
                results["latent_step"] = self.latent_step
            else:
                bitstream = quantize_latents(latents, bits=self.latent_bits)
                results["latent_bits"] = self.latent_bits
            if gains is not None:
                # stored-format eval decodes with the gains a byte reader
                # sees: through the 8-bit log grid, counted in the kbps
                gains = jnp.asarray(dequantize_gains(quantize_gains(
                    jax.device_get(gains))))
                bitstream = dataclasses.replace(
                    bitstream, gains=jnp.reshape(
                        gains, (bitstream.codes.shape[0], -1, 1)
                        if bitstream.codes.ndim == 3 else (1, -1, 1)))
            latents = dequantize_latents(bitstream)
            if self.config.dataset == "audio":
                # real stored rate: rANS-coded bytes over the audio duration
                # (44.1 kHz convention, data is [N, frame_size, channels])
                packed = pack_bitstream(bitstream)
                duration_s = data.shape[0] * data.shape[1] / 44100.0
                results["bitstream_kbps_measured"] = (
                    len(packed) * 8 / duration_s / 1000.0)
        key = jax.random.PRNGKey(self.seed)

        for nfe in self.nfe_list:
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            flat = self._sample_flat(latents, nfe, sub)
            # block_until_ready returns early on the axon backend; force a
            # host read (profiling.force_completion doctrine).
            force_completion(flat)
            first_latency = time.perf_counter() - t0
            if self.timing_runs > 0:
                timing = inference_time(self._sample_flat, latents, nfe, sub,
                                        warmup=1, runs=self.timing_runs)
            else:
                # metrics-only mode: the warm latency is unknown; report
                # the (compile-inclusive) first call so the field is honest
                timing = {"mean_sec": first_latency, "runs": 0,
                          "note": "timing skipped (timing_runs=0); "
                                  "mean_sec is the first, compile-"
                                  "inclusive call"}
            decoded = self.adapter.detokenize_flat(flat, self.token_shape,
                                                   gains=gains)
            decoded_np = np.asarray(jax.device_get(decoded), dtype=np.float32)
            entry = {
                "nfe": nfe,
                "first_call_sec": first_latency,
                "inference": timing,
                **self._quality(data, decoded_np),
            }
            results["nfe_sweep"][str(nfe)] = entry
            print(f"  nfe={nfe}: mse={entry.get('mse', float('nan')):.5f} "
                  f"({timing['mean_sec'] * 1e3:.1f} ms/call)", flush=True)
        results["memory_after"] = memory_usage()
        return results

    # ---- metrics -------------------------------------------------------------
    def _quality(self, real: np.ndarray, generated: np.ndarray) -> dict:
        n = min(len(real), len(generated))
        real, generated = real[:n], generated[:n]
        out: dict[str, float] = {}
        if self.config.dataset == "audio":
            ref = real.reshape(n, -1)
            gen = generated.reshape(n, -1)
            m = min(ref.shape[1], gen.shape[1])
            out["mse"] = float(np.mean((ref[:, :m] - gen[:, :m]) ** 2))
            out["spectral_distance"] = float(np.mean([
                am.spectral_distance(r[:m], g[:m])
                for r, g in zip(ref, gen)]))
            out["si_snr_db"] = float(np.mean([
                am.si_snr(r[:m], g[:m]) for r, g in zip(ref, gen)]))
            try:
                out["stoi"] = float(np.mean([
                    am.stoi(r[:m], g[:m]) for r, g in zip(ref, gen)]))
                out["estoi"] = float(np.mean([
                    am.stoi(r[:m], g[:m], extended=True)
                    for r, g in zip(ref, gen)]))
                out["intelligibility_pct"] = am.stoi_to_intelligibility(
                    out["stoi"])
            except (ValueError, ImportError):
                pass
            try:
                out["nsim"] = float(np.mean([
                    am.nsim(r[:m], g[:m]) for r, g in zip(ref, gen)]))
            except ValueError:
                pass
            try:
                # PESQ-axis perceptual distortion, oracle-anchored in-image
                # (tests/bsd_oracle.py); lower is better, identity 0
                out["bsd"] = float(np.mean([
                    am.bsd(r[:m], g[:m]) for r, g in zip(ref, gen)]))
            except ValueError:
                pass
            try:
                out["pesq"] = float(np.mean([
                    am.pesq_score(r[:m], g[:m]) for r, g in zip(ref, gen)]))
            except ImportError:
                pass
        else:
            real_img = real.reshape(n, 28, 28)
            gen_img = generated.reshape(n, -1)[:, :784].reshape(n, 28, 28)
            out["mse"] = float(np.mean((real_img - gen_img) ** 2))
            out["psnr_db"] = im.batch_psnr(real_img, gen_img)
            out["ssim"] = im.batch_ssim(real_img, gen_img)
            if n >= 4:
                out["fid_pixel"] = im.frechet_distance(
                    real_img.reshape(n, -1), gen_img.reshape(n, -1))
                try:
                    out["kid_pixel"] = im.kernel_inception_distance(
                        real_img.reshape(n, -1), gen_img.reshape(n, -1),
                        num_subsets=5, subset_size=min(50, n))
                except ValueError:
                    pass
        return out

    def save_results(self, results: dict, path: Path | str) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(results, indent=2, default=str))
