"""iMF ConvNet train-step MFU sweep over stage geometries.

The round-1 flagship (ch=64, 33x33 grid, dense lift) measured 26.6% MFU:
the 3x3 conv at N=64 is half a lane tile, the 33-wide grid misaligns every
elementwise pass, and the dense lift is parameter-quadratic (1.2B at
ch=128). This sweep times candidate geometries — lane-aligned channels,
power-of-two grids, factorised lifts — and reports steps/s + MFU per row so
the flagship bench config is chosen from measurement, not guesswork.

Emits one JSON row per config.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

V5E_PEAK_FLOPS = 197e12


def bench_config(name: str, *, noise_dim: int = 1152, batch: int = 512,
                 scan_k: int = 8, iters: int = 4, remat: bool = False,
                 **model_kwargs) -> dict:
    from meanflow_audio_codec_tpu.models import ConditionalConvFlow, TrainState
    from meanflow_audio_codec_tpu.training import (
        ImprovedMeanFlowObjective,
        make_train_step,
    )
    from meanflow_audio_codec_tpu.training.profiling import (
        estimate_step_flops,
        force_completion,
    )
    from meanflow_audio_codec_tpu.training.train_step import make_multi_step

    # MFU numerator = FLOPs of the *non-remat* single-step program (model
    # FLOPs); the timed program may remat (recompute does not earn credit).
    num_blocks = model_kwargs.pop("num_blocks", 8)
    model = ConditionalConvFlow(noise_dimension=noise_dim,
                                condition_dimension=256,
                                num_blocks=num_blocks,
                                latent_dimension=256, dtype=jnp.bfloat16,
                                remat=remat, **model_kwargs)
    x0 = jnp.zeros((batch, noise_dim))
    variables = jax.jit(lambda k: model.init(
        k, x0, jnp.zeros((batch, 2)), method="init_all"))(
        jax.random.PRNGKey(0))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.adamw(1e-4))
    objective = ImprovedMeanFlowObjective()
    # numerator from the non-remat, NON-fused program: remat recompute earns
    # no credit, and XLA cost analysis cannot see inside a Pallas custom
    # call — the unfused clone keeps fused rows comparable to their baselines
    flops_model = model.clone(remat=False, fused_stage=False)
    flops_state = state.replace(apply_fn=flops_model.apply)
    single = make_train_step(objective, donate=False)
    probe = jax.random.normal(jax.random.PRNGKey(1), (batch, noise_dim))
    flops = estimate_step_flops(single, flops_state, jax.random.PRNGKey(2),
                                probe)

    step = make_multi_step(objective, scan_k, donate=True)
    batches = jax.random.normal(jax.random.PRNGKey(3),
                                (scan_k, batch, noise_dim))
    state, metrics = step(state, jax.random.PRNGKey(4), batches)
    force_completion(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, jax.random.fold_in(
            jax.random.PRNGKey(5), i), batches)
    force_completion(metrics["loss"])
    wall = (time.perf_counter() - t0) / (iters * scan_k)
    n_params = sum(int(np.size(p))
                   for p in jax.tree_util.tree_leaves(state.params))
    row = {"config": name, **model_kwargs, "params_m": round(n_params / 1e6, 1),
           "batch": batch, "steps_per_sec": round(1.0 / wall, 2)}
    if flops:
        row["step_gflop"] = round(flops / 1e9, 1)
        row["mfu"] = round(flops / wall / V5E_PEAK_FLOPS, 4)
        row["tflops"] = round(flops / wall / 1e12, 1)
    return row


#: run knobs (batch/scan_k/remat) ride along with the model kwargs.
CONFIGS = {
    "r1_baseline": dict(channels=64, bottleneck_dim=512),
    "ch128_s32_lift16": dict(channels=128, bottleneck_dim=512, spatial=32,
                             lift_channels=16),
    "ch128_s16_dense": dict(channels=128, bottleneck_dim=512, spatial=16),
    "ch256_s16_lift32": dict(channels=256, bottleneck_dim=512, spatial=16,
                             lift_channels=32),
    # M-starvation fix: Dense matmuls at M=512 run ~26% of peak, ~69% at
    # M=4096 (microbench) — fold the step batch up, remat stages to fit.
    "ch128_s32_lift16_b2048": dict(channels=128, bottleneck_dim=512,
                                   spatial=32, lift_channels=16,
                                   batch=2048, scan_k=2, remat=True),
    "ch256_s16_lift32_b2048": dict(channels=256, bottleneck_dim=512,
                                   spatial=16, lift_channels=32,
                                   batch=2048, scan_k=2, remat=True),
    "ch256_s16_lift32_b4096": dict(channels=256, bottleneck_dim=512,
                                   spatial=16, lift_channels=32,
                                   batch=4096, scan_k=1, remat=True),
    "ch128_s16_dense_b4096": dict(channels=128, bottleneck_dim=512,
                                  spatial=16, batch=4096, scan_k=1,
                                  remat=True),
    # no-remat large-batch s16 variants (small grids may fit raw)
    "ch256_s16_lift32_b1024": dict(channels=256, bottleneck_dim=512,
                                   spatial=16, lift_channels=32,
                                   batch=1024, scan_k=4),
    "ch128_s16_dense_b2048": dict(channels=128, bottleneck_dim=512,
                                  spatial=16, batch=2048, scan_k=2),
    # dots-saveable remat: recompute only elementwise, keep MXU credit
    "ch256_s16_lift32_b2048_dots": dict(channels=256, bottleneck_dim=512,
                                        spatial=16, lift_channels=32,
                                        batch=2048, scan_k=2, remat=True,
                                        remat_policy="dots_saveable"),
    "ch128_s32_lift16_b2048_dots": dict(channels=128, bottleneck_dim=512,
                                        spatial=32, lift_channels=16,
                                        batch=2048, scan_k=2, remat=True,
                                        remat_policy="dots_saveable"),
    # wider channels / smaller grid: conv + 1x1 contractions at K=N>=512
    "ch512_s8_lift64_b2048_dots": dict(channels=512, bottleneck_dim=512,
                                       spatial=8, lift_channels=64,
                                       batch=2048, scan_k=2, remat=True,
                                       remat_policy="dots_saveable"),
    "ch256_s16_lift32_b4096_dots": dict(channels=256, bottleneck_dim=512,
                                        spatial=16, lift_channels=32,
                                        batch=4096, scan_k=1, remat=True,
                                        remat_policy="dots_saveable"),
    # wider bottleneck: bigger-K lift matmuls raise the efficient-FLOP share
    "ch256_s16_lift32_bn1024_b2048_dots": dict(
        channels=256, bottleneck_dim=1024, spatial=16, lift_channels=32,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable"),
    "ch384_s16_lift48_b2048_dots": dict(
        channels=384, bottleneck_dim=512, spatial=16, lift_channels=48,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable"),
    "ch256_s16_lift32_bn2048_b2048_dots": dict(
        channels=256, bottleneck_dim=2048, spatial=16, lift_channels=32,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable"),
    "ch256_s16_lift64_bn1024_b2048_dots": dict(
        channels=256, bottleneck_dim=1024, spatial=16, lift_channels=64,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable"),
    "ch256_s16_lift32_bn1024_b3072_dots": dict(
        channels=256, bottleneck_dim=1024, spatial=16, lift_channels=32,
        batch=3072, scan_k=1, remat=True, remat_policy="dots_saveable"),
    # scale-ups of the s8/ch512 winner (56.9% MFU at 75M params): same
    # 8x8 grid, more capacity via bottleneck width / lift / depth / channels
    "ch512_s8_lift64_bn1024_b2048_dots": dict(
        channels=512, bottleneck_dim=1024, spatial=8, lift_channels=64,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable"),
    "ch512_s8_lift128_bn1024_b2048_dots": dict(
        channels=512, bottleneck_dim=1024, spatial=8, lift_channels=128,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable"),
    "ch512_s8_lift64_nb16_b2048_dots": dict(
        channels=512, bottleneck_dim=512, spatial=8, lift_channels=64,
        num_blocks=16, batch=2048, scan_k=2, remat=True,
        remat_policy="dots_saveable"),
    "ch1024_s8_lift64_b2048_dots": dict(
        channels=1024, bottleneck_dim=512, spatial=8, lift_channels=64,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable"),
    # push the ch1024 s8 winner (67.5% MFU): deeper / wider still
    "ch1024_s8_lift64_nb16_b2048_dots": dict(
        channels=1024, bottleneck_dim=512, spatial=8, lift_channels=64,
        num_blocks=16, batch=2048, scan_k=1, remat=True,
        remat_policy="dots_saveable"),
    "ch2048_s8_lift128_b1024_dots": dict(
        channels=2048, bottleneck_dim=512, spatial=8, lift_channels=128,
        batch=1024, scan_k=2, remat=True, remat_policy="dots_saveable"),
    "ch1024_s8_lift128_bn1024_b2048_dots": dict(
        channels=1024, bottleneck_dim=1024, spatial=8, lift_channels=128,
        batch=2048, scan_k=1, remat=True, remat_policy="dots_saveable"),
    # remat-off at the bench geometry (round-5 item: the trainer pays
    # dots_saveable recompute the MFU numerator does not credit; these
    # rows measure that tax directly at the largest no-remat batch that
    # fits HBM — b2048 raw activations at ch1024-s8 exceed 16 GB)
    "ch1024_s8_lift64_b1024_noremat": dict(
        channels=1024, bottleneck_dim=512, spatial=8, lift_channels=64,
        batch=1024, scan_k=2),
    "ch1024_s8_lift64_b512_noremat": dict(
        channels=1024, bottleneck_dim=512, spatial=8, lift_channels=64,
        batch=512, scan_k=4),
    "ch1024_s8_lift64_b2048_noremat": dict(
        channels=1024, bottleneck_dim=512, spatial=8, lift_channels=64,
        batch=2048, scan_k=2),
    # fused Pallas stage kernels (ops/stage_pallas.py) on the champions:
    # one HBM pass for each norm/FiLM/GELU/GRN segment instead of XLA's
    # reduce->broadcast chains
    "ch1024_s8_lift64_b2048_dots_fused": dict(
        channels=1024, bottleneck_dim=512, spatial=8, lift_channels=64,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable",
        fused_stage=True),
    "ch512_s8_lift64_bn1024_b2048_dots_fused": dict(
        channels=512, bottleneck_dim=1024, spatial=8, lift_channels=64,
        batch=2048, scan_k=2, remat=True, remat_policy="dots_saveable",
        fused_stage=True),
    "ch1024_s8_lift64_nb16_b2048_dots_fused": dict(
        channels=1024, bottleneck_dim=512, spatial=8, lift_channels=64,
        num_blocks=16, batch=2048, scan_k=1, remat=True,
        remat_policy="dots_saveable", fused_stage=True),
}


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--configs", nargs="+", default=list(CONFIGS),
                        choices=list(CONFIGS))
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--scan-k", type=int, default=8)
    args = parser.parse_args(argv)
    for name in args.configs:
        kwargs = dict(CONFIGS[name])
        batch = kwargs.pop("batch", args.batch)
        scan_k = kwargs.pop("scan_k", args.scan_k)
        try:
            row = bench_config(name, batch=batch, scan_k=scan_k, **kwargs)
        except Exception as exc:  # OOM etc. — report and continue
            row = {"config": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
