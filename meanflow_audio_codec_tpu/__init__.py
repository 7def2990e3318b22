"""meanflow_audio_codec_tpu — TPU-native MDCT-domain neural audio codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gabrieldernbach/meanflow_audio_codec: an MDCT-domain codec whose decoder is a
conditional flow-matching sampler distilled to 1-NFE decode via (improved)
mean flow, swept over a method x architecture x tokenization x dataset
experiment matrix and driven by a hierarchical JSON config system.

Subpackages:
  configs    — hierarchical validated config (v1/v2 JSON, migrate/merge/diff)
  ops        — pure jit-friendly TPU compute: MDCT/IMDCT, tokenizers,
               embeddings, losses, schedules, samplers, Pallas kernels
  models     — Flax model families (MLP / MLP-Mixer / ConvNeXt flows, AEs)
  training   — fused train step, objectives, trainer loop, checkpoints, logs
  parallel   — mesh construction + NamedSharding policies (DP/TP over ICI)
  data       — MNIST + streaming audio pipelines (native C++ loader core)
  evaluators — samplers-as-metrics, FID/KID/PSNR/SSIM, audio metrics, perf
  tools      — config matrix generation, batch eval, tables, benchmarks
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: these pull in flax/optax; keep bare package import light
    if name == "AudioCodec":
        from meanflow_audio_codec_tpu.codec import AudioCodec
        return AudioCodec
    if name in ("StreamingCodec", "StreamingEncoder", "StreamingDecoder"):
        from meanflow_audio_codec_tpu import streaming
        return getattr(streaming, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
