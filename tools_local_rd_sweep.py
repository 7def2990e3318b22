"""One-off R-D sweep driver: v2 checkpoint, 64 held-out clips, CPU.

For each quantizer setting: quantize -> dequantize -> one NFE=1 decode ->
audio metrics + measured kbps. Incremental JSONL so partial sweeps are
usable. (Kept at repo root for provenance; the reusable machinery lives
in evaluate_all --latent-step / --latent-bits.)
"""
import sys, json, time
from pathlib import Path

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from meanflow_audio_codec_tpu.configs import load_config_from_json
from meanflow_audio_codec_tpu.tools.evaluate_all import (
    find_checkpoint_for, load_real_data)
from meanflow_audio_codec_tpu.evaluators.comprehensive_evaluator import (
    ComprehensiveEvaluator)
from meanflow_audio_codec_tpu.ops.latent_quant import (
    dequantize_latents, pack_bitstream, quantize_latents,
    quantize_latents_ecsq)

workdir = Path(sys.argv[1] if len(sys.argv) > 1 else
               "outputs/imf_audio_quality_v2")
out_path = workdir / "rd_sweep.jsonl"
config = load_config_from_json(workdir / "config.json")
ckpt = find_checkpoint_for(config)
print("checkpoint:", ckpt, flush=True)
data = load_real_data(config, 64)
ev = ComprehensiveEvaluator(ckpt, config, nfe_list=[1], num_samples=64)

encode = jax.jit(lambda p, raw: ev.state.apply_fn(
    {"params": p}, ev.adapter.tokenize(raw), method="encode"))
latents = encode(ev.eval_params, jnp.asarray(data))
latents.block_until_ready()
print("encoded", latents.shape, flush=True)
duration_s = data.shape[0] * data.shape[1] / 44100.0
key = jax.random.PRNGKey(0)

decode = jax.jit(lambda lat, k: ev._sample_flat(lat, 1, k))

points = ([("float", None)]
          + [("ecsq", f) for f in (1.5, 1.0, 0.7, 0.5, 0.35, 0.25, 0.15)]
          + [("v1bits", 8), ("v1bits", 4)])
done = set()
if out_path.exists():
    for line in out_path.read_text().splitlines():
        r = json.loads(line)
        done.add((r["mode"], r["param"]))

for mode, param in points:
    if (mode, param) in done:
        print("skip", mode, param, flush=True)
        continue
    t0 = time.time()
    if mode == "float":
        lat, kbps = latents, None
    else:
        bs = (quantize_latents_ecsq(latents, step_frac=param)
              if mode == "ecsq" else quantize_latents(latents, bits=param))
        kbps = len(pack_bitstream(bs)) * 8 / duration_s / 1000.0
        lat = dequantize_latents(bs)
    flat = decode(lat, key)
    decoded = ev.adapter.detokenize_flat(flat, ev.token_shape)
    decoded_np = np.asarray(jax.device_get(decoded), dtype=np.float32)
    q = ev._quality(np.asarray(data), decoded_np)
    row = {"mode": mode, "param": param, "kbps": kbps,
           "si_snr_db": q.get("si_snr_db"), "stoi": q.get("stoi"),
           "mse": q.get("mse"), "spectral": q.get("spectral_distance"),
           "sec": round(time.time() - t0, 1)}
    with out_path.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)
print("sweep complete ->", out_path, flush=True)
