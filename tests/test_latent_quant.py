"""Latent bitstream: per-frame scalar quantization of codec latents."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.ops.latent_quant import (
    LatentBitstream,
    bitstream_kbps,
    dequantize_latents,
    quantize_latents,
)


def _latents(seed=0, b=2, nf=7, d=32, scale=3.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, nf, d)) * scale).astype(np.float32)


@pytest.mark.parametrize("bits,dtype,tol", [(4, jnp.int8, 7.2e-2),
                                            (8, jnp.int8, 2.5e-2),
                                            (16, jnp.int16, 1e-4)])
def test_roundtrip_error_bounded(bits, dtype, tol):
    latents = _latents()
    bs = quantize_latents(jnp.asarray(latents), bits=bits)
    assert bs.codes.dtype == dtype
    assert bs.scale.shape == latents.shape[:2] + (1,)
    assert bs.bits == bits
    recon = np.asarray(dequantize_latents(bs))
    # symmetric scalar quant: |err| <= scale/2 per element
    peak = np.abs(latents).max(axis=-1, keepdims=True)
    assert np.all(np.abs(recon - latents) <= peak * tol + 1e-7)


def test_zero_is_exact_and_peak_preserved():
    latents = _latents(seed=1)
    latents[:, :, 0] = 0.0  # silence dims stay exactly zero
    bs = quantize_latents(jnp.asarray(latents), bits=8)
    recon = np.asarray(dequantize_latents(bs))
    assert np.all(recon[:, :, 0] == 0.0)
    # the per-frame peak quantizes to +-qmax, so it round-trips exactly
    flat_idx = np.abs(latents).reshape(2, 7, -1).argmax(-1)
    for b in range(2):
        for f in range(7):
            i = flat_idx[b, f]
            np.testing.assert_allclose(recon[b, f, i], latents[b, f, i],
                                       rtol=1e-6)


def test_per_frame_scales_isolate_loud_frames():
    """A loud frame must not destroy a quiet frame's precision."""
    latents = _latents(seed=2, scale=0.01)
    latents[:, 0] *= 1000.0  # frame 0 is 1000x louder
    bs = quantize_latents(jnp.asarray(latents), bits=8)
    recon = np.asarray(dequantize_latents(bs))
    quiet_err = np.abs(recon[:, 1:] - latents[:, 1:]).max()
    assert quiet_err < 0.01 * 2.5e-2  # scaled to the quiet frames' peak


def test_all_zero_frame_is_stable():
    latents = np.zeros((1, 3, 16), np.float32)
    bs = quantize_latents(jnp.asarray(latents), bits=8)
    recon = np.asarray(dequantize_latents(bs))
    assert np.all(recon == 0.0) and np.isfinite(recon).all()


def test_bitstream_is_a_pytree():
    bs = quantize_latents(jnp.asarray(_latents()), bits=8)
    moved = jax.tree_util.tree_map(lambda x: x, bs)
    assert isinstance(moved, LatentBitstream)
    out = jax.jit(dequantize_latents)(bs)
    assert out.shape == (2, 7, 32)


def test_4bit_codes_stay_in_range_and_roundtrip_container():
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        pack_bitstream, unpack_bitstream)
    latents = _latents(seed=7)
    bs = quantize_latents(jnp.asarray(latents), bits=4)
    assert bs.bits == 4 and bs.codes.dtype == jnp.int8
    codes = np.asarray(bs.codes)
    assert codes.min() >= -7 and codes.max() <= 7
    back = unpack_bitstream(pack_bitstream(bs))
    assert back.bits == 4
    np.testing.assert_array_equal(np.asarray(back.codes), codes)


def test_invalid_bits_rejected():
    with pytest.raises(ValueError, match="bits"):
        quantize_latents(jnp.zeros((1, 2, 4)), bits=12)


def test_bitrate_formula():
    # v2 quality geometry: latent 256 at 44100/256 frames/s, 8-bit codes
    fps = 44100 / 256
    kbps = bitstream_kbps(256, fps, bits=8)
    assert kbps == pytest.approx(fps * (256 * 8 + 32) / 1000.0)
    raw_16bit_stereo = 44100 * 2 * 16 / 1000.0
    # ~3.9x nominal reduction vs PCM (the rANS container measures ~5x)
    assert raw_16bit_stereo / kbps > 3.5


# ---- ECSQ (MACB v2) ---------------------------------------------------------

def _offset_latents(seed=0, b=2, nf=7, d=32):
    """Latents with large static per-dim means + small residual — the
    measured shape of the v2 codec's latent space (means carry ~94% of
    the energy)."""
    rng = np.random.default_rng(seed)
    mu = rng.standard_normal((d,)).astype(np.float32)
    resid = 0.12 * rng.standard_normal((b, nf, d)).astype(np.float32)
    return mu + resid


def test_ecsq_roundtrip_error_bounded_by_step():
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        quantize_latents_ecsq)
    latents = _offset_latents()
    bs = quantize_latents_ecsq(jnp.asarray(latents), step_frac=0.5)
    assert bs.codes.dtype == jnp.int8
    assert bs.mean_codes is not None and bs.mean_codes.dtype == jnp.int8
    recon = np.asarray(dequantize_latents(bs))
    step = np.asarray(bs.scale)
    # mean quantization error folds into the residual before the grid, so
    # the uniform-quantizer bound holds end to end
    assert np.all(np.abs(recon - latents) <= step * 0.5 + 1e-6)


def test_ecsq_dominates_peak_quant_on_offset_latents():
    """Same storage dtype, lower MSE AND lower entropy than peak-4-bit —
    the measurement that motivated MACB v2."""
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        pack_bitstream, quantize_latents_ecsq)
    latents = _offset_latents(seed=3, b=4, nf=64, d=64)
    ecsq = quantize_latents_ecsq(jnp.asarray(latents), step_frac=0.9)
    peak4 = quantize_latents(jnp.asarray(latents), bits=4)
    mse_e = float(np.mean((np.asarray(dequantize_latents(ecsq)) - latents) ** 2))
    mse_4 = float(np.mean((np.asarray(dequantize_latents(peak4)) - latents) ** 2))
    assert mse_e < mse_4
    assert len(pack_bitstream(ecsq)) <= len(pack_bitstream(peak4)) * 1.1


def test_ecsq_step_frac_is_a_rate_knob():
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        pack_bitstream, quantize_latents_ecsq)
    latents = _offset_latents(seed=4, b=2, nf=64, d=64)
    sizes, mses = [], []
    for frac in (1.0, 0.5, 0.25):
        bs = quantize_latents_ecsq(jnp.asarray(latents), step_frac=frac)
        sizes.append(len(pack_bitstream(bs)))
        mses.append(float(np.mean(
            (np.asarray(dequantize_latents(bs)) - latents) ** 2)))
    assert sizes[0] < sizes[1] < sizes[2]   # smaller step -> more bytes
    assert mses[0] > mses[1] > mses[2]      # ... and less distortion


def test_ecsq_container_roundtrip_exact_v2():
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        describe_bitstream, pack_bitstream, quantize_latents_ecsq,
        unpack_bitstream)
    latents = _offset_latents(seed=5)
    bs = quantize_latents_ecsq(jnp.asarray(latents), step_frac=0.4)
    data = pack_bitstream(bs)
    h = describe_bitstream(data)
    assert h["version"] == 2 and h["quantizer"] == "ecsq+mean"
    back = unpack_bitstream(data)
    np.testing.assert_array_equal(np.asarray(back.codes),
                                  np.asarray(bs.codes))
    np.testing.assert_array_equal(np.asarray(back.mean_codes),
                                  np.asarray(bs.mean_codes))
    np.testing.assert_allclose(np.asarray(back.scale),
                               np.asarray(bs.scale), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back.mean_scale),
                               np.asarray(bs.mean_scale), rtol=1e-6)
    # decode equivalence through the container
    np.testing.assert_allclose(np.asarray(dequantize_latents(back)),
                               np.asarray(dequantize_latents(bs)),
                               rtol=1e-6)


def test_v1_container_still_reads_after_v2():
    """Version-1 streams (no mean section) stay decodable — backward
    compatibility of the on-disk format."""
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        describe_bitstream, pack_bitstream, unpack_bitstream)
    latents = _latents(seed=6)
    bs = quantize_latents(jnp.asarray(latents), bits=8)
    data = pack_bitstream(bs)
    assert describe_bitstream(data)["version"] == 1
    back = unpack_bitstream(data)
    assert back.mean_codes is None
    np.testing.assert_array_equal(np.asarray(back.codes),
                                  np.asarray(bs.codes))


def test_ecsq_2d_single_stream():
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        pack_bitstream, quantize_latents_ecsq, unpack_bitstream)
    latents = _offset_latents(seed=8)[0]  # [nf, d]
    bs = quantize_latents_ecsq(jnp.asarray(latents), step_frac=0.5)
    recon = np.asarray(dequantize_latents(bs))
    assert recon.shape == latents.shape
    back = unpack_bitstream(pack_bitstream(bs))
    assert np.asarray(back.codes).shape == (1,) + latents.shape


def test_ecsq_is_jittable():
    from meanflow_audio_codec_tpu.ops.latent_quant import (
        quantize_latents_ecsq)
    latents = jnp.asarray(_offset_latents(seed=9))
    fn = jax.jit(lambda z: dequantize_latents(
        quantize_latents_ecsq(z, step_frac=0.5)))
    out = np.asarray(fn(latents))
    assert out.shape == latents.shape and np.isfinite(out).all()
