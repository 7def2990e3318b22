"""Native rANS entropy coder + latent bitstream serialization."""

import jax.numpy as jnp
import numpy as np
import pytest

from meanflow_audio_codec_tpu.ops import entropy
from meanflow_audio_codec_tpu.ops.latent_quant import (
    LatentBitstream,
    pack_bitstream,
    quantize_latents,
    unpack_bitstream,
)

pytestmark = pytest.mark.skipif(
    not entropy.available(),
    reason=f"native entropy coder unavailable: {entropy.load_error()}")


def _laplacian_codes(n, seed=0, scale=12.0):
    rng = np.random.default_rng(seed)
    return np.clip(np.round(rng.laplace(0, scale, n)),
                   -127, 127).astype(np.int8)


@pytest.mark.parametrize("n", [0, 1, 3, 256, 10_000, 300_000])
def test_roundtrip_exact(n):
    codes = _laplacian_codes(n)
    data = entropy.entropy_encode(codes)
    out = entropy.entropy_decode(data, n)
    np.testing.assert_array_equal(out, codes)


def test_roundtrip_all_symbols_and_extremes():
    codes = np.arange(-128, 128, dtype=np.int8).repeat(7)
    out = entropy.entropy_decode(entropy.entropy_encode(codes), codes.size)
    np.testing.assert_array_equal(out, codes)


def test_constant_stream_compresses_to_nearly_nothing():
    codes = np.zeros(100_000, dtype=np.int8)
    data = entropy.entropy_encode(codes)
    assert len(data) < 600  # 512-byte table + header + flushed state


def test_concentrated_codes_beat_raw():
    """Laplacian codes (the latent statistics) must compress well."""
    codes = _laplacian_codes(200_000)
    data = entropy.entropy_encode(codes)
    bits_per_symbol = len(data) * 8 / codes.size
    assert bits_per_symbol < 7.0  # ~6.4 bits entropy at scale 12
    out = entropy.entropy_decode(data, codes.size)
    np.testing.assert_array_equal(out, codes)


def test_uniform_codes_near_raw_not_worse():
    rng = np.random.default_rng(1)
    codes = rng.integers(-128, 128, 100_000).astype(np.int8)
    data = entropy.entropy_encode(codes)
    assert len(data) < codes.size * 1.02 + 600  # table overhead only


def test_malformed_stream_rejected():
    codes = _laplacian_codes(1000)
    data = bytearray(entropy.entropy_encode(codes))
    with pytest.raises(ValueError):
        entropy.entropy_decode(bytes(data[:300]), 1000)  # truncated table
    data[10] ^= 0xFF  # corrupt the frequency table -> total != 4096
    with pytest.raises(ValueError):
        entropy.entropy_decode(bytes(data), 1000)


def test_pack_unpack_bitstream_exact():
    rng = np.random.default_rng(2)
    latents = (rng.standard_normal((4, 64, 64)) * 3).astype(np.float32)
    bs = quantize_latents(jnp.asarray(latents), bits=8)
    data = pack_bitstream(bs)
    back = unpack_bitstream(data)
    assert isinstance(back, LatentBitstream)
    np.testing.assert_array_equal(np.asarray(back.codes),
                                  np.asarray(bs.codes))
    np.testing.assert_array_equal(np.asarray(back.scale),
                                  np.asarray(bs.scale))
    # entropy path engaged and beats the raw layout at this size
    raw = pack_bitstream(bs, entropy=False)
    assert len(data) < len(raw)
    back_raw = unpack_bitstream(raw)
    np.testing.assert_array_equal(np.asarray(back_raw.codes),
                                  np.asarray(bs.codes))


def test_pack_auto_prefers_raw_on_tiny_streams():
    """The 512-byte table must not bloat tiny bitstreams in auto mode."""
    rng = np.random.default_rng(5)
    latents = (rng.standard_normal((1, 3, 8)) * 3).astype(np.float32)
    bs = quantize_latents(jnp.asarray(latents), bits=8)
    auto = pack_bitstream(bs)
    raw = pack_bitstream(bs, entropy=False)
    assert len(auto) == len(raw)
    np.testing.assert_array_equal(np.asarray(unpack_bitstream(auto).codes),
                                  np.asarray(bs.codes))


def test_pack_16bit_falls_back_to_raw():
    rng = np.random.default_rng(3)
    latents = (rng.standard_normal((1, 4, 16)) * 3).astype(np.float32)
    bs = quantize_latents(jnp.asarray(latents), bits=16)
    back = unpack_bitstream(pack_bitstream(bs))
    np.testing.assert_array_equal(np.asarray(back.codes),
                                  np.asarray(bs.codes))
    with pytest.raises(ValueError, match="8-bit"):
        pack_bitstream(bs, entropy=True)


def test_unpack_rejects_garbage():
    with pytest.raises(ValueError, match="MACB"):
        unpack_bitstream(b"nope" + b"\x00" * 64)
