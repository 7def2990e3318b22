"""Time-embedding primitives (reference: meanflow_audio_codec/utils.py:5-13).

Pure functions, safe under jit/vmap/jvp. The dual-time conditioning used by
every flow model embeds both t and the interval h = t - r and sums them.
"""

from __future__ import annotations

import jax.numpy as jnp


def sinusoidal_embedding(x: jnp.ndarray, dim: int,
                         max_period: float = 10000.0) -> jnp.ndarray:
    """Transformer-style sinusoidal embedding.

    Args:
        x: scalar-per-example array ``[B]`` (values typically in [0, 1]).
        dim: embedding width; must be even (cos half + sin half).
        max_period: largest wavelength.

    Returns:
        ``[B, dim]`` float32 embedding ``[cos(x f), sin(x f)]``.
    """
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = x[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def dual_time_embedding(time: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Summed embedding of a (t, h) time pair.

    Args:
        time: ``[B, 2]`` with columns (t, h=t-r).
        dim: embedding width.

    Returns:
        ``[B, dim]`` conditioning vector ``emb(t) + emb(h)``.
    """
    return (sinusoidal_embedding(time[:, 0], dim)
            + sinusoidal_embedding(time[:, 1], dim))
