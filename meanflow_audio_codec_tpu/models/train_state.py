"""Training state (reference: meanflow_audio_codec/models/train_state.py).

Extends the stock Flax TrainState with an optional EMA parameter copy — the
reference tracked only a scalar loss EMA; model-weight EMA is standard for
flow/diffusion samplers and costs one buffer.
"""

from __future__ import annotations

from typing import Any

import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """TrainState with optional EMA params (None disables tracking)."""

    ema_params: Any = None
    ema_decay: float = 0.999

    def apply_gradients(self, *, grads, **kwargs):
        new_state = super().apply_gradients(grads=grads, **kwargs)
        if self.ema_params is None:
            return new_state
        decay = self.ema_decay
        new_ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            self.ema_params, new_state.params)
        return new_state.replace(ema_params=new_ema)
