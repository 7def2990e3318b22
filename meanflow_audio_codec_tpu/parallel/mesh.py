"""Device mesh construction and sharding policies.

The reference has NO multi-device execution of any kind (SURVEY.md §2.4);
this module is the TPU-native scale-out layer it lacked: build a
``jax.sharding.Mesh`` over the slice, annotate data/parameter shardings,
and let XLA insert the ICI collectives.

Axes:
  * ``data``  — batch-dimension data parallelism (gradients all-reduce over
    ICI automatically under jit).
  * ``model`` — tensor parallelism for the wide Dense kernels (Mixer
    token/channel-mix, encoder context projections): column-partitioned
    kernels, XLA inserts the matching all-gathers.

The audio codec is frame-local (no op couples MDCT frames), so batch
sharding subsumes sequence parallelism — frames are batch rows
(SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int = -1, model: int = 1,
                devices: list | None = None) -> Mesh:
    """Build a (data, model) mesh; data=-1 means all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model <= 0:
        raise ValueError(f"model axis size must be positive, got {model}")
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data == -1:
        data = n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not match {n} devices")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(config: Any, devices: list | None = None) -> Mesh:
    return create_mesh(data=config.tpu.mesh_data, model=config.tpu.mesh_model,
                       devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


#: kernels below this element count are replicated regardless of shape.
_TP_MIN_PARAM_SIZE = 16384


def param_partition_spec(path: tuple, leaf, model_size: int) -> P:
    """Tensor-parallel rule for large kernels (Megatron-style pairing).

    * 2-d Dense kernels: partition the *larger* contraction-side axis —
      a lift ``[bneck, S*S*C]`` column-shards (``P(None, 'model')``) and its
      paired projection ``[S*S*C, bneck]`` row-shards (``P('model', None)``),
      so the wide activation between them stays partitioned and XLA emits
      one reduce at the pair's end instead of an all-gather per matmul.
      This covers the ConvStage dense lifts and the Mixer mix kernels —
      the tensors that make ch=128 convnets and >1k-dim mixers
      single-chip param-bound.
    * 4-d conv kernels ``[kh, kw, cin, cout]``: shard the output-channel
      axis; XLA gathers where a partitioned activation meets a spatial op.
    * everything else (biases, scales, small kernels) replicates.
    """
    shape = np.shape(leaf)
    if np.size(leaf) < _TP_MIN_PARAM_SIZE:
        return P()
    if len(shape) == 2:
        rows, cols = shape
        if cols >= rows and cols % model_size == 0:
            return P(None, MODEL_AXIS)
        if rows > cols and rows % model_size == 0:
            return P(MODEL_AXIS, None)
        return P()
    if len(shape) == 4 and shape[-1] % model_size == 0:
        return P(None, None, None, MODEL_AXIS)
    return P()


def state_shardings(state, mesh: Mesh) -> Any:
    """NamedSharding pytree for a TrainState.

    With model-axis size 1 everything replicates (pure DP). Otherwise the
    TP rule above partitions the big kernels; the optimizer state inherits
    the same layout leaf-by-leaf (optax slots mirror the param tree).
    """
    model_size = mesh.shape[MODEL_AXIS]
    param_structure = jax.tree_util.tree_structure(state.params)

    def spec_for_params(params):
        if model_size <= 1:
            return jax.tree_util.tree_map(lambda _: P(), params)
        return jax.tree_util.tree_map(
            lambda leaf: param_partition_spec((), leaf, model_size), params)

    def match(slot):
        # optax slots that mirror the param pytree reuse its specs
        if jax.tree_util.tree_structure(slot) == param_structure:
            return spec_for_params(slot)
        return jax.tree_util.tree_map(lambda _: P(), slot)

    specs = jax.tree_util.tree_map(lambda _: P(), state)
    specs = specs.replace(
        params=spec_for_params(state.params),
        opt_state=jax.tree_util.tree_map(
            match, state.opt_state,
            is_leaf=lambda s: jax.tree_util.tree_structure(s)
            == param_structure),
        ema_params=(spec_for_params(state.ema_params)
                    if state.ema_params is not None else None),
    )
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def shard_state(state, mesh: Mesh):
    """Place a host TrainState onto the mesh per ``state_shardings``."""
    return jax.device_put(state, state_shardings(state, mesh))
