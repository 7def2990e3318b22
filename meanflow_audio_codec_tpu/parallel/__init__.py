"""Mesh + sharding layer (no reference counterpart; SURVEY.md §2.4, §5.8)."""

from meanflow_audio_codec_tpu.parallel.distributed import (
    global_batch_slice,
    initialize_distributed,
)
from meanflow_audio_codec_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    mesh_from_config,
    param_partition_spec,
    replicated,
    shard_state,
    state_shardings,
)
