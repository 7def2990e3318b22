"""Multi-host / multi-slice initialisation.

The reference is strictly single-process (SURVEY.md §2.4). On TPU pods,
``initialize_distributed()`` wires ``jax.distributed`` so every host sees
the global device set; intra-slice traffic rides ICI, cross-slice rides DCN
— all through the same Mesh + NamedSharding machinery in
:mod:`meanflow_audio_codec_tpu.parallel.mesh`.
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Call ``jax.distributed.initialize`` when running multi-process.

    No-ops (returns False) for single-process runs — the common local case —
    so trainers can call it unconditionally. Environment fallbacks follow
    the standard JAX cluster variables (COORDINATOR_ADDRESS etc.).
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return True
    env_procs = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes or (int(env_procs) if env_procs else None)
    if coordinator_address is None and num_processes in (None, 0, 1):
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except Exception as exc:
        print(f"jax.distributed.initialize failed: {exc}")
        return False


def global_batch_slice(global_batch: int) -> tuple[int, int]:
    """(per-process batch, offset) for host-sharded data loading."""
    count = jax.process_count()
    index = jax.process_index()
    per = global_batch // count
    return per, per * index
