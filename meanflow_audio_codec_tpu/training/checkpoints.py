"""Checkpointing with metadata sidecars, validation, retention and resume.

Re-design of the reference checkpoint layer (meanflow_audio_codec/trainers/
utils.py:45-783). On-disk contract preserved:

  * ``workdir/checkpoints/step_{N:05d}.msgpack`` — full TrainState via
    ``flax.serialization`` msgpack;
  * ``step_{N:05d}.metadata.json`` sidecar — step, timestamp, git commit,
    config SHA256, jax/flax versions, platform, byte size, param count and
    full param-shape map;
  * retention by ``max_checkpoints_to_keep`` with keep-final;
  * corrupted-checkpoint tolerance: resume walks newest -> oldest skipping
    files that fail size/load/structure validation.

Additive: an async Orbax backend (``checkpoint_format='orbax'`` in config)
for sharded multi-host state — the msgpack path is host-blocking and
replicates, fine at reference model scale.
"""

from __future__ import annotations

import hashlib
import json
import re
import subprocess
import time
from pathlib import Path
from typing import Any

import flax
import jax
import numpy as np
from flax import serialization

CHECKPOINT_RE = re.compile(r"step_(\d+)\.(?:msgpack|orbax)$")
MIN_CHECKPOINT_BYTES = 100


# ============================================================================
# Save / load primitives
# ============================================================================


def save_checkpoint(state, path: Path | str) -> Path:
    """Serialise a TrainState to msgpack (device -> host -> disk)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_state = jax.device_get(state)
    path.write_bytes(serialization.to_bytes(host_state))
    return path


def load_checkpoint(path: Path | str, template):
    """Deserialise msgpack bytes into a freshly-initialised template state."""
    return serialization.from_bytes(template, Path(path).read_bytes())


# ---------------------------------------------------------------------------
# Orbax backend (async-capable, sharding-aware; config checkpoint_format)
# ---------------------------------------------------------------------------


def _state_arrays(state) -> dict:
    """The serialisable subtree of a TrainState (no apply_fn/tx)."""
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
    }


def save_checkpoint_orbax(state, path: Path | str) -> Path:
    """Write a TrainState via orbax (directory checkpoint)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        import shutil
        shutil.rmtree(path)
    with ocp.PyTreeCheckpointer() as checkpointer:
        checkpointer.save(path, jax.device_get(_state_arrays(state)))
    return path


def load_checkpoint_orbax(path: Path | str, template):
    """Restore a TrainState saved with :func:`save_checkpoint_orbax`.

    Orbax round-trips tuples/namedtuples (optax states) as lists; the
    template's tree structure is re-imposed by unflattening the restored
    leaves (identical flattening order: dict keys sort, sequences keep
    order)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as checkpointer:
        restored_raw = checkpointer.restore(Path(path).absolute())
    target = _state_arrays(template)
    leaves = jax.tree_util.tree_leaves(restored_raw)
    want_leaves = jax.tree_util.tree_leaves(target)
    if len(leaves) != len(want_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template expects "
            f"{len(want_leaves)}")
    for got, want in zip(leaves, want_leaves):
        if np.shape(got) != np.shape(want):
            raise ValueError(
                f"checkpoint leaf shape {np.shape(got)} != template "
                f"{np.shape(want)}")
    treedef = jax.tree_util.tree_structure(target)
    restored = jax.tree_util.tree_unflatten(treedef, leaves)
    return template.replace(
        step=restored["step"], params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=restored["ema_params"])


def orbax_checkpoint_has_ema(path: Path | str) -> bool:
    """True when an orbax TrainState checkpoint stores an EMA copy.

    Inspects the checkpoint tree *metadata* (no tensor reads): a no-EMA
    run saves ``ema_params: None``, which orbax records as a None subtree.
    Mirrors the msgpack path's payload inspection so legacy no-EMA
    checkpoints load by structure rather than by guessing which exception
    type a given orbax version raises on template mismatch."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as checkpointer:
        meta = checkpointer.metadata(Path(path).absolute())
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", None)
    if not isinstance(tree, dict):  # unexpected orbax layout: read the tree
        with ocp.PyTreeCheckpointer() as checkpointer:
            tree = checkpointer.restore(Path(path).absolute())
    return tree.get("ema_params") is not None


def save_params_only(state, path: Path | str) -> Path:
    """Lightweight params-only checkpoint for inference
    (reference utils.py:548-586)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(jax.device_get(state.params)))
    return path


def load_params_only(path: Path | str, params_template):
    return serialization.from_bytes(params_template, Path(path).read_bytes())


# ---------------------------------------------------------------------------
# Serving checkpoints: durable, git-committable inference artifacts
# ---------------------------------------------------------------------------

SERVING_RE = re.compile(r"serving_step_(\d+)\.msgpack$")


def save_serving_checkpoint(state, checkpoint_dir: Path | str,
                            step: int | None = None) -> Path:
    """Write ``serving_step_{N}.msgpack``: the sampling-quality param set
    (EMA when tracked, else live params) and the step — no optimizer state,
    so the file is ~1/4 the size of a full TrainState checkpoint and small
    enough to commit to git. This is the disaster-recovery artifact: full
    checkpoints are untracked and die with the host; the serving file lets
    ``AudioCodec.from_workdir`` come back from a bare git clone."""
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    step = int(step if step is not None else jax.device_get(state.step))
    ema = getattr(state, "ema_params", None)
    payload = {"step": step,
               "params": jax.device_get(ema if ema is not None
                                        else state.params)}
    path = checkpoint_dir / f"serving_step_{step:05d}.msgpack"
    path.write_bytes(serialization.to_bytes(payload))
    return path


def load_serving_checkpoint(path: Path | str, params_template):
    """Restore ``(step, params)`` from a serving checkpoint."""
    payload = serialization.from_bytes(
        {"step": 0, "params": params_template}, Path(path).read_bytes())
    return int(payload["step"]), payload["params"]


def is_serving_checkpoint(path: Path | str) -> bool:
    return SERVING_RE.search(Path(path).name) is not None


def find_latest_serving_checkpoint(checkpoint_dir: Path | str) -> Path | None:
    checkpoint_dir = Path(checkpoint_dir)
    if not checkpoint_dir.exists():
        return None
    found = sorted(checkpoint_dir.glob("serving_step_*.msgpack"),
                   key=lambda p: int(SERVING_RE.search(p.name).group(1)))
    return found[-1] if found else None


# ============================================================================
# Metadata sidecars (reference utils.py:111-192)
# ============================================================================


def _git_commit() -> str | None:
    try:
        out = subprocess.run(["git", "rev-parse", "HEAD"],
                             capture_output=True, text=True, timeout=5)
        return out.stdout.strip() or None
    except Exception:
        return None


def config_hash(config: Any) -> str | None:
    try:
        blob = json.dumps(config.to_dict(), sort_keys=True, default=str)
        return hashlib.sha256(blob.encode()).hexdigest()
    except Exception:
        return None


def _param_shapes(params) -> dict:
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    return {k: list(np.shape(v)) for k, v in flat.items()}


def count_params(params) -> int:
    return sum(int(np.size(p)) for p in jax.tree_util.tree_leaves(params))


def checkpoint_metadata(state, path: Path, config: Any | None = None) -> dict:
    return {
        "step": int(state.step),
        "timestamp": time.time(),
        "datetime": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "git_commit": _git_commit(),
        "config_hash": config_hash(config) if config is not None else None,
        "jax_version": jax.__version__,
        "flax_version": flax.__version__,
        "platform": jax.default_backend(),
        "checkpoint_bytes": (
            sum(f.stat().st_size for f in path.rglob("*") if f.is_file())
            if path.is_dir() else
            path.stat().st_size if path.exists() else None),
        "param_count": count_params(state.params),
        "param_shapes": _param_shapes(state.params),
    }


def save_checkpoint_with_metadata(state, checkpoint_dir: Path | str,
                                  step: int | None = None,
                                  config: Any | None = None,
                                  fmt: str | None = None) -> Path:
    """Write ``step_{N:05d}.msgpack`` (or ``.orbax`` dir) + metadata sidecar."""
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else int(step)
    fmt = fmt or "msgpack"
    if fmt == "orbax":
        path = save_checkpoint_orbax(
            state, checkpoint_dir / f"step_{step:05d}.orbax")
    else:
        path = checkpoint_dir / f"step_{step:05d}.msgpack"
        save_checkpoint(state, path)
    meta = checkpoint_metadata(state, path, config)
    meta["step"] = step
    meta["format"] = fmt
    sidecar = checkpoint_dir / f"step_{step:05d}.metadata.json"
    sidecar.write_text(json.dumps(meta, indent=2))
    return path


# ============================================================================
# Validation (reference utils.py:226-367)
# ============================================================================


def validate_checkpoint_file(path: Path | str) -> tuple[bool, str]:
    """Cheap integrity checks: exists, min size, msgpack header parse."""
    path = Path(path)
    if not path.exists():
        return False, "file does not exist"
    if path.is_dir():  # orbax directory checkpoint
        has_payload = any(path.rglob("*"))
        return (has_payload, "ok" if has_payload else "empty orbax dir")
    if path.stat().st_size < MIN_CHECKPOINT_BYTES:
        return False, f"file too small ({path.stat().st_size} bytes)"
    try:
        serialization.msgpack_restore(path.read_bytes())
    except Exception as exc:  # corrupted payload
        return False, f"msgpack decode failed: {exc}"
    return True, "ok"


def validate_checkpoint_structure(path: Path | str, template) -> tuple[bool, str]:
    """Deep check: deserialises into the template (shape + dtype match)."""
    ok, reason = validate_checkpoint_file(path)
    if not ok:
        return ok, reason
    try:
        if Path(path).is_dir():
            load_checkpoint_orbax(path, template)
        else:
            load_checkpoint(path, template)
    except Exception as exc:
        return False, f"structure mismatch: {exc}"
    return True, "ok"


def validate_config_compatibility(checkpoint_path: Path | str,
                                  config: Any) -> tuple[bool, str]:
    """Compare the sidecar's stored config hash (reference utils.py:317-367)."""
    sidecar = Path(str(checkpoint_path).replace(".msgpack", ".metadata.json"))
    if not sidecar.exists():
        return True, "no metadata sidecar; skipping compatibility check"
    try:
        stored = json.loads(sidecar.read_text()).get("config_hash")
    except Exception as exc:
        return True, f"unreadable sidecar ({exc}); skipping"
    current = config_hash(config)
    if stored and current and stored != current:
        return False, "config hash mismatch (training config changed)"
    return True, "ok"


# ============================================================================
# Discovery / retention / resume
# ============================================================================


def get_checkpoint_step(path: Path | str) -> int | None:
    match = CHECKPOINT_RE.search(str(path))
    return int(match.group(1)) if match else None


def list_checkpoints(checkpoint_dir: Path | str) -> list[Path]:
    """All checkpoints (msgpack files + orbax dirs) sorted by step."""
    checkpoint_dir = Path(checkpoint_dir)
    if not checkpoint_dir.exists():
        return []
    found = [p for pattern in ("step_*.msgpack", "step_*.orbax")
             for p in checkpoint_dir.glob(pattern)
             if get_checkpoint_step(p) is not None]
    return sorted(found, key=get_checkpoint_step)


def find_latest_checkpoint(checkpoint_dir: Path | str) -> Path | None:
    checkpoints = list_checkpoints(checkpoint_dir)
    return checkpoints[-1] if checkpoints else None


def find_valid_checkpoint(checkpoint_dir: Path | str,
                          template=None) -> Path | None:
    """Newest checkpoint passing validation, skipping corrupted files
    (reference utils.py:589-629)."""
    for path in reversed(list_checkpoints(checkpoint_dir)):
        if template is not None:
            ok, reason = validate_checkpoint_structure(path, template)
        else:
            ok, reason = validate_checkpoint_file(path)
        if ok:
            return path
        print(f"Skipping invalid checkpoint {path.name}: {reason}")
    return None


def cleanup_old_checkpoints(checkpoint_dir: Path | str,
                            max_to_keep: int | None,
                            keep_final: bool = True,
                            final_step: int | None = None) -> list[Path]:
    """Delete oldest checkpoints beyond the retention budget
    (reference utils.py:718-783). Returns the deleted paths."""
    if max_to_keep is None:
        return []
    checkpoints = list_checkpoints(checkpoint_dir)
    protected = set()
    if keep_final and final_step is not None:
        protected = {p for p in checkpoints
                     if get_checkpoint_step(p) == final_step}
    deletable = [p for p in checkpoints if p not in protected]
    excess = len(checkpoints) - max_to_keep
    deleted = []
    for path in deletable:
        if excess <= 0:
            break
        if path.is_dir():
            import shutil
            shutil.rmtree(path, ignore_errors=True)
        else:
            path.unlink(missing_ok=True)
        stem = path.name.rsplit(".", 1)[0]
        (path.parent / f"{stem}.metadata.json").unlink(missing_ok=True)
        deleted.append(path)
        excess -= 1
    return deleted


def load_checkpoint_and_resume(checkpoint_dir: Path | str, template
                               ) -> tuple[Any, int] | None:
    """Restore the newest valid checkpoint; returns (state, start_step) or
    None (reference utils.py:632-686)."""
    path = find_valid_checkpoint(checkpoint_dir, template)
    if path is None:
        return None
    if path.is_dir():
        state = load_checkpoint_orbax(path, template)
    else:
        state = load_checkpoint(path, template)
    step = get_checkpoint_step(path)
    return state, (step if step is not None else int(state.step))
