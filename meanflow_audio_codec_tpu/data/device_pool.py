"""Device-resident replay pool: decouple training from the host link.

Motivation (measured on the axon v5e tunnel): host->device transfers run
at ~25-35 MB/s, while one high-MFU train step consumes ~4 MB of raw audio
— shipping every batch makes training transfer-bound at ~5x the compute
time. The reference never faced this (single local device, tiny models,
eager steps: datasets feed straight into jnp.asarray, trainers/train.py:334).

TPU-native answer: keep a pool of P clips resident in HBM.

  * ``sample(key, k, batch)`` gathers a [k, batch, ...] training chunk from
    the pool entirely on-device (one tiny index transfer per call).
  * ``refresh()`` overwrites one pool slot-group with a fresh host batch,
    quantized to int16 for the wire (2x fewer bytes; exactly the PCM
    precision real WAV corpora have) and dequantized in-graph by a jitted
    donated scatter. Transfers ride JAX's async dispatch, so they overlap
    device compute instead of serializing with it.

Over a long run the model still sees unbounded data diversity — the pool
is a sliding window over the stream, not a fixed dataset; slots turn over
every P/B refreshes.
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

#: int16 wire format: symmetric full-scale at this amplitude. Audio is
#: nominally in [-1, 1]; synthetic mixtures can slightly exceed it, so
#: leave ~10% headroom before the clip.
WIRE_SCALE = 1.1


@partial(jax.jit, donate_argnums=0)
def _scatter_refresh(pool: jnp.ndarray, wire: jnp.ndarray,
                     start: jnp.ndarray) -> jnp.ndarray:
    """pool[start:start+B] = dequantize(wire), with the pool buffer donated."""
    fresh = wire.astype(jnp.float32) * (WIRE_SCALE / 32767.0)
    return jax.lax.dynamic_update_slice_in_dim(pool, fresh, start, axis=0)


@partial(jax.jit, static_argnums=(2, 3))
def _gather_chunk(pool: jnp.ndarray, idx: jnp.ndarray,
                  k: int, batch: int) -> jnp.ndarray:
    return pool[idx].reshape((k, batch) + pool.shape[1:])


def _quantize(batch: np.ndarray) -> np.ndarray:
    return np.clip(batch * (32767.0 / WIRE_SCALE),
                   -32767.0, 32767.0).astype(np.int16)


class DeviceReplayPool:
    """HBM-resident clip pool fed by a host batch iterator.

    ``source`` yields [B, ...] float32 batches (any audio pipeline). The
    pool holds ``pool_clips`` examples (rounded up to a multiple of B).
    """

    def __init__(self, source: Iterator[np.ndarray], pool_clips: int = 1024,
                 seed: int = 0, prefetch: int = 2):
        self._source = source
        first = np.asarray(next(source))
        self._batch = first.shape[0]
        n_batches = max(2, -(-pool_clips // self._batch))
        host = [first] + [np.asarray(next(source))
                          for _ in range(n_batches - 1)]
        # one quantized bulk upload (half the bytes of f32 at PCM fidelity)
        wire = jnp.asarray(_quantize(np.concatenate(host, axis=0)))
        self.pool = jax.jit(
            lambda w: w.astype(jnp.float32) * (WIRE_SCALE / 32767.0))(wire)
        self.pool_size = int(self.pool.shape[0])
        self._rng = np.random.default_rng(seed)
        self._slot = 0
        self.skipped_refreshes = 0  # empty-queue refresh skips (run logs)
        # Background producer: pre-synthesize + quantize the next batches so
        # refresh() never pays the host synth on the training thread (the
        # single-step trainer path calls refresh every step). The queue
        # preserves source order, so consumption stays deterministic.
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._produce, daemon=True,
                                        name="DeviceReplayPool-producer")
        self._thread.start()

    def _produce(self) -> None:
        try:
            while not self._stop.is_set():
                wire = _quantize(np.asarray(next(self._source)))
                while not self._stop.is_set():
                    try:
                        self._queue.put(wire, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except StopIteration:
            self._queue.put(None)
        except BaseException as exc:  # surface on the training thread
            self._error = exc
            self._queue.put(None)

    def close(self) -> None:
        """Stop the producer thread (idempotent)."""
        self._stop.set()
        try:  # unblock a producer stuck on a full queue
            self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)

    def sample(self, k: int, batch: int) -> jnp.ndarray:
        """[k, batch, ...] training chunk gathered on-device."""
        idx = jnp.asarray(self._rng.integers(0, self.pool_size,
                                             size=k * batch, dtype=np.int32))
        return _gather_chunk(self.pool, idx, k, batch)

    def refresh(self, wait: bool = False) -> bool:
        """Overwrite the next slot-group with a pre-produced host batch.

        The producer thread keeps ``prefetch`` quantized batches ready, so
        this call only issues the (async) int16 transfer and the jitted
        donated scatter — no host synthesis on the training thread.

        Non-blocking by default (the round-5 disk-corpus fix): when the
        producer is slower than the step loop (FLAC decode of an on-disk
        corpus — the corpus rehearsal measured p99 8.4 s / max 72 s step
        stalls from the old blocking get), an empty queue SKIPS the
        refresh instead of stalling the jitted step; the pool keeps
        replaying resident clips and slots turn over at whatever rate the
        decoder sustains. Returns True when a slot-group was refreshed.
        ``wait=True`` restores the blocking behavior (deterministic tests,
        priming). ``skipped_refreshes`` counts the skips for run logs.
        """
        try:
            wire_np = (self._queue.get() if wait
                       else self._queue.get_nowait())
        except queue.Empty:
            self.skipped_refreshes += 1
            return False
        if wire_np is None:
            if self._error is not None:
                raise self._error
            return False  # source exhausted: pool replays resident clips
        wire = jnp.asarray(wire_np)  # async transfer, int16
        start = jnp.int32(self._slot)
        self.pool = _scatter_refresh(self.pool, wire, start)
        # pool_size is a whole number of source batches, so slots tile it
        self._slot = (self._slot + wire_np.shape[0]) % self.pool_size
        return True


class MeshDeviceReplayPool:
    """Replay pool sharded over a mesh's data axis — the multi-chip pool.

    Layout: the [P, ...] clip pool lives partitioned ``P('data')`` so each
    of the n_d data-parallel devices owns an independent P/n_d-clip
    sub-pool fed a disjoint slice of the host stream. Both hot paths are
    ``shard_map``-local by construction:

      * ``sample(k, batch)`` draws per-device local indices on the host and
        gathers inside shard_map — every device reads only its own HBM, so
        no collective (and no cross-chip byte) ever touches the replay
        path; the result lands pre-sharded ``P(None, 'data')`` exactly as
        the sharded train step consumes it.
      * ``refresh()`` splits one host batch into n_d equal slices and
        scatters each into its sub-pool at the same local slot (donated
        buffers, int16 wire).

    Divisibility contract (enforced): the source batch and the training
    batch are multiples of the data-axis size — the same condition the
    sharded trainer already requires of ``config.batch_size``.
    """

    def __init__(self, source: Iterator[np.ndarray], mesh,
                 pool_clips: int = 1024, seed: int = 0, prefetch: int = 2,
                 data_axis: str = "data"):
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._mesh = mesh
        self._axis = data_axis
        nd = mesh.shape[data_axis]
        self.data_size = nd
        first = np.asarray(next(source))
        if first.shape[0] % nd:
            raise ValueError(
                f"source batch {first.shape[0]} not divisible by data-axis "
                f"size {nd}")
        self._batch = first.shape[0]
        n_batches = max(2, -(-pool_clips // self._batch))
        host = [first] + [np.asarray(next(source))
                          for _ in range(n_batches - 1)]
        sharding = NamedSharding(mesh, P(data_axis))
        wire = jax.device_put(_quantize(np.concatenate(host, axis=0)),
                              sharding)
        self.pool = jax.jit(
            lambda w: w.astype(jnp.float32) * (WIRE_SCALE / 32767.0),
            out_shardings=sharding)(wire)
        self.pool_size = int(self.pool.shape[0])
        self.local_size = self.pool_size // nd
        self._rng = np.random.default_rng(seed)
        self._local_slot = 0
        self.skipped_refreshes = 0  # empty-queue refresh skips (run logs)

        spec_pool = P(data_axis)

        def _local_scatter(pool, wire, start):
            fresh = wire.astype(jnp.float32) * (WIRE_SCALE / 32767.0)
            return jax.lax.dynamic_update_slice_in_dim(
                pool, fresh, start[0], axis=0)

        self._scatter = jax.jit(
            jax.shard_map(
                _local_scatter, mesh=mesh,
                in_specs=(spec_pool, spec_pool, spec_pool),
                out_specs=spec_pool),
            donate_argnums=0)
        self._gather_cache: dict = {}

        self._queue: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._error: BaseException | None = None
        self._source = source
        self._thread = threading.Thread(target=self._produce, daemon=True,
                                        name="MeshDeviceReplayPool-producer")
        self._thread.start()

    def _gather(self, k: int, per_dev: int):
        """Jitted per-shape local gather, cached on (k, per_dev)."""
        fn = self._gather_cache.get((k, per_dev))
        if fn is None:
            from jax.sharding import PartitionSpec as P

            def _local_gather(pool, idx):
                # pool [P/nd, ...]; idx [1, k*per_dev] local indices
                rows = pool[idx[0]]
                return rows.reshape((k, per_dev) + pool.shape[1:])

            fn = jax.jit(jax.shard_map(
                _local_gather, mesh=self._mesh,
                in_specs=(P(self._axis), P(self._axis, None)),
                out_specs=P(None, self._axis)))
            self._gather_cache[(k, per_dev)] = fn
        return fn

    _produce = DeviceReplayPool._produce
    close = DeviceReplayPool.close

    def sample(self, k: int, batch: int) -> jnp.ndarray:
        """[k, batch, ...] chunk, pre-sharded P(None, 'data') on the mesh."""
        if batch % self.data_size:
            raise ValueError(
                f"batch {batch} not divisible by data-axis size {self.data_size}")
        per_dev = batch // self.data_size
        idx = np.asarray(self._rng.integers(
            0, self.local_size, size=(self.data_size, k * per_dev),
            dtype=np.int32))
        from jax.sharding import NamedSharding, PartitionSpec as P
        idx = jax.device_put(
            idx, NamedSharding(self._mesh, P(self._axis, None)))
        return self._gather(k, per_dev)(self.pool, idx)

    def refresh(self, wait: bool = False) -> bool:
        """Scatter one pre-produced host batch, B/n_d clips per sub-pool.

        Same non-blocking contract as :meth:`DeviceReplayPool.refresh`:
        an empty producer queue skips (returns False) instead of stalling
        the sharded step."""
        try:
            wire_np = (self._queue.get() if wait
                       else self._queue.get_nowait())
        except queue.Empty:
            self.skipped_refreshes += 1
            return False
        if wire_np is None:
            if self._error is not None:
                raise self._error
            return False
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(self._mesh, P(self._axis))
        wire = jax.device_put(wire_np, sharding)
        start = jax.device_put(
            np.full((self.data_size,), self._local_slot, np.int32), sharding)
        self.pool = self._scatter(self.pool, wire, start)
        self._local_slot = ((self._local_slot + wire_np.shape[0] // self.data_size)
                            % self.local_size)
        return True
