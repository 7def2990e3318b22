"""Device-resident replay pool: gather/refresh semantics on the CPU mesh."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from meanflow_audio_codec_tpu.data.device_pool import (
    WIRE_SCALE,
    DeviceReplayPool,
    MeshDeviceReplayPool,
)
from meanflow_audio_codec_tpu.parallel import create_mesh


def counting_source(batch=4, shape=(16, 2)):
    i = 0
    while True:
        yield np.full((batch,) + shape, float(i), np.float32) * 0.01
        i += 1


def test_pool_fill_and_sample_shapes():
    pool = DeviceReplayPool(counting_source(), pool_clips=12, seed=0)
    assert pool.pool_size == 12  # 3 batches of 4
    chunk = pool.sample(k=2, batch=4)
    assert chunk.shape == (2, 4, 16, 2)
    # every sampled clip carries one of the filled batch values (0..2)*0.01
    vals = np.unique(np.asarray(chunk, dtype=np.float64))
    expected = np.array([0.0, 0.01, 0.02])
    assert all(np.isclose(expected, v, atol=1e-4).any() for v in vals)


def test_pool_refresh_rotates_slots():
    pool = DeviceReplayPool(counting_source(), pool_clips=8, seed=0)
    for _ in range(2):
        assert pool.refresh(wait=True)
    arr = np.asarray(pool.pool, dtype=np.float64)
    # slots 0..7 now hold batches 2 and 3 (values 0.02, 0.03)
    vals = np.unique(arr)
    assert np.isclose(vals, 0.02, atol=1e-4).any()
    assert np.isclose(vals, 0.03, atol=1e-4).any()
    assert pool._slot == 0  # wrapped around the 8-clip pool


def test_pool_quantization_fidelity():
    """int16 wire adds only PCM-level error (< 1e-4 at WIRE_SCALE 1.1)."""
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, size=(4, 32, 2)).astype(np.float32)

    def src():
        while True:
            yield data

    pool = DeviceReplayPool(src(), pool_clips=8, seed=0)
    got = np.asarray(pool.pool)[:4]
    assert np.abs(got - data).max() < WIRE_SCALE / 32767.0 + 1e-7


def test_mesh_pool_shards_and_samples(capsys):
    mesh = create_mesh(data=4, model=2)
    pool = MeshDeviceReplayPool(counting_source(batch=8), mesh,
                                pool_clips=16, seed=0)
    assert pool.pool_size == 16 and pool.local_size == 4
    # pool lives partitioned over the data axis
    spec = pool.pool.sharding.spec
    assert spec == P("data")
    chunk = pool.sample(k=3, batch=8)
    assert chunk.shape == (3, 8, 16, 2)
    # sampled output is pre-sharded [k, batch-over-data]
    assert chunk.sharding.spec == P(None, "data")
    vals = np.unique(np.asarray(chunk, dtype=np.float64))
    expected = np.array([0.0, 0.01])  # two filled batches (values 0, 0.01)
    assert all(np.isclose(expected, v, atol=1e-4).any() for v in vals)


def test_mesh_pool_refresh_rotates_local_slots():
    mesh = create_mesh(data=4, model=2)
    pool = MeshDeviceReplayPool(counting_source(batch=8), mesh,
                                pool_clips=16, seed=0)
    for _ in range(2):  # two refreshes: batches 2 and 3 fill all 16 slots
        assert pool.refresh(wait=True)
    arr = np.asarray(pool.pool, dtype=np.float64)
    vals = np.unique(arr)
    assert np.isclose(vals, 0.02, atol=1e-4).any()
    assert np.isclose(vals, 0.03, atol=1e-4).any()
    assert pool._local_slot == 0  # wrapped: 2 refreshes x 2 clips = local 4
    pool.close()


def test_mesh_pool_rejects_indivisible_batch():
    mesh = create_mesh(data=4, model=2)
    pool = MeshDeviceReplayPool(counting_source(batch=8), mesh,
                                pool_clips=16, seed=0)
    try:
        pool.sample(k=1, batch=6)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_refresh_nonblocking_skips_on_slow_producer():
    """Disk-corpus fix (VERDICT r4 item 5): a producer slower than the
    step loop must never stall refresh() — the default non-blocking call
    skips, counts it, and the pool keeps serving resident clips."""
    import time

    def slow_source():
        yield np.zeros((4, 16, 2), np.float32)   # pool priming x3
        yield np.zeros((4, 16, 2), np.float32)
        yield np.zeros((4, 16, 2), np.float32)
        while True:
            time.sleep(30.0)                      # decoder "stall"
            yield np.zeros((4, 16, 2), np.float32)

    pool = DeviceReplayPool(slow_source(), pool_clips=8, seed=0)
    # drain whatever the producer prefetched before it hit the stall
    deadline = time.monotonic() + 5.0
    while pool.refresh() and time.monotonic() < deadline:
        pass
    t0 = time.monotonic()
    assert pool.refresh() is False               # queue empty: skip
    assert time.monotonic() - t0 < 1.0           # ... without blocking
    assert pool.skipped_refreshes >= 1
    chunk = pool.sample(k=1, batch=4)            # pool still serves
    assert chunk.shape == (1, 4, 16, 2)
    pool.close()
