"""Test configuration: pin JAX to a virtual 8-device CPU mesh.

The axon site hook forces JAX_PLATFORMS=axon (one real TPU); tests must be
hermetic and exercise multi-device sharding, so we switch the platform to
CPU *via jax.config* (env vars are clobbered by sitecustomize) and ask XLA
for 8 host devices before any backend initialises.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
