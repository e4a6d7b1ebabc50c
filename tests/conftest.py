"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware, mirroring the
reference's rank-count-independent chunk tests (SURVEY.md section 4:
num_chunks > 1 in serial exercises the full connection path).

Note: the ambient JAX_PLATFORMS=axon (TPU tunnel) wins over env overrides, so
we force the platform through jax.config before any test imports jax arrays.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
