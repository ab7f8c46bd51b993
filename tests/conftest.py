"""Test configuration: CPU backend with a virtual 8-device mesh.

Multi-device tests assert shard-count invariance of physics results — the
TPU analogue of the reference validating parallel correctness by identical
analytic errors under ``mpirun -np {1..8}`` (SURVEY.md §4).
"""

import os

# Must run before jax initializes. Tests always use the CPU backend with 8
# virtual devices (the TPU chip is reserved for bench.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (the TPU tunnel); the config update
# below overrides it reliably.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
