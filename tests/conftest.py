"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Per SURVEY.md §7 ("multi-host testing without a cluster"): CI tests run on the
CPU backend with a forced device count so the distributed (shard_map) code
paths execute real multi-shard semantics; TPU execution is exercised by
``bench.py`` and the driver's graft entry checks.
"""

import os

# Force the CPU backend even when the environment preselects the TPU platform
# (JAX backend selection is lazy, so this is effective as long as no jax
# computation ran before pytest imported this conftest).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_threefry_partitionable", True)
