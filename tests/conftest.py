"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

This environment's sitecustomize registers the axon TPU plugin and sets
JAX_PLATFORMS=axon before any user code runs, so env vars alone are not
enough -- we must update the jax config explicitly. XLA_FLAGS still has
to be set before the CPU backend is created.

Device-side code paths are validated on the virtual mesh; the driver
separately dry-runs the multi-chip path and benchmarks on real TPU.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

from finito_tpu.utils import relax_cpu_collective_timeouts
relax_cpu_collective_timeouts()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
