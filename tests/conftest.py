"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any jax import (pytest loads conftest first). Device-side
code paths are validated on the virtual mesh; the driver separately
dry-runs the multi-chip path and benchmarks on real TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
