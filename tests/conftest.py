"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Mirrors the reference CI (CPU-only, see reference ``SURVEY.md`` section 4)
while letting sharding tests exercise a multi-device mesh.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
import jax

jax.config.update("jax_platforms", "cpu")
