"""Test harness: force CPU JAX with 8 virtual devices (SURVEY.md §4.4).

This is the JAX-idiomatic "fake backend": all jitted code must run on CPU,
and multi-chip stream sharding is exercised on a virtual 8-device host mesh —
no TPU pod required.  Environment variables must be set before jax imports.
"""

import os
import sys

# Force CPU even when the shell pre-sets a TPU platform (e.g. axon): the
# unit suite is the fake-backend tier and must not depend on real chips.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin's sitecustomize prepends "axon" to jax_platforms even
# when the env asks for cpu; pin the config explicitly after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
