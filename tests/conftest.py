"""Test configuration: run JAX on a virtual 8-device CPU mesh with x64.

Real-TPU behavior is exercised separately by bench.py and the driver's
compile checks; unit tests want determinism, float64 (for golden-value
parity with the float64 reference), and multi-device sharding coverage.

NOTE: this environment force-registers a TPU ("axon") backend from
sitecustomize and pins JAX_PLATFORMS=axon, so plain env vars are not
enough — we must flip jax_platforms *after* importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
