"""Test harness: force the CPU backend with 8 virtual devices.

The environment preloads jax with a TPU platform via sitecustomize before
conftest runs, so JAX_PLATFORMS env mutation is too late — but backends
initialise lazily, so ``jax.config.update('jax_platforms', 'cpu')`` still
wins as long as it happens before any array op. The 8-device virtual CPU
mesh is the idiomatic JAX analogue of a fake distributed backend
(SURVEY.md §4): multi-chip sharding logic runs without a TPU pod.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Disables the persistent compile cache for the test run
# (plantcaduceus_tpu/__init__.py): XLA:CPU AOT entries don't round-trip
# (loader rejects the serialized codegen options), so caching them is a
# logged error + full recompile per entry — and test-written entries must
# never poison the shared TPU cache dir across the rotating hosts.
os.environ.setdefault("PCAD_PLATFORM", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
