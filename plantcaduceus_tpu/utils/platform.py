"""Platform selection helper.

This environment preloads jax with the TPU platform via sitecustomize, so
``JAX_PLATFORMS`` mutations inside our processes are too late. Backends
initialise lazily though, so ``jax.config.update('jax_platforms', ...)``
still works before the first array op. CLIs call
:func:`maybe_force_platform` first thing; set ``PCAD_PLATFORM=cpu`` to run
any workload on the host CPU (e.g. funcional checks without a TPU)."""

from __future__ import annotations

import os

import jax


def maybe_force_platform() -> None:
    plat = os.environ.get("PCAD_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
