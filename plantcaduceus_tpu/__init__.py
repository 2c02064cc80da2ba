"""plantcaduceus_tpu — a TPU-native plant DNA language-model framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
kuleshov-group/PlantCaduceus (see /root/reference): the Caduceus architecture
(bidirectional, reverse-complement-equivariant Mamba SSM over nucleotide
windows) plus its application suite — zero-shot variant-effect scoring,
embedding extraction for XGBoost classifiers, LoRA fine-tuning, and masked-LM
pre-training — designed TPU-first (SPMD meshes, pjit, Pallas kernels) rather
than ported from the reference's CUDA/torch stack.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: full-model compiles go through a slow
# remote-compile tunnel in this environment (~4 min for l20 at batch 128);
# the cache makes every subsequent process start in seconds. Opt out with
# PCAD_NO_COMPILE_CACHE=1.
#
# CPU-platform processes (tests, the virtual-mesh tools) do NOT enable the
# cache: XLA:CPU AOT entries on this jax version don't round-trip even on
# the machine that wrote them (the serialized target config bakes in
# codegen options — prefer-no-scatter/gather — that the loader's
# host-feature check rejects), so every load is a logged
# "machine-feature mismatch" error plus a full recompile: pure cost. This
# also stops CPU entries poisoning the shared dir across the rotating
# hosts here (~/.cache persists between machines — the mismatch spew is
# what drowned the round-4 driver bench). TPU executables are
# host-independent; they stay cached and carry across machines.
if not _os.environ.get("PCAD_NO_COMPILE_CACHE") and \
        _os.environ.get("PCAD_PLATFORM", "") != "cpu":
    _cache_dir = _os.environ.get(
        "PCAD_COMPILE_CACHE_DIR",
        _os.path.expanduser("~/.cache/plantcaduceus_tpu/xla"))
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plantcaduceus_tpu.models.config import CaduceusConfig  # noqa: F401
