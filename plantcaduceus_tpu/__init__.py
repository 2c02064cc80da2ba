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
# CPU-backend processes (tests, the virtual-mesh tools) get a cache dir
# scoped by a host fingerprint: XLA:CPU AOT entries bake in the compiling
# host's CPU features but the cache key does NOT cover them, so entries
# written on one machine poison another's run with per-entry
# "machine-feature mismatch" errors + full recompiles (~/.cache persists
# across the rotating hosts here — this is what drowned the round-4 driver
# bench). TPU executables have no such host dependence; they stay in the
# shared dir so a warmed cache carries across machines.
if not _os.environ.get("PCAD_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "PCAD_COMPILE_CACHE_DIR",
        _os.path.expanduser("~/.cache/plantcaduceus_tpu/xla"))
    if _os.environ.get("PCAD_PLATFORM", "") == "cpu":
        import hashlib as _hashlib

        try:
            with open("/proc/cpuinfo") as _fh:
                _flags = next((ln for ln in _fh if ln.startswith("flags")), "")
        except OSError:
            _flags = ""
        _host = _hashlib.md5(_flags.encode()).hexdigest()[:10]
        _cache_dir = _os.path.join(_cache_dir + "-cpu", _host)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from plantcaduceus_tpu.models.config import CaduceusConfig  # noqa: F401
