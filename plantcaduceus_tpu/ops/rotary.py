"""Rotary position embeddings with context-extension scaling.

The reference's long-context machinery for attention baselines
(pretrain/llmlib/architectures/modules/attention/rotary_embeddings.py):
Position Interpolation, NTK-aware scaling, and YaRN. Functional JAX
implementations producing (cos, sin) tables plus the apply helper.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def rope_frequencies(head_dim: int, base: float = 10000.0) -> jax.Array:
    """Standard RoPE inverse frequencies [head_dim/2]."""
    return 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                           / head_dim))


def rope_tables(seq_len: int, head_dim: int, base: float = 10000.0,
                scaling: str = "none", scale: float = 1.0,
                original_max_len: int = 2048,
                yarn_beta_fast: float = 32.0, yarn_beta_slow: float = 1.0,
                yarn_attn_factor: float = 1.0,
                ) -> Tuple[jax.Array, jax.Array]:
    """(cos, sin) tables [seq_len, head_dim/2].

    scaling:
      none        — vanilla RoPE
      interpolate — Position Interpolation: positions divided by ``scale``
      ntk         — NTK-aware: base multiplied by scale^(dim/(dim-2))
      yarn        — YaRN: per-frequency interpolation ramp between PI-scaled
                    and unscaled frequencies + attention temperature factor
    """
    positions = jnp.arange(seq_len, dtype=jnp.float32)
    inv = rope_frequencies(head_dim, base)
    mscale = 1.0

    if scaling == "none" or scale == 1.0:
        pass
    elif scaling == "interpolate":
        positions = positions / scale
    elif scaling == "ntk":
        base = base * scale ** (head_dim / (head_dim - 2))
        inv = rope_frequencies(head_dim, base)
    elif scaling == "yarn":
        # wavelength per frequency band (in tokens)
        wavelen = 2 * math.pi / inv
        # ramp: 0 where wavelength << context (high freq, keep), 1 where
        # wavelength >> context (low freq, interpolate)
        low = head_dim / 2 * jnp.log(original_max_len /
                                     (yarn_beta_fast * 2 * math.pi)) \
            / jnp.log(base)
        high = head_dim / 2 * jnp.log(original_max_len /
                                      (yarn_beta_slow * 2 * math.pi)) \
            / jnp.log(base)
        idx = jnp.arange(head_dim // 2, dtype=jnp.float32)
        ramp = jnp.clip((idx - low) / jnp.maximum(high - low, 1e-3), 0, 1)
        inv_interp = inv / scale
        inv = inv * (1 - ramp) + inv_interp * ramp
        # attention temperature (YaRN eq. 22): sqrt(1/t) ~ 0.1 ln(s) + 1
        mscale = (0.1 * math.log(scale) + 1.0) * yarn_attn_factor
    else:
        raise ValueError(f"unknown rope scaling {scaling!r}")

    angles = positions[:, None] * inv[None, :]
    return jnp.cos(angles) * mscale, jnp.sin(angles) * mscale


def apply_rotary(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs of channels. x: [..., L, H, head_dim]; tables [L, hd/2]."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos[:, None, :]
    s = sin[:, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
