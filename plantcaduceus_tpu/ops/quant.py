"""Weight-int8 / dynamic-activation-int8 projections for inference.

The v5e MXU runs int8xint8->int32 ~1.5x faster than bf16 at the mixer
projection shapes (measured: 237 vs 156 TOPS on [131072, 1024]x[1024, 2048]),
and at l28/l32 the in/z/out projections are the non-scan share of the
forward. This module provides the opt-in quantized path the scoring engine
exposes as ``-dtype int8``:

* weights: per-output-channel symmetric int8 (scale = amax/127 over the
  reduction axis), quantized once at engine setup,
* activations: dynamic per-tensor symmetric int8 (one amax pass per call),
* accumulation in int32 on the MXU, rescaled to f32 with sx * sw.

Opt-in only: zero-shot scores are softmax-ratio statistics at one position
and tolerate the quantization noise well (tested: Spearman > 0.99 vs the
bf16 scores on random models), but bit-parity with the reference is the
default, so bf16 stays the standard path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array, reduce_axis: int = 0
                    ) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8. ``reduce_axis`` is the
    contraction axis; the scale broadcasts over the remaining axes.

    Returns (w8 int8, scale f32 with reduce_axis collapsed to size 1)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=reduce_axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def quantize_activation(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-tensor symmetric int8: one amax over the whole tensor
    (per-row scales would add a second elementwise pass for <0.1% accuracy
    at these distributions)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def int8_dense(x: jax.Array, w8: jax.Array, w_scale: jax.Array,
               out_dtype=jnp.float32) -> jax.Array:
    """y = x @ dequant(w8): int8 MXU matmul with f32 rescale.

    x: [..., d_in]; w8: [d_in, d_out] int8; w_scale: [1, d_out] f32."""
    x8, sx = quantize_activation(x)
    lead = x8.shape[:-1]
    y32 = jax.lax.dot_general(
        x8.reshape(-1, x8.shape[-1]), w8,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = y32.astype(jnp.float32) * (sx * w_scale)
    return y.reshape(*lead, w8.shape[-1]).astype(out_dtype)


def quantize_block_projections(blocks: dict) -> dict:
    """Replace the mixer's big projection leaves (in_proj_x / in_proj_z /
    out_proj, stacked [L, Gio, in, out]) with int8 + scale pairs. The model
    branches on the presence of the ``_q8`` leaves (static pytree
    structure), so one compiled forward serves each mode."""
    out = dict(blocks)
    for name in ("in_proj_x", "in_proj_z", "out_proj"):
        if name not in blocks:
            continue
        w = blocks[name]                      # [L, Gio, in, out]
        w8, scale = quantize_weight(w, reduce_axis=2)
        del out[name]
        out[name + "_q8"] = w8
        out[name + "_scale"] = scale          # [L, Gio, 1, out]
    return out
