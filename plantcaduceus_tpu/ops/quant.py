"""int8 matmul primitives — a measured, REJECTED model-level experiment.

The v5e MXU runs int8xint8->int32 ~1.5x faster than bf16 at the mixer
projection shapes (measured r3: a materialised [65536,1024]x[1024,2048]
dot incl. rescale-to-bf16 epilogue runs 1.65 ms int8 vs 2.48 ms bf16).
Two full int8 projection paths were built and benchmarked end-to-end on
the scoring engine across rounds:

* r2, dynamic per-tensor activation scales: l32 120 vs 138 win/s — the
  per-call amax reduction + quantize passes cost more HBM time than the
  MXU time saved.
* r3, static per-layer scales calibrated on the first real batch (the
  quantize becomes a producer-fused elementwise op; no amax pass): l28
  0.94x, l32 0.96x of bf16 — closer, still a loss. An isolated full-mixer
  A/B showed int8 winning only ~2.4% per layer: at these shapes the VPU
  selective scan dominates the mixer (Amdahl ceiling ~1.26x even with
  free projections), and the model-level residue never recovered the
  kernel-level win.

The engine/CLI path was therefore removed (VERDICT r2 #5: win or cut).
What remains here are the tested primitives (weight quant, static/dynamic
activation quant, int8 MXU matmul with fused rescale) for future hardware
where the MXU:VPU balance differs — e.g. the SSD variants' chunked-matmul
recurrence, where projections are a larger share of the forward.
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


def quantize_activation_static(x: jax.Array, a_scale: jax.Array) -> jax.Array:
    """Quantize with a pre-calibrated scale: one fused elementwise pass (no
    amax reduction — XLA folds it into the producer's epilogue). Values
    beyond the calibration range saturate at ±127, which symmetric int8
    tolerates (see :func:`calibrate`'s margin)."""
    xf = x.astype(jnp.float32)
    return jnp.clip(jnp.round(xf * (1.0 / a_scale)), -127, 127).astype(jnp.int8)


def int8_matmul(x8: jax.Array, w8: jax.Array, scale: jax.Array,
                out_dtype=jnp.float32) -> jax.Array:
    """[..., d_in] int8 @ [d_in, d_out] int8 -> int32 MXU accum, rescaled by
    ``scale`` (= a_scale * w_scale, broadcastable over the output) in the
    dot's epilogue."""
    lead = x8.shape[:-1]
    y32 = jax.lax.dot_general(
        x8.reshape(-1, x8.shape[-1]), w8,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    y = y32.astype(jnp.float32) * scale
    return y.reshape(*lead, w8.shape[-1]).astype(out_dtype)


def int8_dense_static(x: jax.Array, w8: jax.Array, w_scale: jax.Array,
                      a_scale: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """y = x @ dequant(w8) with a pre-calibrated activation scale.

    ``a_scale`` is a scalar (this layer's calibrated amax/127)."""
    return int8_matmul(quantize_activation_static(x, a_scale), w8,
                       a_scale * w_scale, out_dtype)


