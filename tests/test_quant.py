"""int8 matmul primitives (ops/quant.py — the model-level path was measured
and removed; see the module docstring for the experiment record)."""

import jax.numpy as jnp
import numpy as np

from plantcaduceus_tpu.ops import quant


def test_weight_quant_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    w8, scale = quant.quantize_weight(w, reduce_axis=0)
    assert w8.dtype == jnp.int8 and scale.shape == (1, 32)
    deq = w8.astype(jnp.float32) * scale
    # symmetric rounding: error <= scale/2 elementwise
    assert float(jnp.max(jnp.abs(deq - w) / scale)) <= 0.5 + 1e-6


def test_int8_dense_close_to_f32(rng):
    x = jnp.asarray(rng.standard_normal((8, 16, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 48)) * 0.1, jnp.float32)
    w8, sw = quant.quantize_weight(w, reduce_axis=0)
    got = quant.int8_dense(x, w8, sw)
    want = x @ w
    # int8 x int8 over 64-deep contractions: ~1% relative error
    err = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert err < 0.02, err
    assert got.shape == (8, 16, 48)


def test_int8_dense_static_matches_dynamic_at_same_scale(rng):
    """With a_scale set to this tensor's amax/127, the static kernel must
    reproduce the dynamic kernel bit-for-bit (same quantize, same rescale)."""
    x = jnp.asarray(rng.standard_normal((4, 8, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, jnp.float32)
    w8, sw = quant.quantize_weight(w, reduce_axis=0)
    a_scale = jnp.max(jnp.abs(x)) / 127.0
    np.testing.assert_array_equal(
        np.asarray(quant.int8_dense_static(x, w8, sw, a_scale)),
        np.asarray(quant.int8_dense(x, w8, sw)))


def test_int8_dense_static_saturates_gracefully(rng):
    """Activations past the calibrated range clip to ±127 instead of
    wrapping; the result stays close to f32 when only a few values clip."""
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    x = x.at[0, 0].set(50.0)  # single outlier far past the others
    w = jnp.asarray(rng.standard_normal((64, 16)) * 0.1, jnp.float32)
    w8, sw = quant.quantize_weight(w, reduce_axis=0)
    # calibrate as if the outlier were absent
    a_scale = jnp.max(jnp.abs(x[1:])) / 127.0
    got = np.asarray(quant.int8_dense_static(x, w8, sw, a_scale))
    assert np.isfinite(got).all()
    want = np.asarray(x[1:] @ w)
    err = np.linalg.norm(got[1:] - want) / np.linalg.norm(want)
    assert err < 0.02, err
