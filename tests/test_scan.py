"""Selective-scan implementations vs the fp64 golden recurrence."""

import jax.numpy as jnp
import numpy as np
import pytest

from plantcaduceus_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_associative,
    selective_scan_sequential,
)
from tests import golden


def make_inputs(rng, G=2, B=3, L=64, D=8, N=4):
    x = rng.standard_normal((G, B, L, D))
    dt = rng.standard_normal((G, B, L, D)) * 0.5 - 1.0
    A = -np.exp(rng.standard_normal((G, D, N)) * 0.5)
    Bm = rng.standard_normal((G, B, L, N))
    Cm = rng.standard_normal((G, B, L, N))
    Ds = rng.standard_normal((G, D))
    dtb = rng.standard_normal((G, D)) * 0.3
    return x, dt, A, Bm, Cm, Ds, dtb


def golden_scan(x, dt, A, Bm, Cm, Ds, dtb):
    G, B, L, D = x.shape
    y = np.zeros_like(x)
    for g in range(G):
        for b in range(B):
            y[g, b] = golden.selective_scan_ref(
                x[g, b], dt[g, b], A[g], Bm[g, b], Cm[g, b], Ds[g], dtb[g]
            )
    return y


@pytest.mark.parametrize("impl", [selective_scan_sequential, selective_scan_associative])
def test_scan_matches_golden(rng, impl):
    inputs = make_inputs(rng)
    want = golden_scan(*inputs)
    x, dt, A, Bm, Cm, Ds, dtb = (jnp.asarray(v, jnp.float32) for v in inputs)
    got = impl(x, dt, A, Bm, Cm, Ds, dt_bias=dtb)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_impls_agree_long(rng):
    inputs = make_inputs(rng, G=1, B=2, L=512, D=16, N=16)
    args = tuple(jnp.asarray(v, jnp.float32) for v in inputs)
    a = selective_scan_sequential(*args[:6], dt_bias=args[6])
    b = selective_scan_associative(*args[:6], dt_bias=args[6])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_dispatch(rng):
    inputs = make_inputs(rng, G=1, B=1, L=16, D=4, N=2)
    args = tuple(jnp.asarray(v, jnp.float32) for v in inputs)
    y = selective_scan(*args[:6], dt_bias=args[6], impl="sequential")
    assert y.shape == args[0].shape


def test_scan_grads_finite(rng):
    import jax

    inputs = make_inputs(rng, G=2, B=2, L=32, D=4, N=4)
    args = tuple(jnp.asarray(v, jnp.float32) for v in inputs)

    def loss(x, dt, A, Bm, Cm, Ds, dtb):
        return jnp.sum(
            selective_scan_associative(x, dt, A, Bm, Cm, Ds, dt_bias=dtb) ** 2
        )

    grads = jax.grad(loss, argnums=tuple(range(7)))(*args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
