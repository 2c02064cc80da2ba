"""Pallas SSD kernel (interpret mode on CPU) vs the XLA chunked SSD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from plantcaduceus_tpu.ops.pallas_ssd import ssd_pallas, supported
from plantcaduceus_tpu.ops.ssd import ssd_chunked


def make_inputs(rng, G=2, B=2, L=256, H=2, P=128, NG=1, N=128):
    x = rng.standard_normal((G, B, L, H, P)).astype(np.float32)
    dt = (rng.standard_normal((G, B, L, H)) * 0.5 - 1.0).astype(np.float32)
    A = -np.exp(rng.standard_normal((G, H)) * 0.5).astype(np.float32)
    Bm = rng.standard_normal((G, B, L, NG, N)).astype(np.float32)
    Cm = rng.standard_normal((G, B, L, NG, N)).astype(np.float32)
    Ds = rng.standard_normal((G, H)).astype(np.float32)
    dtb = (rng.standard_normal((G, H)) * 0.3).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (x, dt, A, Bm, Cm, Ds, dtb))


def test_supported_gate():
    assert supported((2, 1, 256, 2, 128), (1, 1, 1, 1, 128), 128)
    assert not supported((2, 1, 256, 2, 64), (1, 1, 1, 1, 128), 128)
    assert not supported((2, 1, 200, 2, 128), (1, 1, 1, 1, 128), 128)


@pytest.mark.parametrize("directions", [(False, False), (False, True)])
def test_kernel_matches_chunked(rng, directions):
    args = make_inputs(rng)
    want = ssd_chunked(*args[:6], dt_bias=args[6], chunk=128,
                       directions=directions)
    with pltpu.force_tpu_interpret_mode():
        got = ssd_pallas(*args[:6], dt_bias=args[6], chunk=128,
                         directions=directions)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_kernel_grads_match_chunked(rng):
    args = make_inputs(rng, B=1, L=256)
    seed = jnp.asarray(
        np.random.default_rng(1).standard_normal(args[0].shape), jnp.float32)

    def loss(fn):
        def f(x, dt, Bm, Cm):
            return jnp.sum(fn(x, dt, args[2], Bm, Cm, args[5],
                              dt_bias=args[6], chunk=128,
                              directions=(False, True)) * seed)
        return f

    gw = jax.grad(loss(ssd_chunked), argnums=(0, 1, 2, 3))(
        args[0], args[1], args[3], args[4])
    with pltpu.force_tpu_interpret_mode():
        gg = jax.grad(loss(ssd_pallas), argnums=(0, 1, 2, 3))(
            args[0], args[1], args[3], args[4])
    for a, b in zip(gw, gg):
        # 5e-4: the Pallas adjoint reassociates fp32 sums (mask-matmul
        # cumsums, Kp path) relative to XLA autodiff.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("NG", [1, 2])
def test_kernel_all_param_grads(rng, NG):
    """Every differentiable input, incl. A/D/dt_bias, grouped B/C."""
    args = make_inputs(rng, B=1, L=256, H=2 * NG, NG=NG)
    seed = jnp.asarray(
        np.random.default_rng(1).standard_normal(args[0].shape), jnp.float32)

    def loss(fn):
        def f(*a):
            return jnp.sum(fn(*a[:6], dt_bias=a[6], chunk=128,
                              directions=(False, True)) * seed)
        return f

    gw = jax.grad(loss(ssd_chunked), argnums=tuple(range(7)))(*args)
    with pltpu.force_tpu_interpret_mode():
        gg = jax.grad(loss(ssd_pallas), argnums=tuple(range(7)))(*args)
    names = ("x", "dt", "A", "Bm", "Cm", "D", "dtb")
    for n, a, b in zip(names, gw, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=n)
