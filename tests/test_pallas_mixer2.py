"""Fused mamba2 mixer-interior kernel (interpret mode) vs decomposed XLA."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from plantcaduceus_tpu.ops.pallas_mixer2 import (_interior_xla,
                                                 mamba2_mixer_interior)

R, L, H, P, NG, N, K = 2, 256, 2, 128, 1, 128, 4
DI, NGN = H * P, NG * N


def make_inputs(rng):
    f = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return dict(
        xi=f(R, L, DI), z=f(R, L, DI), Braw=f(R, L, NGN), Craw=f(R, L, NGN),
        dt=f(R, L, H) * 0.5 - 1.0,
        cxw=f(DI, K) * 0.3, cxb=f(DI) * 0.1,
        cbw=f(NGN, K) * 0.3, cbb=f(NGN) * 0.1,
        ccw=f(NGN, K) * 0.3, ccb=f(NGN) * 0.1,
        nw=1.0 + 0.1 * f(DI),
        A=-jnp.exp(f(H) * 0.5), Dsk=f(H), dtb=f(H) * 0.3,
    )


@pytest.mark.parametrize("reverse", [False, True])
def test_interior_matches_xla(rng, reverse):
    kw = make_inputs(rng)
    want = _interior_xla(**kw, N=N, eps=1e-5, chunk=128, reverse=reverse)
    with pltpu.force_tpu_interpret_mode():
        got = mamba2_mixer_interior(*kw.values(), d_state=N, eps=1e-5,
                                    chunk=128, reverse=reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_interior_grads_match_xla(rng):
    kw = make_inputs(rng)
    seed = jnp.asarray(
        np.random.default_rng(1).standard_normal((R, L, DI)), jnp.float32)
    names = ("xi", "z", "Braw", "dt", "cxw", "nw", "A", "dtb")

    def loss(fn):
        def f(*diff):
            d = dict(kw, **dict(zip(names, diff)))
            return jnp.sum(fn(d) * seed)
        return f

    xla = loss(lambda d: _interior_xla(**d, N=N, eps=1e-5, chunk=128,
                                       reverse=True))
    pal = loss(lambda d: mamba2_mixer_interior(
        *d.values(), d_state=N, eps=1e-5, chunk=128, reverse=True))
    diff = tuple(kw[n] for n in names)
    gw = jax.grad(xla, argnums=tuple(range(len(names))))(*diff)
    with pltpu.force_tpu_interpret_mode():
        gg = jax.grad(pal, argnums=tuple(range(len(names))))(*diff)
    for n, a, b in zip(names, gw, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)
