"""SSD (Mamba-2) chunked recurrence vs fp64 golden + gradient agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plantcaduceus_tpu.ops.ssd import ssd_chunked, ssd_sequential


def make_inputs(rng, G=2, B=2, L=64, H=4, P=8, NG=2, N=8):
    x = rng.standard_normal((G, B, L, H, P))
    dt = rng.standard_normal((G, B, L, H)) * 0.5 - 1.0
    A = -np.exp(rng.standard_normal((G, H)) * 0.5)
    Bm = rng.standard_normal((G, B, L, NG, N))
    Cm = rng.standard_normal((G, B, L, NG, N))
    Ds = rng.standard_normal((G, H))
    dtb = rng.standard_normal((G, H)) * 0.3
    return x, dt, A, Bm, Cm, Ds, dtb


def golden_ssd(x, dt, A, Bm, Cm, Ds, dtb, directions):
    """fp64 numpy reference: the literal per-step recurrence."""
    G, B, L, H, P = x.shape
    NG, N = Bm.shape[-2:]
    hg = H // NG
    dtp = np.logaddexp(0.0, dt + dtb[:, None, None, :])  # softplus
    y = np.zeros_like(x)
    for g in range(G):
        rev = directions[g] if g < len(directions) else False
        order = range(L - 1, -1, -1) if rev else range(L)
        for b in range(B):
            S = np.zeros((H, N, P))
            for t in order:
                a = np.exp(dtp[g, b, t] * A[g])  # [H]
                Bh = np.repeat(Bm[g, b, t], hg, axis=0)  # [H,N]
                Ch = np.repeat(Cm[g, b, t], hg, axis=0)
                S = a[:, None, None] * S + np.einsum(
                    "hn,hp->hnp", Bh * dtp[g, b, t][:, None], x[g, b, t])
                y[g, b, t] = np.einsum("hn,hnp->hp", Ch, S)
    return y + Ds[:, None, None, :, None] * x


@pytest.mark.parametrize("directions", [(False, False), (False, True)])
def test_sequential_matches_golden(rng, directions):
    inputs = make_inputs(rng)
    want = golden_ssd(*inputs, directions)
    args = tuple(jnp.asarray(v, jnp.float32) for v in inputs)
    got = ssd_sequential(*args[:6], dt_bias=args[6], directions=directions)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("directions", [(False, False), (False, True)])
@pytest.mark.parametrize("chunk", [16, 32, 64])
def test_chunked_matches_golden(rng, directions, chunk):
    inputs = make_inputs(rng)
    want = golden_ssd(*inputs, directions)
    args = tuple(jnp.asarray(v, jnp.float32) for v in inputs)
    got = ssd_chunked(*args[:6], dt_bias=args[6], chunk=chunk,
                      directions=directions)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_chunked_grouped_heads(rng):
    # NG=1 (all heads share B/C, the mamba_ssm default) and NG=H edge cases.
    for NG in (1, 4):
        inputs = make_inputs(rng, H=4, NG=NG, N=4, L=32)
        want = golden_ssd(*inputs, (False, True))
        args = tuple(jnp.asarray(v, jnp.float32) for v in inputs)
        got = ssd_chunked(*args[:6], dt_bias=args[6], chunk=8,
                          directions=(False, True))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_chunked_gradients_match_sequential(rng):
    inputs = make_inputs(rng, G=2, B=1, L=32, H=2, P=4, NG=1, N=4)
    args = tuple(jnp.asarray(v, jnp.float32) for v in inputs)
    seed = jnp.asarray(
        np.random.default_rng(1).standard_normal(args[0].shape), jnp.float32)

    def loss(fn, chunked):
        def f(x, dt, Bm, Cm):
            kw = dict(dt_bias=args[6], directions=(False, True))
            if chunked:
                kw["chunk"] = 8
            return jnp.sum(fn(x, dt, args[2], Bm, Cm, args[5], **kw) * seed)
        return f

    gs = jax.grad(loss(ssd_sequential, False), argnums=(0, 1, 2, 3))(
        args[0], args[1], args[3], args[4])
    gc = jax.grad(loss(ssd_chunked, True), argnums=(0, 1, 2, 3))(
        args[0], args[1], args[3], args[4])
    for a, b in zip(gs, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_bf16_inputs_fp32_internals(rng):
    inputs = make_inputs(rng, L=32)
    f32 = tuple(jnp.asarray(v, jnp.float32) for v in inputs)
    want = ssd_chunked(*f32[:6], dt_bias=f32[6], chunk=16,
                       directions=(False, True))
    bf = tuple(jnp.asarray(v, jnp.bfloat16) for v in inputs[:2]) + f32[2:]
    got = ssd_chunked(*bf[:2], *f32[2:6], dt_bias=f32[6], chunk=16,
                      directions=(False, True))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=5e-2, atol=5e-2)
