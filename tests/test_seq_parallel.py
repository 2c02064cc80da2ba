"""Sequence-parallel scan on a virtual mesh vs the single-device scan."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from plantcaduceus_tpu.ops.seq_parallel import selective_scan_seq_sharded
from plantcaduceus_tpu.ops.selective_scan import selective_scan_sequential


@pytest.mark.parametrize("directions", [None, (False, True)])
def test_seq_sharded_matches_single_device(rng, directions):
    G, B, L, D, N = 2, 2, 256, 16, 4
    n_seq = 4
    x = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.float32)
    dt = jnp.asarray(rng.standard_normal((G, B, L, D)) * 0.5 - 1, jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((G, D, N)) * .5), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, D)) * .3, jnp.float32)

    # single-device reference (with per-group flips for reversed directions)
    if directions is None:
        want = selective_scan_sequential(x, dt, A, Bm, Cm, Ds, dt_bias=dtb)
    else:
        flip1 = lambda t: t.at[1].set(jnp.flip(t[1], axis=1))
        want = selective_scan_sequential(flip1(x), flip1(dt), A, flip1(Bm),
                                         flip1(Cm), Ds, dt_bias=dtb)
        want = flip1(want)

    mesh = Mesh(np.asarray(jax.devices()[:n_seq]), ("seq",))
    lspec = P(None, None, "seq", None)

    def local(x, dt, Bm, Cm):
        return selective_scan_seq_sharded(
            x, dt, A, Bm, Cm, Ds, dtb, None, "seq", n_seq,
            directions=directions, bl=32, bd=16)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(lspec, lspec, lspec, lspec),
                      out_specs=lspec, check_vma=False)
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(f)(x, dt, Bm, Cm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("directions", [None, (False, True)])
def test_seq_sharded_grads_match_single_device(rng, directions):
    """jax.grad through shard_map over the seq axis == single-device grads
    (the adjoint stitching is derived compositionally; no hand-written
    cross-shard backward)."""
    G, B, L, D, N = 2, 2, 256, 16, 4
    n_seq = 4
    x = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.float32)
    dt = jnp.asarray(rng.standard_normal((G, B, L, D)) * 0.5 - 1, jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((G, D, N)) * .5), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, D)) * .3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.float32)

    if directions is None:
        rev = lambda t: t
    else:
        rev = lambda t: t.at[1].set(jnp.flip(t[1], axis=1))

    def ref_loss(x, dt, A, Bm, Cm, Ds, dtb):
        y = selective_scan_sequential(rev(x), rev(dt), A, rev(Bm), rev(Cm),
                                      Ds, dt_bias=dtb)
        return jnp.sum(rev(y) * w)

    want = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4, 5, 6))(
        x, dt, A, Bm, Cm, Ds, dtb)

    mesh = Mesh(np.asarray(jax.devices()[:n_seq]), ("seq",))
    lspec = P(None, None, "seq", None)

    def sp_loss(x, dt, A, Bm, Cm, Ds, dtb):
        def local(x, dt, Bm, Cm, w):
            y = selective_scan_seq_sharded(
                x, dt, A, Bm, Cm, Ds, dtb, None, "seq", n_seq,
                directions=directions, bl=32, bd=16)
            return jax.lax.psum(jnp.sum(y * w), "seq")

        f = jax.shard_map(local, mesh=mesh,
                          in_specs=(lspec, lspec, lspec, lspec, lspec),
                          out_specs=P(), check_vma=False)
        return f(x, dt, Bm, Cm, w)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.grad(sp_loss, argnums=(0, 1, 2, 3, 4, 5, 6)))(
            x, dt, A, Bm, Cm, Ds, dtb)

    names = ["dx", "ddt", "dA", "dB", "dC", "dD", "ddtb"]
    for n, g, r in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=n)


def test_seq_sharded_grads_fused_dtproj(rng):
    """Gradients with the low-rank dt projection fused into the kernel."""
    G, B, L, D, N, R = 1, 2, 128, 16, 4, 8
    n_seq = 4
    x = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.float32)
    dt_lr = jnp.asarray(rng.standard_normal((G, B, L, R)) * .5, jnp.float32)
    W = jnp.asarray(rng.standard_normal((G, R, D)) * .3, jnp.float32)
    A = jnp.asarray(-np.exp(rng.standard_normal((G, D, N)) * .5), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, D)) * .3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.float32)

    def ref_loss(x, dt_lr, W, A, Bm, Cm, Ds, dtb):
        dt = jnp.einsum("gblr,gri->gbli", dt_lr, W)
        y = selective_scan_sequential(x, dt, A, Bm, Cm, Ds, dt_bias=dtb)
        return jnp.sum(y * w)

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(x, dt_lr, W, A, Bm, Cm,
                                                 Ds, dtb)

    mesh = Mesh(np.asarray(jax.devices()[:n_seq]), ("seq",))
    lspec = P(None, None, "seq", None)

    def sp_loss(x, dt_lr, W, A, Bm, Cm, Ds, dtb):
        def local(x, dt_lr, Bm, Cm, w):
            y = selective_scan_seq_sharded(
                x, dt_lr, A, Bm, Cm, Ds, dtb, W, "seq", n_seq,
                directions=None, bl=32, bd=16)
            return jax.lax.psum(jnp.sum(y * w), "seq")

        f = jax.shard_map(local, mesh=mesh,
                          in_specs=(lspec, lspec, lspec, lspec, lspec),
                          out_specs=P(), check_vma=False)
        return f(x, dt_lr, Bm, Cm, w)

    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(jax.grad(sp_loss, argnums=(0, 1, 2)))(
            x, dt_lr, W, A, Bm, Cm, Ds, dtb)

    for n, g, r in zip(["dx", "ddt_lr", "dW"], got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3, err_msg=n)
