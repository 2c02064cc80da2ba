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
