"""Width-aware training time-chunk (r5): pc2-large's d_inner 3072 at
8192 bp overflowed the backward kernels' scoped VMEM at the fixed
TRAIN_BL=256 (measured on v5e: 17.17M vs the 16M limit). train_bl(L, D)
shrinks the chunk for wide lanes; the forward's hb emission and the
backward must resolve it identically or gradients silently break — these
tests pin the policy and prove grad equality through a forced-shrink path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plantcaduceus_tpu.ops import pallas_scan as PS
from plantcaduceus_tpu.ops.selective_scan import selective_scan_sequential


def test_train_bl_policy():
    # narrow lanes keep the full training chunk
    assert PS.train_bl(512, 768) == 256
    assert PS.train_bl(8192, 2048) == 256          # pc2-medium: known-good
    # pc2-large width shrinks below the measured overflow point
    bl = PS.train_bl(8192, 3072)
    assert bl * 3072 <= PS.TRAIN_BL_FIT_ELEMS
    assert bl == 128
    # chunk always divides L
    for L in (512, 600, 8192):
        for D in (768, 1536, 3072, 4096):
            assert L % PS.train_bl(L, D) == 0
    # floor: never below 64 even for absurd widths
    assert PS.train_bl(512, 65536) >= 64


def test_mixer2_fit_chunk_policy():
    from plantcaduceus_tpu.ops.pallas_mixer2 import (MIXER2_FIT_ELEMS,
                                                     _fit_chunk)

    # narrow/medium widths keep the configured chunk
    assert _fit_chunk(128, 8192, 2048) == 128      # pc2-medium-ssd
    # pc2-large-ssd width halves until it fits
    c = _fit_chunk(128, 8192, 3072)
    assert c == 64 and c * 3072 <= MIXER2_FIT_ELEMS
    # halving stops when divisibility would break (160 % 64 != 0)
    assert _fit_chunk(128, 160, 8192) == 128
    for L, di in ((8192, 3072), (512, 4096), (256, 8192), (192, 8192)):
        assert L % _fit_chunk(128, L, di) == 0


def test_grads_exact_through_shrunk_chunk(rng, monkeypatch):
    """Force the shrink path at a small test shape (interpret mode) and
    check kernel grads against the sequential reference — proves the
    fwd-emitted hb chunking and the bwd's resolved chunk stay in lockstep
    when train_bl shrinks."""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(PS, "TRAIN_BL_FIT_ELEMS", 64 * 64)  # force shrink
    G, B, L, D, N = 2, 1, 256, 64, 8
    assert PS.train_bl(L, D) == 64  # the forced-shrink chunk under test

    x = jnp.asarray(rng.standard_normal((G, B, L, D)), jnp.float32)
    dt = jnp.asarray(rng.standard_normal((G, B, L, D)) * 0.5 - 1.0,
                     jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.standard_normal((G, D, N)) * 0.5,
                             jnp.float32))
    Bm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((G, B, L, N)), jnp.float32)
    Ds = jnp.asarray(rng.standard_normal((G, D)), jnp.float32)
    dtb = jnp.asarray(rng.standard_normal((G, D)) * 0.3, jnp.float32)
    dirs = (False, True)

    def loss_pl(*a):
        with pltpu.force_tpu_interpret_mode():
            y = PS.selective_scan_pallas(*a, directions=dirs, bl=64, bd=64)
        return jnp.sum(jnp.sin(y))

    def loss_ref(*a):
        flip1 = lambda t: t.at[1].set(jnp.flip(t[1], axis=1))
        y = selective_scan_sequential(flip1(a[0]), flip1(a[1]), a[2],
                                      flip1(a[3]), flip1(a[4]), a[5],
                                      dt_bias=a[6])
        return jnp.sum(jnp.sin(flip1(y)))

    args = (x, dt, A, Bm, Cm, Ds, dtb)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_pl, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for g, w, name in zip(gf, gr, ["x", "dt", "A", "B", "C", "D", "dtb"]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=8e-3, atol=2e-3, err_msg=name)
