"""Pallas flash attention vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from plantcaduceus_tpu.ops import attention as A
from plantcaduceus_tpu.ops import pallas_attention as FA


def make_qkv(rng, B=2, L=256, H=4, hd=32):
    mk = lambda: jnp.asarray(rng.standard_normal((B, L, H, hd)), jnp.float32)
    return mk(), mk(), mk()


def _ref(q, k, v, slopes=None, causal=False, window=None):
    bias = None
    if slopes is not None:
        L = q.shape[1]
        pos = jnp.arange(L)
        dist = jnp.abs(pos[None, :] - pos[:, None]).astype(jnp.float32)
        bias = -slopes[:, None, None] * dist[None]
    mask = A.local_window_mask(q.shape[1], window) if window else None
    return A.multi_head_attention(q, k, v, bias=bias, mask=mask,
                                  causal=causal)


@pytest.mark.parametrize("case", ["plain", "alibi", "causal", "window"])
def test_flash_fwd_matches_xla(rng, case):
    q, k, v = make_qkv(rng)
    H = q.shape[2]
    slopes = A.alibi_slopes(H) if case == "alibi" else None
    causal = case == "causal"
    window = 64 if case == "window" else None
    want = _ref(q, k, v, slopes, causal, window)
    with pltpu.force_tpu_interpret_mode():
        got = FA.flash_attention(q, k, v, alibi_slopes=slopes, causal=causal,
                                 local_window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_multiblock_and_rect_blocks(rng):
    q, k, v = make_qkv(rng, B=1, L=512, H=2, hd=16)
    slopes = A.alibi_slopes(2)
    want = _ref(q, k, v, slopes)
    with pltpu.force_tpu_interpret_mode():
        got = FA.flash_attention(q, k, v, alibi_slopes=slopes,
                                 blq=128, blk=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("case", ["alibi", "causal"])
def test_flash_grads_match_xla(rng, case):
    q, k, v = make_qkv(rng, B=1, L=256, H=2, hd=32)
    H = q.shape[2]
    slopes = A.alibi_slopes(H) if case == "alibi" else None
    causal = case == "causal"

    def loss_ref(q, k, v):
        o = _ref(q, k, v, slopes, causal)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    def loss_flash(q, k, v):
        o = FA.flash_attention(q, k, v, alibi_slopes=slopes, causal=causal)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape)))

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f"d{name}")


def test_flash_bf16_io(rng):
    q, k, v = (t.astype(jnp.bfloat16) for t in make_qkv(rng, L=128))
    with pltpu.force_tpu_interpret_mode():
        got = FA.flash_attention(q, k, v)
    want = _ref(q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)
