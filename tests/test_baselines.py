"""Baseline model families: BERT/ALiBi encoder, GPN conv LM, rotary, attention."""

import jax
import jax.numpy as jnp
import numpy as np

from plantcaduceus_tpu.models import bert, gpn
from plantcaduceus_tpu.ops import attention as A
from plantcaduceus_tpu.ops import rotary as R


def test_alibi_bias_shape_and_decay():
    b = np.asarray(A.alibi_bias(4, 16))
    assert b.shape == (4, 16, 16)
    assert np.allclose(np.diagonal(b, axis1=1, axis2=2), 0)
    # monotone decay with distance, steeper for earlier heads
    assert b[0, 0, 15] < b[0, 0, 1] < 0
    assert b[0, 0, 8] < b[3, 0, 8]


def test_alibi_nonpow2_heads():
    assert A.alibi_slopes(6).shape == (6,)


def test_local_window_mask():
    m = np.asarray(A.local_window_mask(8, 2))
    assert m[0, 2] == 0 and np.isinf(m[0, 3])


def test_attention_softmax_rows(rng):
    q = jnp.asarray(rng.standard_normal((2, 8, 2, 4)), jnp.float32)
    out = A.multi_head_attention(q, q, q)
    assert out.shape == (2, 8, 2, 4)
    # causal: position 0 attends only to itself -> output = v[0]
    outc = A.multi_head_attention(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(outc[:, 0]), np.asarray(q[:, 0]),
                               rtol=1e-5)


def test_rope_variants():
    for scaling in ["none", "interpolate", "ntk", "yarn"]:
        cos, sin = R.rope_tables(32, 8, scaling=scaling, scale=4.0)
        assert cos.shape == (32, 4) and np.isfinite(np.asarray(cos)).all()
    # PI: position p at scale s matches position p/s unscaled
    c1, s1 = R.rope_tables(64, 8, scaling="interpolate", scale=4.0)
    c0, s0 = R.rope_tables(64, 8)
    np.testing.assert_allclose(np.asarray(c1[4]), np.asarray(c0[1]), rtol=1e-6)


def test_rotary_apply_norm_preserving(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 2, 8)), jnp.float32)
    cos, sin = R.rope_tables(16, 8)
    y = R.apply_rotary(x, cos, sin)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)


def test_bert_forward(rng):
    cfg = bert.BertConfig(d_model=32, n_layer=2, n_heads=4)
    params = bert.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(7, 11, size=(2, 24)), jnp.int32)
    out = bert.forward(params, ids, cfg, dtype=jnp.float32)
    assert out["logits"].shape == (2, 24, 16)
    assert np.isfinite(np.asarray(out["logits"])).all()
    # rope + local window variant
    cfg2 = bert.BertConfig(d_model=32, n_layer=1, n_heads=4, position="rope",
                           rope_scaling="yarn", rope_scale=2.0, local_window=4)
    p2 = bert.init_params(jax.random.PRNGKey(1), cfg2)
    out2 = bert.forward(p2, ids, cfg2, dtype=jnp.float32)
    assert np.isfinite(np.asarray(out2["logits"])).all()


def test_gpn_forward(rng):
    cfg = gpn.GpnConfig(d_model=32, n_layer=3, kernel_size=5)
    assert cfg.dilation_schedule() == [1, 2, 4]
    params = gpn.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(7, 11, size=(2, 32)), jnp.int32)
    out = gpn.forward(params, ids, cfg, dtype=jnp.float32)
    assert out["logits"].shape == (2, 32, 16)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_gpn_weighted_loss(rng):
    """GPN uses the same weighted-CE contract as Caduceus (gpn.py:121-132)."""
    from plantcaduceus_tpu.models.caduceus import mlm_loss

    cfg = gpn.GpnConfig(d_model=32, n_layer=1)
    params = gpn.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(7, 11, size=(2, 16)), jnp.int32)
    out = gpn.forward(params, ids, cfg, dtype=jnp.float32)
    labels = jnp.where(jnp.arange(16) % 4 == 0, ids, -100)
    w = jnp.full((2, 16), 0.5)
    assert np.isfinite(float(mlm_loss(out["logits"], labels, w)))
