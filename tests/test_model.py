"""Caduceus model: shapes, golden parity, RC equivariance, loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from tests import golden

TINY = dict(d_model=16, n_layer=2, vocab_size=16, d_state=4, expand=2, d_conv=4)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = CaduceusConfig(**TINY)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _random_ids(rng, B, L):
    return jnp.asarray(rng.integers(7, 11, size=(B, L)), jnp.int32)


def test_shapes(tiny_setup, rng):
    cfg, params = tiny_setup
    ids = _random_ids(rng, 3, 32)
    out = caduceus.forward(params, ids, cfg, dtype=jnp.float32,
                           output_hidden_states=True)
    assert out["logits"].shape == (3, 32, cfg.vocab_size)
    assert out["hidden_states"].shape == (3, 32, 2 * cfg.d_model)


def test_matches_golden(tiny_setup, rng):
    """The stream-folded JAX model must equal the naive fp64 golden model."""
    cfg, params = tiny_setup
    ids = _random_ids(rng, 2, 24)
    out = caduceus.forward(params, ids, cfg, dtype=jnp.float32,
                           output_hidden_states=True)
    np_params = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    for b in range(ids.shape[0]):
        want_logits, want_hidden = golden.caduceus_forward_ref(
            np.asarray(ids[b]), np_params, cfg
        )
        np.testing.assert_allclose(
            np.asarray(out["logits"][b]), want_logits, rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["hidden_states"][b]), want_hidden, rtol=2e-4, atol=2e-4
        )


def test_rc_equivariance(tiny_setup, rng):
    """f(RC(x)) must equal RC(f(x)): logits complement-permute and reverse;
    hidden states flip length+channel."""
    cfg, params = tiny_setup
    ids = _random_ids(rng, 2, 32)
    rc = caduceus.rc_ids(ids, cfg)
    cmap = np.asarray(cfg.complement_map)

    out = caduceus.forward(params, ids, cfg, dtype=jnp.float32,
                           output_hidden_states=True)
    out_rc = caduceus.forward(params, rc, cfg, dtype=jnp.float32,
                              output_hidden_states=True)

    want_logits = np.flip(np.asarray(out["logits"]), axis=1)[..., cmap]
    np.testing.assert_allclose(np.asarray(out_rc["logits"]), want_logits,
                               rtol=1e-4, atol=1e-4)

    want_hidden = np.flip(np.asarray(out["hidden_states"]), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(out_rc["hidden_states"]), want_hidden,
                               rtol=1e-4, atol=1e-4)


def test_mlm_loss_weights():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.asarray([[1, -100, 2, 3]])
    w = jnp.asarray([[1.0, 1.0, 0.1, 0.0]])
    loss = caduceus.mlm_loss(logits, labels, w)
    # uniform logits -> nll = log(8) at every scored position
    np.testing.assert_allclose(float(loss), np.log(8.0), rtol=1e-6)
    # all-ignored is finite
    loss0 = caduceus.mlm_loss(logits, jnp.full((1, 4), -100), None)
    assert np.isfinite(float(loss0))


def test_non_rcps_path(rng):
    cfg = CaduceusConfig(rcps=False, **TINY)
    params = caduceus.init_params(jax.random.PRNGKey(1), cfg)
    ids = _random_ids(rng, 2, 16)
    out = caduceus.forward(params, ids, cfg, dtype=jnp.float32,
                           output_hidden_states=True)
    assert out["logits"].shape == (2, 16, cfg.vocab_size)
    assert out["hidden_states"].shape == (2, 16, cfg.d_model)


def test_unidirectional_path(rng):
    cfg = CaduceusConfig(bidirectional=False, rcps=False, **TINY)
    params = caduceus.init_params(jax.random.PRNGKey(2), cfg)
    ids = _random_ids(rng, 1, 16)
    out = caduceus.forward(params, ids, cfg, dtype=jnp.float32)
    assert out["logits"].shape == (1, 16, cfg.vocab_size)
    # causality: perturbing the last token must not change logits at t=0
    ids2 = ids.at[0, -1].set(7 if int(ids[0, -1]) != 7 else 8)
    out2 = caduceus.forward(params, ids2, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out["logits"][0, 0]),
                               np.asarray(out2["logits"][0, 0]), atol=1e-6)
    assert not np.allclose(np.asarray(out["logits"][0, -1]),
                           np.asarray(out2["logits"][0, -1]))


def test_all_hidden_states(tiny_setup, rng):
    """Full HF output_hidden_states tuple: [n_layer+1, B, L, 2d] stacked,
    entry k = block k's residual input, last entry == hidden_states."""
    cfg, params = tiny_setup
    ids = _random_ids(rng, 2, 32)
    out = caduceus.forward(params, ids, cfg, dtype=jnp.float32,
                           all_hidden_states=True)
    hs = out["all_hidden_states"]
    assert hs.shape == (cfg.n_layer + 1, 2, 32, 2 * cfg.d_model)
    np.testing.assert_array_equal(np.asarray(hs[-1]),
                                  np.asarray(out["hidden_states"]))
    # entry 0 is the embedding readout — RC-stream channels present
    assert not np.allclose(np.asarray(hs[0]), np.asarray(hs[-1]))
