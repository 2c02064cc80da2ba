"""Autoregressive Mamba LM: forward, recurrent decode, training sanity.

Covers the reference's Lightning Mamba harness capability (SURVEY.md §2.3
B18): AR next-token modelling with a bits-per-dim metric and
``mamba_ssm``-style recurrent generation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from plantcaduceus_tpu.models import mamba_lm

CFG = mamba_lm.MambaLmConfig(d_model=32, n_layer=2, vocab_size=16, d_state=4,
                             scan_impl="associative")


@pytest.fixture(scope="module")
def params():
    return mamba_lm.init_params(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(params, rng):
    ids = jnp.asarray(rng.integers(0, 16, size=(2, 24)), jnp.int32)
    out = mamba_lm.forward(params, ids, CFG, dtype=jnp.float32)
    assert out["logits"].shape == (2, 24, 16)
    assert out["hidden_states"].shape == (2, 24, 32)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_step_decode_matches_parallel_forward(params, rng):
    """The O(1) recurrent step must reproduce the parallel scan's logits at
    every position — the core decode-correctness property."""
    ids = jnp.asarray(rng.integers(0, 16, size=(3, 17)), jnp.int32)
    ref = np.asarray(
        mamba_lm.forward(params, ids, CFG, dtype=jnp.float32)["logits"])

    cache = mamba_lm.init_cache(CFG, 3)
    got = []
    for t in range(ids.shape[1]):
        logits, cache = mamba_lm.step(params, cache, ids[:, t], CFG,
                                      dtype=jnp.float32)
        got.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(got, axis=1), ref,
                               rtol=2e-4, atol=2e-4)


def test_generate_greedy_deterministic(params, rng):
    prompt = jnp.asarray(rng.integers(0, 16, size=(2, 5)), jnp.int32)
    a = mamba_lm.generate(params, CFG, prompt, 8, dtype=jnp.float32)
    b = mamba_lm.generate(params, CFG, prompt, 8, dtype=jnp.float32)
    assert a.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_overfit_pattern_and_generate():
    """A few optimiser steps on a periodic sequence must push bits/dim far
    below uniform and make greedy generation continue the pattern."""
    cfg = mamba_lm.MambaLmConfig(d_model=32, n_layer=2, vocab_size=8,
                                 d_state=4, scan_impl="associative")
    params = mamba_lm.init_params(jax.random.PRNGKey(1), cfg)
    pattern = np.tile(np.array([1, 2, 3, 4], np.int32), 16)  # period 4
    batch = jnp.asarray(np.stack([pattern] * 4))

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    loss_fn = lambda p: mamba_lm.nll_loss(p, batch, cfg, dtype=jnp.float32)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss0 = float(loss_fn(params))
    for _ in range(120):
        params, opt_state, loss = train_step(params, opt_state)
    bpd = float(mamba_lm.bits_per_dim(loss))
    assert bpd < 0.2 < float(mamba_lm.bits_per_dim(jnp.asarray(loss0)))

    prompt = jnp.asarray(pattern[None, :8])
    cont = np.asarray(mamba_lm.generate(params, cfg, prompt, 8,
                                        dtype=jnp.float32))[0]
    np.testing.assert_array_equal(cont, pattern[8:16])


def test_sampled_generation_shape(params, rng):
    prompt = jnp.asarray(rng.integers(0, 16, size=(1, 4)), jnp.int32)
    toks = mamba_lm.generate(params, CFG, prompt, 6,
                             rng=jax.random.PRNGKey(3), temperature=0.8,
                             top_k=4, dtype=jnp.float32)
    assert toks.shape == (1, 6)
    assert ((np.asarray(toks) >= 0) & (np.asarray(toks) < 16)).all()


# --------------------------- SSD (mamba2) variant ---------------------------

CFG2 = mamba_lm.MambaLmConfig(d_model=32, n_layer=2, vocab_size=16,
                              ssm_variant="mamba2", d_state=8, head_dim=16,
                              chunk_size=8)


@pytest.fixture(scope="module")
def params2():
    return mamba_lm.init_params(jax.random.PRNGKey(0), CFG2)


def test_mamba2_forward_shapes(params2, rng):
    ids = jnp.asarray(rng.integers(0, 16, size=(2, 24)), jnp.int32)
    out = mamba_lm.forward(params2, ids, CFG2, dtype=jnp.float32)
    assert out["logits"].shape == (2, 24, 16)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_mamba2_step_decode_matches_parallel_forward(params2, rng):
    """The SSD O(1) recurrent step (scalar-per-head decay, [H, N, P] state)
    reproduces the chunked-matmul parallel forward at every position."""
    ids = jnp.asarray(rng.integers(0, 16, size=(3, 16)), jnp.int32)
    ref = np.asarray(
        mamba_lm.forward(params2, ids, CFG2, dtype=jnp.float32)["logits"])

    cache = mamba_lm.init_cache(CFG2, 3)
    got = []
    for t in range(ids.shape[1]):
        logits, cache = mamba_lm.step(params2, cache, ids[:, t], CFG2,
                                      dtype=jnp.float32)
        got.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(got, axis=1), ref,
                               rtol=2e-4, atol=2e-4)


def test_mamba2_generate_and_train_step(params2, rng):
    prompt = jnp.asarray(rng.integers(0, 16, size=(2, 8)), jnp.int32)
    a = mamba_lm.generate(params2, CFG2, prompt, 8, dtype=jnp.float32)
    b = mamba_lm.generate(params2, CFG2, prompt, 8, dtype=jnp.float32)
    assert a.shape == (2, 8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ids = jnp.asarray(rng.integers(0, 16, size=(2, 16)), jnp.int32)
    loss, grads = jax.value_and_grad(
        lambda p: mamba_lm.nll_loss(p, ids, CFG2, dtype=jnp.float32))(params2)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
