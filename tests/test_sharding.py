"""Multi-chip logic on the 8-device virtual CPU mesh: dp/fsdp/tp training
equivalence and sharded inference."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from plantcaduceus_tpu.engine.runner import InferenceRunner
from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.parallel import mesh as meshlib
from plantcaduceus_tpu.train import step as train_step_lib
from plantcaduceus_tpu.train.masking import MlmCollator
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer

TINY = dict(d_model=16, n_layer=2, vocab_size=16, d_state=4, expand=2, d_conv=4)


def _setup(rng, B=8, L=32):
    cfg = CaduceusConfig(**TINY)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    tok = DnaTokenizer()
    ids = rng.integers(7, 11, size=(B, L)).astype(np.int32)
    batch = MlmCollator(tok, seed=1)(ids, loss_weights=np.ones((B, L), np.float32))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, params, batch


def _grads_single(cfg, params, batch):
    """Reference gradients: plain jax.grad, no mesh."""

    def loss_fn(params):
        out = caduceus.forward(params, batch["input_ids"], cfg, dtype=jnp.float32)
        return caduceus.mlm_loss(out["logits"], batch["labels"],
                                 batch["loss_weights"])

    return jax.value_and_grad(loss_fn)(params)


@pytest.mark.parametrize("shape", [dict(data=8, fsdp=1, tensor=1),
                                   dict(data=2, fsdp=2, tensor=2)])
def test_grad_fn_matches_single_device(rng, shape):
    cfg, params, batch = _setup(rng)
    want_loss, want_grads = _grads_single(cfg, params, batch)

    mesh = meshlib.make_mesh(meshlib.MeshConfig(**shape))
    pspecs = meshlib.param_pspec_tree(
        params, replicated=(shape["fsdp"] == 1 and shape["tensor"] == 1))
    grad_fn = train_step_lib.make_grad_fn(cfg, mesh, pspecs,
                                          dtype=jnp.float32, remat=False)
    params_dev = meshlib.shard_params(
        params, mesh, replicated=(shape["fsdp"] == 1 and shape["tensor"] == 1))
    loss, acc, grads = jax.jit(grad_fn)(params_dev, batch)

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    flat_got = jax.tree_util.tree_leaves_with_path(grads)
    flat_want = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(want_grads))
    for path, g in flat_got:
        w = flat_want[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_train_step_runs_and_descends(rng):
    cfg, params, batch = _setup(rng, B=8)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=2, fsdp=2, tensor=2))
    opt = optax.adam(1e-3)
    init_state, train_step, eval_step = train_step_lib.make_train_step(
        cfg, opt, mesh, params, dtype=jnp.float32, remat=True)
    state = init_state(params)
    losses = []
    for _ in range(5):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    ev = eval_step(state, batch)
    assert np.isfinite(ev["loss"])


def test_inference_runner_sharded(rng):
    cfg, params, _ = _setup(rng)
    tok = DnaTokenizer()
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=8))
    runner = InferenceRunner(params, cfg, mesh=mesh, dtype=jnp.float32,
                             batch_size=16)
    seqs = ["".join(rng.choice(list("ACGT"), 32)) for _ in range(10)]
    ids = tok.encode_batch(seqs)
    probs = runner.masked_probs(ids, [7, 8, 9, 10], position=16, progress=False)
    assert probs.shape == (10, 4)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)

    # Sharded result must equal single-device result (padding included).
    mesh1 = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                              devices=jax.devices()[:1])
    runner1 = InferenceRunner(params, cfg, mesh=mesh1, dtype=jnp.float32,
                              batch_size=16)
    probs1 = runner1.masked_probs(ids, [7, 8, 9, 10], position=16,
                                  progress=False)
    np.testing.assert_allclose(probs, probs1, rtol=1e-5, atol=1e-6)
