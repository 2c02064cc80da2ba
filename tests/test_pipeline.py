"""Pipeline parallelism: the GPipe schedule over the layer stack must
reproduce single-device training exactly (same loss, same parameters after
optimizer steps) — the PP analogue of the DP/FSDP/TP/SP equivalence tests.

Runs on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.parallel import mesh as meshlib
from plantcaduceus_tpu.train import step as step_lib
from plantcaduceus_tpu.train.masking import MlmCollator
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer


def _cfg(**kw):
    base = dict(d_model=32, n_layer=4, vocab_size=16, d_state=4)
    base.update(kw)
    return CaduceusConfig(**base)


def _batch(B=8, L=64, seed=0):
    ids = np.random.default_rng(seed).integers(7, 11, size=(B, L)).astype(
        np.int32)
    lw = 1.0 - 0.9 * (np.arange(B * L).reshape(B, L) % 3 == 0)
    batch = MlmCollator(DnaTokenizer(), seed=1)(
        ids, loss_weights=lw.astype(np.float32))
    return {k: jnp.asarray(v) for k, v in batch.items()}


def _run_steps(cfg, mesh_cfg, batches, n_steps=2, **step_kw):
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    n_dev = (max(mesh_cfg.data, 1) * mesh_cfg.fsdp * mesh_cfg.seq
             * mesh_cfg.tensor * mesh_cfg.pipe)
    mesh = meshlib.make_mesh(mesh_cfg, devices=jax.devices()[:n_dev])
    opt = optax.adamw(1e-3)
    init_state, train_step, eval_step = step_lib.make_train_step(
        cfg, opt, mesh, params, dtype=jnp.float32, remat=False, **step_kw)
    state = init_state(params)
    metrics = None
    for i in range(n_steps):
        state, metrics = train_step(state, batches[i % len(batches)])
    ev = eval_step(state, batches[0])
    final = jax.tree.map(np.asarray, jax.device_get(state.params))
    return final, {k: float(v) for k, v in metrics.items()}, \
        {k: float(v) for k, v in ev.items()}


@pytest.mark.parametrize("variant", ["mamba1", "mamba2"])
def test_pipeline_matches_single_device(variant):
    kw = {}
    if variant == "mamba2":
        kw = dict(ssm_variant="mamba2", d_state=8, head_dim=16, chunk_size=32)
    cfg = _cfg(**kw)
    batches = [_batch(seed=0), _batch(seed=3)]

    ref_params, ref_m, ref_ev = _run_steps(
        cfg, meshlib.MeshConfig(data=1), batches)
    pp_params, pp_m, pp_ev = _run_steps(
        cfg, meshlib.MeshConfig(data=2, pipe=4), batches)

    assert np.isclose(ref_m["loss"], pp_m["loss"], rtol=2e-5), \
        (ref_m, pp_m)
    assert np.isclose(ref_m["accuracy"], pp_m["accuracy"], atol=1e-6)
    assert np.isclose(ref_ev["loss"], pp_ev["loss"], rtol=2e-5), \
        (ref_ev, pp_ev)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(pp_params))
    for path, leaf in flat_ref:
        got = flat_pp[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), rtol=5e-4, atol=5e-6,
            err_msg=str(path))


def test_pipeline_more_microbatches_than_stages():
    # Raising n_micro above the stage count (the bubble-shrinking setting)
    # must not change the math.
    cfg = _cfg()
    batches = [_batch(seed=0)]
    ref_params, ref_m, _ = _run_steps(
        cfg, meshlib.MeshConfig(data=1), batches, n_steps=1)
    pp_params, pp_m, _ = _run_steps(
        cfg, meshlib.MeshConfig(data=1, pipe=2), batches, n_steps=1,
        pp_microbatches=8)
    assert np.isclose(ref_m["loss"], pp_m["loss"], rtol=2e-5)
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(pp_params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_params):
        np.testing.assert_allclose(
            np.asarray(flat_pp[path]), np.asarray(leaf), rtol=5e-4,
            atol=5e-6, err_msg=str(path))


def test_pipeline_composes_with_fsdp():
    cfg = _cfg()
    batches = [_batch(seed=0)]
    ref_params, ref_m, _ = _run_steps(
        cfg, meshlib.MeshConfig(data=1), batches, n_steps=1)
    pp_params, pp_m, _ = _run_steps(
        cfg, meshlib.MeshConfig(data=2, fsdp=2, pipe=2), batches, n_steps=1)
    assert np.isclose(ref_m["loss"], pp_m["loss"], rtol=2e-5)
    for (path, leaf), (path2, got) in zip(
            jax.tree_util.tree_leaves_with_path(ref_params),
            jax.tree_util.tree_leaves_with_path(pp_params)):
        assert path == path2
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), rtol=5e-4, atol=5e-6,
            err_msg=str(path))


def test_pipeline_rejects_bad_combos():
    cfg = _cfg()
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=2, tensor=2, pipe=2),
                             devices=jax.devices())
    with pytest.raises(ValueError, match="pipeline"):
        step_lib.make_train_step(cfg, optax.adamw(1e-3), mesh, params)
    mesh2 = meshlib.make_mesh(meshlib.MeshConfig(data=2, pipe=4),
                              devices=jax.devices())
    cfg_odd = _cfg(n_layer=3)
    params_odd = caduceus.init_params(jax.random.PRNGKey(0), cfg_odd)
    with pytest.raises(ValueError, match="n_layer"):
        step_lib.make_train_step(cfg_odd, optax.adamw(1e-3), mesh2,
                                 params_odd)
