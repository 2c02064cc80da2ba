"""Caduceus with the SSD (Mamba-2) mixer: folding correctness, RC
equivariance, loss/grads, LoRA target fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.ops.conv import depthwise_conv_xla
from plantcaduceus_tpu.ops.ssd import ssd_sequential

TINY2 = dict(d_model=16, n_layer=2, vocab_size=16, ssm_variant="mamba2",
             d_state=4, head_dim=8, n_groups=2, chunk_size=16)


@pytest.fixture(scope="module")
def tiny2():
    cfg = CaduceusConfig(**TINY2)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _random_ids(rng, B, L):
    return jnp.asarray(rng.integers(7, 11, size=(B, L)), jnp.int32)


def test_preset_ssd_variants():
    cfg = CaduceusConfig.preset("l20-ssd")
    assert cfg.ssm_variant == "mamba2" and cfg.d_state == 128
    assert cfg.d_model == 384 and cfg.n_layer == 20
    assert cfg.n_heads * cfg.head_dim == cfg.d_inner


def test_shapes_and_finite(tiny2, rng):
    cfg, params = tiny2
    ids = _random_ids(rng, 3, 32)
    out = caduceus.forward(params, ids, cfg, dtype=jnp.float32,
                           output_hidden_states=True)
    assert out["logits"].shape == (3, 32, cfg.vocab_size)
    assert out["hidden_states"].shape == (3, 32, 2 * cfg.d_model)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_mixer_matches_explicit_flip_reference(tiny2, rng):
    """The flip-free direction folding (anticausal conv + native-reverse SSD)
    must equal the literal formulation: flip time, run causal, flip back."""
    cfg, params = tiny2
    lp = jax.tree.map(lambda a: a[0], params["blocks"])  # layer 0
    x = jnp.asarray(rng.standard_normal((2, 32, cfg.d_model)), jnp.float32)

    got = caduceus.mamba2_mixer(lp, x, cfg)

    # Naive reference: explicit per-direction flips, causal everything.
    H, P, NG, N = cfg.n_heads, cfg.head_dim, cfg.n_groups, cfg.d_state
    xi = jnp.einsum("bld,gdi->gbli", x, lp["in_proj_x"])
    z = jax.nn.silu(jnp.einsum("bld,gdi->gbli", x, lp["in_proj_z"]))
    Braw = jnp.einsum("bld,gdn->gbln", x, lp["in_proj_B"])
    Craw = jnp.einsum("bld,gdn->gbln", x, lp["in_proj_C"])
    dt = jnp.einsum("bld,gdh->gblh", x, lp["in_proj_dt"])
    outs = []
    for g in range(2):
        flip = (lambda a: jnp.flip(a, axis=1)) if g == 1 else (lambda a: a)
        xg = flip(depthwise_conv_xla(flip(xi[0]), lp["conv_x_w"][g],
                                     lp["conv_x_b"][g], activation="silu"))
        Bg = flip(depthwise_conv_xla(flip(Braw[g]), lp["conv_B_w"][g],
                                     lp["conv_B_b"][g], activation="silu"))
        Cg = flip(depthwise_conv_xla(flip(Craw[g]), lp["conv_C_w"][g],
                                     lp["conv_C_b"][g], activation="silu"))
        y = ssd_sequential(
            flip(xg).reshape(1, *xg.shape[:2], H, P),
            flip(dt[g])[None], -jnp.exp(lp["A_log"][g])[None],
            flip(Bg).reshape(1, *Bg.shape[:2], NG, N),
            flip(Cg).reshape(1, *Cg.shape[:2], NG, N),
            lp["D"][g][None], dt_bias=lp["dt_bias"][g][None],
        )[0].reshape(*xg.shape[:2], H * P)
        y = flip(y)
        from plantcaduceus_tpu.ops.norms import rms_norm
        outs.append(rms_norm(y * z[0], lp["mixer_norm_weight"][0],
                             cfg.norm_epsilon))
    want = (outs[0] + outs[1]) @ lp["out_proj"][0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_rc_equivariance(tiny2, rng):
    cfg, params = tiny2
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
    np.testing.assert_allclose(np.asarray(out_rc["hidden_states"]),
                               want_hidden, rtol=1e-4, atol=1e-4)


def test_loss_and_grads(tiny2, rng):
    cfg, params = tiny2
    ids = _random_ids(rng, 2, 32)
    labels = np.full((2, 32), -100)
    labels[:, 10] = 8
    labels = jnp.asarray(labels)

    def loss_fn(p):
        out = caduceus.forward(p, ids, cfg, dtype=jnp.float32)
        return caduceus.mlm_loss(out["logits"], labels)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # dt/B/C/conv grads must be nonzero (the SSD backward reaches them).
    for name in ("in_proj_dt", "in_proj_B", "conv_x_w", "A_log", "D"):
        assert float(jnp.abs(grads["blocks"][name]).sum()) > 0, name


def test_remat_matches(tiny2, rng):
    cfg, params = tiny2
    ids = _random_ids(rng, 2, 32)
    a = caduceus.forward(params, ids, cfg, dtype=jnp.float32)["logits"]
    b = caduceus.forward(params, ids, cfg, dtype=jnp.float32,
                         remat=True)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)


def test_lora_targets_fall_back(tiny2):
    from plantcaduceus_tpu.train.lora import LoraConfig, init_lora

    cfg, params = tiny2
    adapters = init_lora(jax.random.PRNGKey(1), params, LoraConfig())
    assert "in_proj_dt" in adapters and "in_proj_x" in adapters
    assert "x_proj_dt" not in adapters


def _batch(rng, B, L):
    ids = np.asarray(rng.integers(7, 11, size=(B, L)), np.int32)
    labels = np.full((B, L), -100, np.int32)
    labels[:, L // 2] = ids[:, L // 2]
    inp = ids.copy()
    inp[:, L // 2] = 3  # mask token
    return {"input_ids": jnp.asarray(inp), "labels": jnp.asarray(labels),
            "loss_weights": jnp.ones((B, L), jnp.float32)}


@pytest.mark.parametrize("shape", [dict(data=4, fsdp=2, tensor=1),
                                   dict(data=2, fsdp=2, tensor=2)])
def test_grad_fn_matches_single_device(tiny2, rng, shape):
    from plantcaduceus_tpu.parallel import mesh as meshlib
    from plantcaduceus_tpu.train import step as train_step_lib

    if shape["tensor"] > 1:
        # TP requires n_groups == 1 (group-shared B/C replicated per shard).
        cfg = CaduceusConfig(**dict(TINY2, n_groups=1))
        params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    else:
        cfg, params = tiny2
    batch = _batch(rng, 8, 32)

    def loss_fn(p):
        out = caduceus.forward(p, batch["input_ids"], cfg, dtype=jnp.float32)
        return caduceus.mlm_loss(out["logits"], batch["labels"],
                                 batch["loss_weights"])

    want_loss, want_grads = jax.value_and_grad(loss_fn)(params)

    mesh = meshlib.make_mesh(meshlib.MeshConfig(**shape))
    pspecs = meshlib.param_pspec_tree(params, replicated=False)
    grad_fn = train_step_lib.make_grad_fn(cfg, mesh, pspecs,
                                          dtype=jnp.float32, remat=False)
    params_dev = meshlib.shard_params(params, mesh, replicated=False)
    loss, acc, grads = jax.jit(grad_fn)(params_dev, batch)
    np.testing.assert_allclose(float(loss), float(want_loss), rtol=1e-5)
    flat_want = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(want_grads))
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        w = flat_want[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_train_step_descends(tiny2, rng):
    import optax

    from plantcaduceus_tpu.parallel import mesh as meshlib
    from plantcaduceus_tpu.train import step as train_step_lib

    cfg, params = tiny2
    batch = _batch(rng, 8, 32)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=4, fsdp=2, tensor=1))
    opt = optax.adam(1e-3)
    init_state, train_step, eval_step = train_step_lib.make_train_step(
        cfg, opt, mesh, params, dtype=jnp.float32, remat=True)
    state = init_state(params)
    losses = []
    for _ in range(5):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(eval_step(state, batch)["loss"])


def test_inference_runner_mamba2(tiny2, rng):
    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
    from plantcaduceus_tpu.parallel import mesh as meshlib

    cfg, params = tiny2
    tok = DnaTokenizer()
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=8))
    runner = InferenceRunner(params, cfg, mesh=mesh, dtype=jnp.float32,
                             batch_size=16)
    seqs = ["".join(rng.choice(list("ACGT"), 32)) for _ in range(10)]
    ids = tok.encode_batch(seqs)
    probs = runner.masked_probs(ids, [7, 8, 9, 10], position=16,
                                progress=False)
    assert probs.shape == (10, 4)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
