"""Distillation: objective invariants, descent, and mesh equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.parallel import mesh as meshlib
from plantcaduceus_tpu.train import distill as distill_lib
from plantcaduceus_tpu.train import step as step_lib
from plantcaduceus_tpu.train.masking import MlmCollator
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer

T_CFG = dict(d_model=32, n_layer=2, vocab_size=16, d_state=8)
S_CFG = dict(d_model=32, n_layer=2, vocab_size=16, ssm_variant="mamba2",
             d_state=8, head_dim=16, chunk_size=32)


def _batch(rng, n=8, L=64):
    ids = rng.integers(7, 11, size=(n, L)).astype(np.int32)
    return MlmCollator(DnaTokenizer(), seed=0)(
        ids, loss_weights=np.ones_like(ids, np.float32))


def _setup(rng):
    tcfg = CaduceusConfig(**T_CFG)
    scfg = CaduceusConfig(**S_CFG)
    teacher = caduceus.init_params(jax.random.PRNGKey(0), tcfg)
    student = caduceus.init_params(jax.random.PRNGKey(1), scfg)
    return tcfg, scfg, teacher, student


def test_alpha0_equals_pretrain_loss(rng):
    """With alpha=0 the distillation objective IS the pre-training MLM loss
    (same weighting and global normalisation) — the KL term is inert."""
    tcfg, scfg, teacher, student = _setup(rng)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                             devices=jax.devices()[:1])
    opt = optax.sgd(0.0)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}

    init_d, dstep = distill_lib.make_distill_step(
        tcfg, scfg, opt, mesh, student, dtype=jnp.float32, alpha=0.0,
        remat=False)
    _, m = dstep(init_d(student), teacher, batch)

    init_t, tstep, _ = step_lib.make_train_step(
        scfg, opt, mesh, student, dtype=jnp.float32, remat=False)
    _, mt = tstep(init_t(student), batch)
    np.testing.assert_allclose(float(m["loss"]), float(mt["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m["hard"]), float(mt["loss"]),
                               rtol=1e-5)


def test_pure_kl_descends_and_agreement_rises(rng):
    """alpha=1 (pure soft targets): the student's KL to the teacher falls
    and masked argmax agreement rises — distillation actually transfers."""
    tcfg, scfg, teacher, student = _setup(rng)
    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                             devices=jax.devices()[:1])
    opt = optax.adam(5e-3)
    init_d, dstep = distill_lib.make_distill_step(
        tcfg, scfg, opt, mesh, student, dtype=jnp.float32, alpha=1.0,
        temperature=2.0, remat=False)
    state = init_d(student)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}
    kls, agrees = [], []
    for _ in range(12):
        state, m = dstep(state, teacher, batch)
        kls.append(float(m["kl"]))
        agrees.append(float(m["agree"]))
    assert kls[-1] < 0.5 * kls[0], kls
    assert agrees[-1] >= agrees[0], agrees


def test_mesh_step_matches_single_device(rng):
    """A (data=4, fsdp=2) distillation step reproduces the single-device
    metrics: the replicated-teacher forward, ZeRO gather/scatter, and the
    global loss normalisation compose correctly."""
    tcfg, scfg, teacher, student = _setup(rng)
    batch_np = _batch(rng)
    opt = optax.adam(1e-3)

    mesh1 = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                              devices=jax.devices()[:1])
    init1, step1 = distill_lib.make_distill_step(
        tcfg, scfg, opt, mesh1, student, dtype=jnp.float32, remat=False)
    s1, m1 = step1(init1(student),
                   teacher, {k: jnp.asarray(v) for k, v in batch_np.items()})

    mesh8 = meshlib.make_mesh(meshlib.MeshConfig(data=4, fsdp=2))
    init8, step8 = distill_lib.make_distill_step(
        tcfg, scfg, opt, mesh8, student, dtype=jnp.float32, remat=False)
    from jax.sharding import NamedSharding, PartitionSpec as P

    t8 = jax.device_put(teacher, NamedSharding(mesh8, P()))
    batch8 = meshlib.shard_batch(batch_np, mesh8)
    s8, m8 = step8(init8(student), t8, batch8)

    for k in ("loss", "kl", "hard", "accuracy", "agree"):
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=2e-4,
                                   atol=2e-5, err_msg=k)
    # updated params equal too (gather the fsdp shards back)
    w1 = np.asarray(s1.params["blocks"]["out_proj"])
    w8 = np.asarray(jax.device_get(
        jax.jit(lambda p: p,
                out_shardings=NamedSharding(mesh8, P()))(
            s8.params["blocks"]["out_proj"])))
    np.testing.assert_allclose(w1, w8, rtol=2e-4, atol=2e-5)


def test_cli_rejects_preset_teacher(tmp_path):
    """A bare preset teacher means random weights — the CLI must refuse it
    unless --allow-random-teacher is passed."""
    import pytest

    from plantcaduceus_tpu.cli import distill as cli_distill

    argv = ["--teacher", "l20", "--student-preset", "l20-ssd",
            "--dataset", "synthetic", "--output-dir", str(tmp_path / "out")]
    with pytest.raises(SystemExit, match="randomly initialised"):
        cli_distill.main(argv)


def test_tp_grad_coverage_guard():
    """Every mixer leaf of both SSM variants is covered by the TP gradient
    rules, and an uncovered (e.g. renamed) leaf fails loudly."""
    import pytest

    for cfg_kw in (T_CFG, S_CFG):
        cfg = CaduceusConfig(**cfg_kw)
        params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
        specs = meshlib.param_pspec_tree(params, replicated=False)
        meshlib.validate_tp_grad_coverage(specs)  # must not raise

        # Rename a tensor-partial leaf out of the rule set -> loud failure.
        if cfg.ssm_variant == "mamba2":
            blocks = dict(specs["blocks"])
            blocks["in_proj_B_renamed"] = blocks.pop("in_proj_B")
            with pytest.raises(ValueError, match="in_proj_B_renamed"):
                meshlib.validate_tp_grad_coverage({**specs,
                                                   "blocks": blocks})
