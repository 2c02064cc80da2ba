"""SSD migration path proven on accuracy, not just speed (VERDICT r1 #5).

Toy-scale but real: a mamba1 teacher is pre-trained on synthetic periodic
DNA until masked accuracy is far above the 25% chance floor, then distilled
into a same-size SSD (Mamba-2) student. The student must recover >=95% of
the teacher's masked accuracy and its zero-shot log-ratio scores must rank-
correlate with the teacher's on a SNP fixture — the evidence that the
`-ssd` presets can inherit released-model behavior through cli/distill.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from plantcaduceus_tpu.engine import zero_shot
from plantcaduceus_tpu.engine.runner import InferenceRunner
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
from plantcaduceus_tpu.models import caduceus
from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.parallel import mesh as meshlib
from plantcaduceus_tpu.train import distill as distill_lib
from plantcaduceus_tpu.train import step as step_lib
from plantcaduceus_tpu.train.masking import MlmCollator

T_CFG = dict(d_model=32, n_layer=2, vocab_size=16, d_state=8)
S_CFG = dict(d_model=32, n_layer=2, vocab_size=16, ssm_variant="mamba2",
             d_state=8, head_dim=16, chunk_size=32)

MOTIF = "ACGTTGCA"
L = 64


def _periodic_batch(rng, tok, n=32):
    """Sequences that are phase-shifted tilings of MOTIF: every masked base
    is exactly recoverable from context, so a trained MLM approaches 100%
    masked accuracy and an untrained one sits at ~25%."""
    tiled = (MOTIF * (L // len(MOTIF) + 2))
    seqs = []
    for _ in range(n):
        phase = rng.integers(0, len(MOTIF))
        seqs.append(tiled[phase : phase + L])
    return np.stack([
        np.asarray(tok.encode(s.lower()), np.int32) for s in seqs])


def _mesh1():
    return meshlib.make_mesh(meshlib.MeshConfig(data=1),
                             devices=jax.devices()[:1])


@pytest.fixture(scope="module")
def trained_pair():
    rng = np.random.default_rng(0)
    tok = DnaTokenizer()
    mesh = _mesh1()
    tcfg = CaduceusConfig(**T_CFG)
    scfg = CaduceusConfig(**S_CFG)
    teacher0 = caduceus.init_params(jax.random.PRNGKey(0), tcfg)
    student0 = caduceus.init_params(jax.random.PRNGKey(1), scfg)
    collate = MlmCollator(tok, seed=0)

    def batches(n_steps, seed):
        brng = np.random.default_rng(seed)
        for step in range(n_steps):
            ids = _periodic_batch(brng, tok)
            b = collate(ids, loss_weights=np.ones_like(ids, np.float32),
                        rng=np.random.default_rng([seed, step]))
            yield {k: jnp.asarray(v) for k, v in b.items()}

    # --- teacher pre-training (mamba1) ---
    opt = optax.adamw(3e-3)
    init_t, tstep, teval = step_lib.make_train_step(
        tcfg, opt, mesh, teacher0, dtype=jnp.float32, remat=False)
    tstate = init_t(teacher0)
    for batch in batches(220, seed=11):
        tstate, _ = tstep(tstate, batch)
    teacher = tstate.params

    # --- distillation into the SSD student ---
    opt_s = optax.adamw(3e-3)
    init_d, dstep = distill_lib.make_distill_step(
        tcfg, scfg, opt_s, mesh, student0, dtype=jnp.float32,
        temperature=2.0, alpha=0.5, remat=False)
    dstate = init_d(student0)
    for batch in batches(350, seed=23):
        dstate, dm = dstep(dstate, teacher, batch)
    student = dstate.params

    # --- held-out masked-accuracy eval for both ---
    init_s, _, seval = step_lib.make_train_step(
        scfg, opt_s, mesh, student0, dtype=jnp.float32, remat=False)
    accs = {"teacher": [], "student": []}
    for batch in batches(8, seed=99):
        accs["teacher"].append(float(teval(tstate, batch)["accuracy"]))
        accs["student"].append(
            float(seval(step_lib.TrainState(student, dstate.opt_state,
                                            dstate.step), batch)["accuracy"]))
    return (tcfg, teacher, scfg, student, tok,
            float(np.mean(accs["teacher"])), float(np.mean(accs["student"])),
            float(dm["agree"]))


def test_student_recovers_teacher_masked_accuracy(trained_pair):
    _, _, _, _, _, t_acc, s_acc, agree = trained_pair
    assert t_acc > 0.60, f"teacher failed to learn (acc={t_acc:.3f})"
    assert s_acc >= 0.95 * t_acc, (
        f"SSD student recovered only {s_acc:.3f} of teacher {t_acc:.3f}")
    assert agree > 0.60, f"masked argmax agreement too low ({agree:.3f})"


def test_student_zero_shot_scores_correlate(trained_pair):
    """Zero-shot log(P_alt/P_ref) of the distilled SSD student rank-
    correlates with the teacher's on a SNP fixture built from the training
    distribution plus corrupted windows (score spread on both sides)."""
    scipy_stats = pytest.importorskip("scipy.stats")
    tcfg, teacher, scfg, student, tok, *_ = trained_pair

    rng = np.random.default_rng(7)
    tiled = MOTIF * (L // len(MOTIF) + 2)
    windows, refs, alts = [], [], []
    for i in range(40):
        phase = rng.integers(0, len(MOTIF))
        w = list(tiled[phase : phase + L])
        if i % 2:  # corrupt some context so P(ref) varies
            for j in rng.integers(0, L, size=6):
                w[j] = "ACGT"[rng.integers(4)]
        center = L // 2
        ref = w[center]
        alt = "ACGT"[rng.integers(4)]
        windows.append("".join(w))
        refs.append(ref)
        alts.append(alt)

    scores = {}
    for name, (cfg, params) in {"teacher": (tcfg, teacher),
                                "student": (scfg, student)}.items():
        runner = InferenceRunner(params, cfg, mesh=_mesh1(),
                                 dtype=jnp.float32, batch_size=16)
        probs = zero_shot.nucleotide_probs(runner, tok, windows,
                                           token_idx=L // 2, progress=False)
        scores[name] = zero_shot.log_ratio_scores(probs, refs, alts)

    rho = scipy_stats.spearmanr(scores["teacher"], scores["student"]).statistic
    assert rho > 0.8, f"zero-shot rank correlation too low (rho={rho:.3f})"
