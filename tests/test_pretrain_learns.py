"""The pre-train recipe LEARNS, not merely descends (VERDICT r3 #2).

Planted-structure convergence through the REAL pipeline (PretrainDataset's
lowercase->loss_weights wiring, MlmCollator's 15% dynamic masking,
make_train_step's weighted CE): after a short run, masked positions inside
a planted motif must be predicted far above chance while iid background
stays at chance, and the soft-mask loss weight (HF_pre_train.py:424-437
semantics: 0.1 train) must measurably slow learning of the lowercase
repeat tract relative to weight 1.0. An optimizer-wiring, masking, or
loss-weighting bug that still descends fails here.

Probes are HELD OUT (evaluate_structure's default draws fresh sequences
from the same generator with a disjoint seed, VERDICT r4 #6): motif
accuracy asserts the planted RULE generalizes to sequences never trained
on, not recall of the training corpus; background-at-chance doubles as
the leakage/memorization bound.

Reference validation surface: /root/reference/src/HF_pre_train.py:479-516
(the recipe that trained the released models).
"""

import numpy as np
import pytest

from plantcaduceus_tpu.models.config import CaduceusConfig
from plantcaduceus_tpu.train import convergence as C

TINY = dict(d_model=64, n_layer=2, vocab_size=16, d_state=8)
STEPS = 150


@pytest.fixture(scope="module")
def runs():
    cfg = CaduceusConfig(**TINY)
    out = {}
    for w in (1.0, 0.1):
        run = C.train_planted(cfg, steps=STEPS, batch=16, n_corpus=512,
                              soft_masked_weight=w)
        out[w] = (run, C.evaluate_structure(run))
    return out


def test_corpus_has_planted_structure():
    corpus = C.planted_corpus(32, 128, seed=5)
    for s in corpus:
        assert len(C.motif_starts(s)) >= 2
        rs, re = C.REPEAT_SPAN
        tract = s[rs:re]
        assert tract.islower() and tract.startswith(C.REPEAT_UNIT)
        assert s[:rs].isupper()


def test_motif_learned_background_at_chance(runs):
    for w, (run, m) in runs.items():
        # masked motif-interior bases are predictable from the visible rest
        # of the motif: far above the 0.25 chance floor
        assert m["motif_accuracy"] > 0.8, (w, m)
        # iid background is unpredictable by construction: anything well
        # above chance would mean leakage (e.g. mask wiring echoing inputs)
        assert m["background_accuracy"] < 0.45, (w, m)
        # and training moved the loss at all
        assert run["final_loss"] < 1.3, (w, run["losses"])


def test_soft_mask_weight_modulates_repeat_learning(runs):
    """The recipe's 0.1 down-weighting must measurably slow learning of
    soft-masked (lowercase) regions relative to weight 1.0 — the observable
    consequence of HF_pre_train.py:424-437's loss_weights reaching the CE."""
    _, m_full = runs[1.0]
    _, m_soft = runs[0.1]
    assert m_soft["repeat_loss"] > 2.0 * m_full["repeat_loss"], (
        m_soft["repeat_loss"], m_full["repeat_loss"])
    # but the down-weighted run learns UPPERCASE structure just as well
    assert m_soft["motif_accuracy"] > 0.8


def test_untrained_baseline_is_chance():
    cfg = CaduceusConfig(**TINY)
    run = C.train_planted(cfg, steps=1, batch=16, n_corpus=256)
    m = C.evaluate_structure(run)
    assert m["motif_accuracy"] < 0.45
    assert m["background_accuracy"] < 0.45
