"""Zero-shot eval task metric logic (synthetic fixtures)."""

import numpy as np

from plantcaduceus_tpu.engine import eval_tasks as T


def test_true_tokens_ordering():
    toks = T.true_tokens_from_seq(["ACGT", "TGCA"], [1, 2])
    np.testing.assert_array_equal(toks, ["C", "G", "G", "C"])


def test_refprob_scores():
    probs = np.array([[0.7, 0.1, 0.1, 0.1], [0.1, 0.1, 0.1, 0.7]])
    s = T.refprob_scores(["AXX", "XXT"], probs, 0)
    assert s[0] == 0.7 and s[1] == 0.0  # second row ref at idx 0 is 'X'
    s2 = T.refprob_scores(["XXA", "XXT"], probs, 2)
    assert s2[0] == 0.7 and s2[1] == 0.7


def test_token_and_motif_accuracy():
    # predictions: A, C, G, T
    probs = np.eye(4)
    true_ok = np.array(["A", "C", "G", "T"])
    assert T.token_accuracy(probs, true_ok) == 1.0
    assert T.motif_accuracy(probs, true_ok, 2) == 1.0
    true_half = np.array(["A", "G", "G", "T"])  # first motif wrong
    assert T.token_accuracy(probs, true_half) == 0.75
    assert T.motif_accuracy(probs, true_half, 2) == 0.5
    # unknown base invalidates its motif group only
    true_n = np.array(["A", "N", "G", "T"])
    assert T.motif_accuracy(probs, true_n, 2) == 1.0


def test_avg_trueprob_scores():
    probs = np.array([[0.5, 0.2, 0.2, 0.1],
                      [0.1, 0.6, 0.2, 0.1],
                      [0.25, 0.25, 0.25, 0.25],
                      [0.1, 0.1, 0.1, 0.7]])
    true = np.array(["A", "C", "N", "T"])
    s = T.avg_trueprob_scores(probs, true, 2)
    np.testing.assert_allclose(s, [(0.5 + 0.6) / 2, (0.0 + 0.7) / 2])


def test_auroc_separable():
    y = np.array([0, 0, 1, 1])
    m = T.auroc_auprc(y, np.array([0.1, 0.2, 0.8, 0.9]))
    assert m["auroc"] == 1.0 and m["auprc"] == 1.0


def test_sv_llr_boundary_zero_for_identical():
    L, flanking = 20, 2
    probs = np.full((1, L, 4), 0.25)
    rows = [{"left": 5, "right": 14, "MutSeq": "A" * L}]
    s = T.sv_llr_boundary(rows, probs, probs, flanking)
    np.testing.assert_allclose(s, [0.0], atol=1e-12)


def test_sv_llr_boundary_sign():
    """Mut probabilities lower than ref at the junction -> positive score
    (more disruptive), because the mean LLR is negated."""
    L, flanking = 20, 2
    ref = np.full((1, L, 4), 0.25)
    mut = np.full((1, L, 4), 0.05)
    rows = [{"left": 5, "right": 14, "MutSeq": "A" * L}]
    s = T.sv_llr_boundary(rows, ref, mut, flanking)
    assert s[0] > 0
