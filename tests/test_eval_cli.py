"""End-to-end tests for the zero-shot-eval CLI glue.

The four tasks' math is fuzz-proven against the reference in
tests/test_reference_diff.py; these tests drive the CLI layer itself —
the glue of /root/reference/src/zero-shot-eval.py:324-530 — through
``cli.zero_shot_eval.main()`` on tiny local TSV fixtures: dataset loading,
masking dispatch, the --save-logits -> --logits-path round-trip, the
--metrics-json schema, row-count contracts, and the sv_effect output table.
The analogue of tests/test_fixtures.py for the scoring CLI.
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

L = 128          # window length of the synthetic fixtures
CENTER = 64      # masked center (the 8192-bp models' 4095 analogue)


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Tiny exported HF-format checkpoint: the CLI's strict import path."""
    import jax

    from plantcaduceus_tpu.compat.hf_export import export_hf_dir
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig

    cfg = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16, d_state=4)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    d = tmp_path_factory.mktemp("ckpt") / "tiny"
    export_hf_dir(d, params, cfg)
    return str(d)


def _seqs(rng, n):
    return ["".join(rng.choice(list("ACGT"), L)) for _ in range(n)]


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    """Deterministic local TSV fixtures for all four subcommands."""
    rng = np.random.default_rng(7)
    d = tmp_path_factory.mktemp("fixtures")

    n = 24
    labels = np.array([0, 1] * (n // 2))
    evo = d / "evo.tsv"
    pd.DataFrame({"sequence": _seqs(rng, n),
                  "label": labels}).to_csv(evo, sep="\t", index=False)

    # motif fixture: one row carries a non-ACGT base inside the motif so the
    # validity filtering of the accuracy metrics is exercised end-to-end
    motif_seqs = _seqs(rng, n)
    motif_seqs[3] = motif_seqs[3][:CENTER + 1] + "N" + motif_seqs[3][CENTER + 2:]
    motif = d / "motif.tsv"
    pd.DataFrame({"sequence": motif_seqs,
                  "label": labels}).to_csv(motif, sep="\t", index=False)

    core = d / "core.tsv"
    pd.DataFrame({"sequence": _seqs(rng, n),
                  "is_core": labels}).to_csv(core, sep="\t", index=False)

    sv = d / "sv.tsv"
    pd.DataFrame({
        "RefSeq": _seqs(rng, n),
        "MutSeq": _seqs(rng, n),
        "left": rng.integers(20, 40, n),
        "right": rng.integers(90, 110, n),
        "label": labels,
        # the reference frame carries these bookkeeping columns; the CLI's
        # --output must drop them (zero-shot-eval.py sv_effect writer)
        "Left5_Positions": ["x"] * n,
        "Right5_Positions": ["y"] * n,
    }).to_csv(sv, sep="\t", index=False)
    return {"evo": evo, "motif": motif, "core": core, "sv": sv}


def _run(argv):
    from plantcaduceus_tpu.cli.zero_shot_eval import main

    main(argv)


# ---------------------------------------------------------------------------
# evo_cons
# ---------------------------------------------------------------------------


def test_evo_cons_e2e_and_logits_roundtrip(tiny_ckpt, frames, tmp_path):
    logits = tmp_path / "logits.tsv"
    mj1 = tmp_path / "m1.json"
    _run(["evo_cons", "--repo-id", str(frames["evo"]), "--model", tiny_ckpt,
          "--token-idx", str(CENTER), "--batch-size", "8",
          "--save-logits", str(logits), "--metrics-json", str(mj1),
          "--no-progress"])
    m1 = json.loads(mj1.read_text())
    # schema: the reference's metrics_json carries auroc/auprc/token_idx
    assert set(m1) >= {"auroc", "auprc", "token_idx"}
    assert m1["token_idx"] == CENTER
    assert 0.0 <= m1["auroc"] <= 1.0 and 0.0 <= m1["auprc"] <= 1.0

    # cached-logits schema: one prob row per example, ACGT columns
    cached = pd.read_csv(logits, sep="\t")
    assert list(cached.columns) == list("ACGT")
    assert len(cached) == 24
    np.testing.assert_allclose(cached.values.sum(axis=1), 1.0, atol=1e-4)

    # --logits-path replay must reproduce the metrics exactly WITHOUT a
    # model (the reference's save_logits/logits_path cache contract)
    mj2 = tmp_path / "m2.json"
    _run(["evo_cons", "--repo-id", str(frames["evo"]),
          "--model", "this-model-does-not-exist",
          "--token-idx", str(CENTER), "--logits-path", str(logits),
          "--metrics-json", str(mj2), "--no-progress"])
    m2 = json.loads(mj2.read_text())
    assert m1 == m2


def test_evo_cons_row_mismatch_asserts(tiny_ckpt, frames, tmp_path):
    """A cached-logits file with the wrong row count must trip the CLI's
    row-count contract (the reference's assert at zero-shot-eval.py:359)."""
    bad = tmp_path / "bad.tsv"
    pd.DataFrame(np.full((5, 4), 0.25),
                 columns=list("ACGT")).to_csv(bad, sep="\t", index=False)
    with pytest.raises(AssertionError, match="Row mismatch"):
        _run(["evo_cons", "--repo-id", str(frames["evo"]),
              "--model", tiny_ckpt, "--token-idx", str(CENTER),
              "--logits-path", str(bad), "--no-progress"])


# ---------------------------------------------------------------------------
# motif_acc
# ---------------------------------------------------------------------------


def test_motif_acc_e2e(tiny_ckpt, frames, tmp_path):
    mj = tmp_path / "m.json"
    logits = tmp_path / "logits.tsv"
    positions = f"{CENTER},{CENTER + 1},{CENTER + 2}"
    _run(["motif_acc", "--repo-id", str(frames["motif"]), "--model", tiny_ckpt,
          "--mask-idx", positions, "--motif-len", "3", "--batch-size", "8",
          "--save-logits", str(logits), "--metrics-json", str(mj),
          "--no-progress"])
    m = json.loads(mj.read_text())
    assert set(m) == {"token_accuracy", "motif_accuracy"}
    assert 0.0 <= m["motif_accuracy"] <= m["token_accuracy"] <= 1.0
    # multi-mask probs: one row PER (example, masked position)
    assert len(pd.read_csv(logits, sep="\t")) == 24 * 3

    # replay through the cache gives identical metrics
    mj2 = tmp_path / "m2.json"
    _run(["motif_acc", "--repo-id", str(frames["motif"]),
          "--model", "unused", "--mask-idx", positions, "--motif-len", "3",
          "--logits-path", str(logits), "--metrics-json", str(mj2),
          "--no-progress"])
    assert json.loads(mj2.read_text()) == m


def test_motif_acc_mask_count_contract(tiny_ckpt, frames):
    with pytest.raises(AssertionError, match="mask_idx count"):
        _run(["motif_acc", "--repo-id", str(frames["motif"]),
              "--model", tiny_ckpt, "--mask-idx", "64,65", "--motif-len",
              "3", "--no-progress"])


# ---------------------------------------------------------------------------
# core_noncore
# ---------------------------------------------------------------------------


def test_core_noncore_e2e_custom_label_column(tiny_ckpt, frames, tmp_path):
    mj = tmp_path / "m.json"
    _run(["core_noncore", "--repo-id", str(frames["core"]),
          "--model", tiny_ckpt, "--mask-idx", f"{CENTER},{CENTER + 1}",
          "--motif-len", "2", "--label-column", "is_core",
          "--batch-size", "8", "--metrics-json", str(mj), "--no-progress"])
    m = json.loads(mj.read_text())
    assert set(m) == {"AUROC", "AUPRC"}
    assert 0.0 <= m["AUROC"] <= 1.0 and 0.0 <= m["AUPRC"] <= 1.0


# ---------------------------------------------------------------------------
# sv_effect
# ---------------------------------------------------------------------------


def test_sv_effect_e2e(tiny_ckpt, frames, tmp_path):
    mj = tmp_path / "m.json"
    out = tmp_path / "scored.tsv"
    ref_npz = tmp_path / "ref.npz"
    mut_npz = tmp_path / "mut.npz"
    _run(["sv_effect", "--repo-id", str(frames["sv"]), "--model", tiny_ckpt,
          "--flanking", "3", "--batch-size", "8", "--output", str(out),
          "--save-ref-logits", str(ref_npz), "--save-mut-logits",
          str(mut_npz), "--metrics-json", str(mj), "--no-progress"])
    m = json.loads(mj.read_text())
    assert set(m) == {"AUPRC"} and 0.0 <= m["AUPRC"] <= 1.0

    # unmasked positionwise caches: [n, L, 4] prob arrays
    ref_probs = np.load(ref_npz)["logits"]
    assert ref_probs.shape == (24, L, 4)
    np.testing.assert_allclose(ref_probs.sum(axis=-1), 1.0, atol=1e-4)

    got = pd.read_csv(out, sep="\t")
    src = pd.read_csv(frames["sv"], sep="\t")
    assert len(got) == len(src)
    assert "score" in got.columns and np.isfinite(got["score"]).all()
    # bookkeeping columns dropped, data columns preserved
    assert "Left5_Positions" not in got.columns
    assert "Right5_Positions" not in got.columns
    pd.testing.assert_series_equal(got["left"], src["left"])

    # scores in the table must equal the task math replayed on the caches
    from plantcaduceus_tpu.engine import eval_tasks as T

    mut_probs = np.load(mut_npz)["logits"]
    want = T.sv_llr_boundary(src.to_dict("records"), ref_probs, mut_probs, 3)
    np.testing.assert_allclose(got["score"].to_numpy(), want, rtol=1e-5,
                               atol=1e-6)


def test_sv_effect_missing_columns_error(tiny_ckpt, frames, tmp_path):
    bad = tmp_path / "bad.tsv"
    pd.DataFrame({"RefSeq": ["ACGT"], "label": [1]}).to_csv(
        bad, sep="\t", index=False)
    with pytest.raises(KeyError, match="MutSeq"):
        _run(["sv_effect", "--repo-id", str(bad), "--model", tiny_ckpt,
              "--no-progress"])
