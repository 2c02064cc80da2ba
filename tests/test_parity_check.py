"""Keep the released-weights parity gate WARM (VERDICT r3 #10).

The real gate — `tools/parity_check.py --import <released-ckpt>` vs the
reference's scores — stays environment-blocked (no egress to the HF hub),
but the tooling must be one command away the day weights are reachable.
These tests drive the tool's own `main()` end-to-end on synthetic
HF-format checkpoints: strict import -> scoring of the reference fixture
-> TSV comparison (self-parity and a deliberate mismatch), plus the
`--audit` forensics path and its broken-checkpoint failure mode.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

FIXTURE = Path("/root/reference/examples/example_snp.tsv")

pytestmark = pytest.mark.skipif(not FIXTURE.exists(),
                                reason="reference fixture not present")


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import jax

    from plantcaduceus_tpu.compat.hf_export import export_hf_dir
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig

    cfg = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16, d_state=4)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    d = tmp_path_factory.mktemp("pc") / "ckpt"
    export_hf_dir(d, params, cfg)
    return str(d)


def _run_main(argv):
    import parity_check

    old = sys.argv
    sys.argv = ["parity_check.py"] + argv
    try:
        parity_check.main()
    finally:
        sys.argv = old


def test_import_gate_scores_fixture(tiny_ckpt, tmp_path):
    out = tmp_path / "scores.tsv"
    _run_main(["--import", tiny_ckpt, "--out", str(out), "--batch", "64"])
    df = pd.read_csv(out, sep="\t")
    assert len(df) == 185 and np.isfinite(df["zeroShotScore"]).all()


def test_import_gate_self_parity_passes(tiny_ckpt, tmp_path):
    """--import + a reference TSV that equals our own output must PASS."""
    out1 = tmp_path / "a.tsv"
    _run_main(["--import", tiny_ckpt, "--out", str(out1), "--batch", "64"])
    out2 = tmp_path / "b.tsv"
    _run_main(["--import", tiny_ckpt, "--out", str(out2), "--batch", "64",
               str(out1)])  # compares b vs a -> PARITY OK (no SystemExit)


def test_compare_detects_mismatch(tiny_ckpt, tmp_path):
    out = tmp_path / "a.tsv"
    _run_main(["--import", tiny_ckpt, "--out", str(out), "--batch", "64"])
    df = pd.read_csv(out, sep="\t")
    df["zeroShotScore"] = df["zeroShotScore"] + 0.5
    bad = tmp_path / "shifted.tsv"
    df.to_csv(bad, sep="\t", index=False)
    with pytest.raises(SystemExit) as e:
        _run_main([str(out), str(bad)])
    assert e.value.code == 1


def test_audit_clean_checkpoint(tiny_ckpt, capsys):
    with pytest.raises(SystemExit) as e:
        _run_main(["--audit", tiny_ckpt])
    assert e.value.code == 0
    report = json.loads(capsys.readouterr().out)
    assert report["ok"] and not report.get("unconsumed")


def test_audit_flags_corrupted_checkpoint(tiny_ckpt, tmp_path, capsys):
    """A checkpoint with an extra tensor must fail the audit bijection."""
    import shutil

    import torch

    broken = tmp_path / "broken"
    shutil.copytree(tiny_ckpt, broken)
    f = broken / "pytorch_model.bin"
    tensors = torch.load(f, map_location="cpu", weights_only=True)
    tensors["totally.unknown.weight"] = torch.zeros((3, 3))
    torch.save(tensors, f)
    with pytest.raises(SystemExit) as e:
        _run_main(["--audit", str(broken)])
    assert e.value.code == 1
