"""Reference parity fixtures driven end-to-end.

The reference repo ships real parity inputs — examples/example_snp.tsv (190
SNPs with 512-bp windows, 5 rows carrying non-ACGT alleles) — that
BASELINE.md names as the scoring-parity fixtures. These tests make them
load-bearing: the full table runs through cli.zero_shot_score (schema,
invalid-row filter, TSV and BED writers), and a pinned-seed golden file
(tests/goldens/) regression-locks the numeric scores of the l20 preset.
VCF mode is exercised on a synthetic FASTA+VCF covering the reference's
edge N-padding, multi-allelic comma-joining, non-SNV "." emission, and
record-drop semantics (src/zero_shot_score.py:137-214).
"""

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

FIXTURE = Path("/root/reference/examples/example_snp.tsv")
GOLDEN = Path(__file__).parent / "goldens" / "example_snp_l20_seed0.json"

pytestmark = pytest.mark.skipif(not FIXTURE.exists(),
                                reason="reference fixture not present")


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A tiny exported HF-format checkpoint so the full 190-row fixture runs
    through the real CLI (strict import included) in seconds."""
    import jax

    from plantcaduceus_tpu.compat.hf_export import export_hf_dir
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig

    cfg = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16, d_state=4)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    d = tmp_path_factory.mktemp("ckpt") / "tiny"
    export_hf_dir(d, params, cfg)
    return str(d)


def test_fixture_tsv_cli_schema_and_filtering(tiny_ckpt, tmp_path):
    from plantcaduceus_tpu.cli.zero_shot_score import main

    out = tmp_path / "scores.tsv"
    main(["-input-table", str(FIXTURE), "-model", tiny_ckpt,
          "-output", str(out), "-batchSize", "64", "-dtype", "float32",
          "-no-progress"])
    src = pd.read_csv(FIXTURE, sep="\t")
    got = pd.read_csv(out, sep="\t")
    # exactly the 5 non-SNV rows are dropped; all input columns preserved
    valid = src["ref"].isin(list("ACGT")) & src["alt"].isin(list("ACGT"))
    assert len(src) == 190 and int(valid.sum()) == 185
    assert len(got) == 185
    assert list(got.columns) == list(src.columns) + ["zeroShotScore"]
    assert np.isfinite(got["zeroShotScore"]).all()
    # dropped rows are the invalid ones, in order
    pd.testing.assert_frame_equal(
        got[src.columns].reset_index(drop=True),
        src[valid].reset_index(drop=True))


def test_fixture_bed_output(tiny_ckpt, tmp_path):
    from plantcaduceus_tpu.cli.zero_shot_score import main

    out = tmp_path / "scores.bed"
    main(["-input-table", str(FIXTURE), "-model", tiny_ckpt,
          "-output", str(out), "-outBED", "-batchSize", "64",
          "-dtype", "float32", "-no-progress"])
    bed = pd.read_csv(out, sep="\t", header=None,
                      names=["chr", "start", "end", "ref", "alt", "score"])
    src = pd.read_csv(FIXTURE, sep="\t")
    valid = src[src["ref"].isin(list("ACGT")) & src["alt"].isin(list("ACGT"))]
    assert len(bed) == 185
    # BED half-open interval wraps the 1-based SNP position
    np.testing.assert_array_equal(bed["start"].to_numpy(),
                                  valid["pos"].to_numpy() - 1)
    np.testing.assert_array_equal(bed["end"].to_numpy(),
                                  valid["pos"].to_numpy())
    assert np.isfinite(bed["score"]).all()


def test_fixture_golden_scores_l20():
    """Pinned-seed numeric regression on the real l20 preset (random weights,
    seed 0, float32). Any change to tokenizer layout, masking, window
    semantics, model math, or the scoring engine moves these numbers."""
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine import zero_shot
    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.utils.model_loading import load_model_and_tokenizer

    df = pd.read_csv(FIXTURE, sep="\t").head(16)
    params, cfg, tok = load_model_and_tokenizer("l20", seed=0)
    runner = InferenceRunner(params, cfg, dtype=jnp.float32, batch_size=16)
    got = zero_shot.score_table(runner, tok, df, progress=False)

    golden = json.loads(GOLDEN.read_text())
    assert [int(p) for p in got["pos"]] == golden["pos"]
    np.testing.assert_allclose(got["zeroShotScore"].to_numpy(),
                               np.asarray(golden["zeroShotScore"]),
                               rtol=1e-3, atol=1e-3)


def test_vcf_mode_semantics(tiny_ckpt, tmp_path):
    """Edge N-padding, multi-allelic joining, non-SNV '.', record dropping —
    the src/zero_shot_score.py:137-214 contract — through the real CLI."""
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), 600))
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1\n" + "\n".join(
        seq[i:i + 70] for i in range(0, 600, 70)) + "\n")
    vcf = tmp_path / "in.vcf"

    def alt_not(base, k=1):
        return [c for c in "ACGT" if c != base][:k]

    r5, r300, r590 = seq[4], seq[299], seq[589]
    a300 = alt_not(r300, 2)
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        # near the left edge: window must be N-padded, still scored
        f"chr1\t5\t.\t{r5}\t{alt_not(r5)[0]}\t.\t.\tDP=1\n"
        # multi-allelic with one SNV and one indel: score then '.'
        f"chr1\t300\t.\t{r300}\t{a300[0]},TTG,{a300[1]}\t.\t.\t.\n"
        # indel-only record: dropped from the output
        "chr1\t400\t.\tA\tATT\t.\t.\t.\n"
        # near the right edge
        f"chr1\t590\t.\t{r590}\t{alt_not(r590)[0]}\t.\t.\t.\n")

    from plantcaduceus_tpu.cli.zero_shot_score import main

    out = tmp_path / "out.vcf"
    main(["-input-vcf", str(vcf), "-input-fasta", str(fa), "-model",
          tiny_ckpt, "-output", str(out), "-batchSize", "8",
          "-dtype", "float32", "-no-progress"])

    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert len(lines) == 3  # indel-only record dropped
    header = out.read_text()
    assert "plantCAD_zero_shot" in header.split("\n#CHROM")[0]  # INFO header

    def info_scores(line):
        info = line.split("\t")[7]
        val = [f for f in info.split(";") if
               f.startswith("plantCAD_zero_shot=")][0]
        return val.split("=", 1)[1].split(",")

    s5, s300, s590 = (info_scores(l) for l in lines)
    assert len(s5) == 1 and np.isfinite(float(s5[0]))
    # multi-allelic: SNV score, '.', SNV score — in ALT order
    assert len(s300) == 3 and s300[1] == "."
    assert np.isfinite(float(s300[0])) and np.isfinite(float(s300[2]))
    assert len(s590) == 1 and np.isfinite(float(s590[0]))
    # pre-existing INFO is preserved ahead of the annotation
    assert lines[0].split("\t")[7].startswith("DP=1;")
