"""Differential parity against the reference's OWN code and artifacts.

Everything checkable offline, checked against the reference itself rather
than re-derived expectations:

* tokenizer byte-exactness vs the serialized artifacts the reference vendors
  at pretrain/llmlib/tokenization/autotoks/ (loaded through both
  ``DnaTokenizer.from_hf_dir`` and HF ``AutoTokenizer`` as the oracle);
* fuzz comparisons of repo math vs the reference's pure functions —
  ``_sv_llr_boundary`` + eval metrics (src/zero-shot-eval.py:181-320),
  zero-shot log-ratio scoring (src/zero_shot_score.py:124-134), VCF window
  cutting (src/zero_shot_score.py:172-214), RC embedding averaging
  (src/train_XGBoost.py:96-114), and the LoRA metric suites
  (src/lora_fine_tune.py:517-563).

The reference functions are ast-extracted from /root/reference at test time
and exec'd with stubbed third-party deps (tqdm, PyVCF, Biopython) — the
reference source is never vendored into this repo.
"""

from __future__ import annotations

import ast
import gzip
import logging
import types
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree unavailable")


def _tqdm(iterable=None, *args, **kwargs):
    return iterable


def load_ref(relpath: str, names, consts=(), extra=None) -> dict:
    """Extract named top-level functions (+ constant assigns) from a
    reference source file and exec them in an isolated namespace."""
    src = (REF / relpath).read_text()
    tree = ast.parse(src)
    keep = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in names:
            keep.append(node)
        elif isinstance(node, ast.Assign) and consts:
            tgt = node.targets[0]
            if isinstance(tgt, ast.Name) and tgt.id in consts:
                keep.append(node)
    found = {n.name for n in keep if isinstance(n, ast.FunctionDef)}
    missing = set(names) - found
    assert not missing, f"reference functions not found in {relpath}: {missing}"
    mod = ast.Module(body=keep, type_ignores=[])
    g = {
        "np": np, "pd": pd, "tqdm": _tqdm, "logging": logging,
        "List": List, "Optional": Optional, "Sequence": Sequence,
    }
    if extra:
        g.update(extra)
    exec(compile(mod, str(REF / relpath), "exec"), g)
    return g


# ---------------------------------------------------------------------------
# Tokenizer byte-exactness vs the vendored autotoks artifacts (B19)
# ---------------------------------------------------------------------------

AUTOTOKS = [
    REF / "pretrain/llmlib/tokenization/autotoks/hg38_char_tokenizer_maxlen_None",
    REF / "pretrain/llmlib/tokenization/autotoks/hg38_char_tokenizer_maxlen_2048",
]


@pytest.fixture(scope="module", params=[p.name for p in AUTOTOKS])
def autotok_dir(request):
    d = next(p for p in AUTOTOKS if p.name == request.param)
    if not d.exists():
        pytest.skip(f"{d} absent from reference snapshot")
    return d


@pytest.fixture(scope="module")
def hf_tok(autotok_dir):
    transformers = pytest.importorskip("transformers")
    return transformers.AutoTokenizer.from_pretrained(str(autotok_dir))


def test_autotoks_vocab_layout_byte_exact(autotok_dir, hf_tok):
    """from_hf_dir must reproduce the artifact's id layout exactly —
    the hg38_char_tokenizer_mlm.py layout (PAD=0 UNK=1 CLS=2 SEP=3 MASK=4
    RESERVED=5 BOS=6 A=7 C=8 G=9 T=10 N=11)."""
    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer

    ours = DnaTokenizer.from_hf_dir(autotok_dir)
    assert ours.get_vocab() == hf_tok.get_vocab()
    assert ours.mask_token_id == hf_tok.mask_token_id == 4
    assert ours.pad_token_id == hf_tok.pad_token_id == 0
    assert ours.unk_token_id == hf_tok.unk_token_id == 1
    assert ours.get_vocab() == {
        "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4,
        "[RESERVED]": 5, "[BOS]": 6, "A": 7, "C": 8, "G": 9, "T": 10, "N": 11}


def test_autotoks_token_ids_match_hf_oracle(autotok_dir, hf_tok):
    """Per-token id assignment parity: our per-char encode of each vocab
    character equals HF convert_tokens_to_ids (the normalizer-free path)."""
    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer

    ours = DnaTokenizer.from_hf_dir(autotok_dir)
    for tok in ours.get_vocab():
        if len(tok) == 1:
            assert int(ours.encode(tok)[0]) == hf_tok.convert_tokens_to_ids(tok), tok


def test_autotoks_string_encode_is_degenerate_upstream(autotok_dir, hf_tok):
    """Documented quirk: the serialized artifact pairs a lowercasing
    BertNormalizer with an UPPERCASE vocab, so its own raw-string encode maps
    every DNA word to [UNK] — verified here against the HF oracle so the
    parity claim ("our id layout matches; raw-string behavior upstream is
    broken, ours is the generator's intent") rests on checked fact."""
    ids = hf_tok("ACGTN", add_special_tokens=False)["input_ids"]
    assert ids == [hf_tok.unk_token_id]
    ids = hf_tok("A C G T", add_special_tokens=False)["input_ids"]
    assert ids == [hf_tok.unk_token_id] * 4  # lowercased 'a' not in vocab

    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer

    ours = DnaTokenizer.from_hf_dir(autotok_dir)
    # Our loader keeps the generator's intent: chars map to their vocab ids.
    np.testing.assert_array_equal(ours.encode("ACGTN"), [7, 8, 9, 10, 11])


def test_autotoks_save_roundtrip(tmp_path, autotok_dir):
    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer

    ours = DnaTokenizer.from_hf_dir(autotok_dir)
    ours.save(tmp_path / "tok")
    again = DnaTokenizer.from_hf_dir(tmp_path / "tok")
    assert again.get_vocab() == ours.get_vocab()
    assert again.lowercase == ours.lowercase
    np.testing.assert_array_equal(again.encode("ACGTNacgtnX"),
                                  ours.encode("ACGTNacgtnX"))


# ---------------------------------------------------------------------------
# zero-shot-eval.py — _sv_llr_boundary + metric functions (fuzz)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_eval():
    from sklearn.metrics import auc, average_precision_score, roc_curve

    return load_ref(
        "src/zero-shot-eval.py",
        names=["_sv_llr_boundary", "_compute_true_tokens_from_seq",
               "_metric_token_accuracy", "_metric_motif_accuracy",
               "_compute_auroc", "_refprob_scores", "_avg_trueprob_scores"],
        consts=("NUCLEOTIDES", "NUCLEOTIDES_LOWER", "NUCLEOTIDE_TO_INDEX"),
        extra={"roc_curve": roc_curve, "auc": auc,
               "average_precision_score": average_precision_score})


def _rand_probs(rng, *shape):
    p = rng.random(shape).astype(np.float32) + 1e-3
    return p / p.sum(axis=-1, keepdims=True)


def _rand_seq(rng, n, alphabet="ACGTacgtNn"):
    return "".join(rng.choice(list(alphabet), n))


@pytest.mark.parametrize("seed,flanking", [(0, 4), (1, 8), (2, 16)])
def test_sv_llr_boundary_matches_reference(ref_eval, seed, flanking):
    from plantcaduceus_tpu.engine import eval_tasks

    rng = np.random.default_rng(seed)
    n, L = 12, 128
    rows = []
    for _ in range(n):
        left = int(rng.integers(flanking + 1, L // 2))
        right = int(rng.integers(L // 2, L - flanking))
        rows.append({"left": left, "right": right,
                     "MutSeq": _rand_seq(rng, L)})
    df = pd.DataFrame(rows)
    ref_probs = _rand_probs(rng, n, L, 4)
    mut_probs = _rand_probs(rng, n, L, 4)

    theirs = ref_eval["_sv_llr_boundary"](df, ref_probs, mut_probs, flanking)
    ours = eval_tasks.sv_llr_boundary(rows, ref_probs, mut_probs, flanking)
    np.testing.assert_allclose(ours, theirs, rtol=0, atol=0)


def test_true_tokens_and_accuracy_match_reference(ref_eval, rng):
    from plantcaduceus_tpu.engine import eval_tasks

    n, L, motif = 24, 32, 4
    seqs = [_rand_seq(rng, L) for _ in range(n)]
    positions = sorted(rng.choice(L, motif, replace=False).tolist())
    theirs_tok = ref_eval["_compute_true_tokens_from_seq"](pd.Series(seqs),
                                                           positions)
    ours_tok = eval_tasks.true_tokens_from_seq(seqs, positions)
    np.testing.assert_array_equal(ours_tok, theirs_tok)

    probs = _rand_probs(rng, n * motif, 4)
    assert eval_tasks.token_accuracy(probs, ours_tok) == \
        ref_eval["_metric_token_accuracy"](probs, theirs_tok)
    assert eval_tasks.motif_accuracy(probs, ours_tok, motif) == \
        ref_eval["_metric_motif_accuracy"](probs, theirs_tok, motif)
    np.testing.assert_allclose(
        eval_tasks.avg_trueprob_scores(probs, ours_tok, motif),
        ref_eval["_avg_trueprob_scores"](probs, theirs_tok, motif),
        rtol=0, atol=0)


def test_refprob_and_auroc_match_reference(ref_eval, rng):
    from plantcaduceus_tpu.engine import eval_tasks

    n, L, token_idx = 40, 16, 7
    seqs = [_rand_seq(rng, L) for _ in range(n)]
    labels = rng.integers(0, 2, n)
    labels[:2] = [0, 1]  # both classes present
    df = pd.DataFrame({"seq": seqs, "label": labels})
    probs = _rand_probs(rng, n, 1, 4)

    theirs_scores = ref_eval["_refprob_scores"](df, probs, token_idx, "seq")
    ours_scores = eval_tasks.refprob_scores(seqs, probs, token_idx)
    np.testing.assert_allclose(ours_scores, theirs_scores, rtol=0, atol=0)

    theirs_auroc = ref_eval["_compute_auroc"](df, probs, token_idx, "seq")
    ours_auroc = eval_tasks.auroc_auprc(labels, ours_scores)["auroc"]
    assert ours_auroc == pytest.approx(theirs_auroc, abs=0)


# ---------------------------------------------------------------------------
# zero_shot_score.py — log-ratio scoring + VCF window cutting
# ---------------------------------------------------------------------------


def test_log_ratio_scores_match_reference(rng):
    from plantcaduceus_tpu.engine.zero_shot import log_ratio_scores

    ref_zs = load_ref("src/zero_shot_score.py", names=["zero_shot_score"])
    n = 64
    probs = _rand_probs(rng, n, 4)
    refs = rng.choice(list("ACGT"), n).tolist()
    alts = rng.choice(list("ACGT"), n).tolist()
    df = pd.DataFrame({"ref": refs, "alt": alts})
    theirs = np.asarray(ref_zs["zero_shot_score"](df, probs))
    ours = log_ratio_scores(probs, refs, alts)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=0)


class _FakeSeqSlice:
    def __init__(self, s):
        self.seq = s


class _FakeChromRecord:
    def __init__(self, s):
        self._s = s

    def __getitem__(self, sl):
        return _FakeSeqSlice(self._s[sl])


class _FakeSeqIO:
    """Biopython SeqIO facade over plain FASTA text (to_dict/parse only)."""

    @staticmethod
    def parse(handle_or_path, fmt):
        assert fmt == "fasta"
        if hasattr(handle_or_path, "read"):
            text = handle_or_path.read()
        else:
            text = Path(handle_or_path).read_text()
        name, parts = None, []
        for line in text.splitlines():
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(parts)
                name, parts = line[1:].split()[0], []
            else:
                parts.append(line.strip())
        if name is not None:
            yield name, "".join(parts)

    @staticmethod
    def to_dict(records):
        return {name: _FakeChromRecord(seq) for name, seq in records}


class _FakeAlt:
    """PyVCF _Substitution semantics: type is SNV iff the ALT is 1 base
    (PyVCF does not consult REF length)."""

    def __init__(self, s):
        self.sequence = s
        self.type = "SNV" if len(s) == 1 else "MNV"


class _FakeVcfReader:
    def __init__(self, filename):
        self.filename = filename

    def __iter__(self):
        opener = gzip.open if str(self.filename).endswith(".gz") else open
        with opener(self.filename, "rt") as fh:
            for line in fh:
                if line.startswith("#") or not line.strip():
                    continue
                f = line.rstrip("\n").split("\t")
                yield types.SimpleNamespace(
                    CHROM=f[0], POS=int(f[1]), REF=f[3],
                    ALT=[_FakeAlt(a) for a in f[4].split(",")])


def _write_window_fixture(tmp_path, rng):
    fa = tmp_path / "genome.fa"
    chr1 = _rand_seq(rng, 700, alphabet="ACGTacgt")
    chr2 = _rand_seq(rng, 400, alphabet="ACGTacgt")
    fa.write_text(f">chr1 assembly\n{chr1}\n>chr2\n{chr2}\n")
    records = [
        # near-start: pos0 < tokenIdx -> rjust N-pad
        ("chr1", 1, "A", "C"),
        ("chr1", 100, "G", "T"),
        # exactly at the boundary pos0 == tokenIdx
        ("chr1", 256, "C", "A"),
        ("chr1", 300, "T", "G,C"),         # multi-allelic SNVs
        ("chr1", 350, "A", "AT"),          # MNV alt only -> record skipped
        ("chr1", 400, "G", "GTT,C"),       # mixed: has one SNV -> kept
        ("chr1", 698, "C", "G"),           # near-end -> ljust N-pad
        ("chr2", 5, "T", "A"),             # chromosome switch (eviction)
        ("chr2", 399, "A", "T"),
    ]
    vcf_path = tmp_path / "in.vcf"
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    for chrom, pos, ref, alt in records:
        lines.append(f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t.\t.\t.")
    vcf_path.write_text("\n".join(lines) + "\n")
    return fa, vcf_path


@pytest.mark.parametrize("token_idx", [255, 100])
def test_vcf_window_cutting_matches_reference(tmp_path, rng, token_idx):
    """Window extraction parity incl. edge N-padding, boundary index, MNV
    skipping, multi-allelic records, and chromosome switching — fuzzed
    against the reference's own seq_from_vcf exec'd with stub deps
    (src/zero_shot_score.py:172-214)."""
    from plantcaduceus_tpu.engine.zero_shot import windows_from_vcf

    fa, vcf_path = _write_window_fixture(tmp_path, rng)
    ref_zs = load_ref("src/zero_shot_score.py", names=["seq_from_vcf"],
                      extra={"gzip": gzip, "sys": __import__("sys"),
                             "SeqIO": _FakeSeqIO,
                             "vcf": types.SimpleNamespace(Reader=_FakeVcfReader)})
    args = types.SimpleNamespace(inputVCF=str(vcf_path), inputFasta=str(fa),
                                 tokenIdx=token_idx)
    theirs_seqs, theirs_idx = ref_zs["seq_from_vcf"](args)
    ours_seqs, ours_idx = windows_from_vcf(vcf_path, fa, window=512,
                                           token_idx=token_idx)
    assert ours_idx == theirs_idx
    assert ours_seqs == theirs_seqs
    assert all(len(s) == 512 for s in ours_seqs)


def test_vcf_window_cutting_matches_reference_gzip(tmp_path, rng):
    from plantcaduceus_tpu.engine.zero_shot import windows_from_vcf

    fa, vcf_path = _write_window_fixture(tmp_path, rng)
    fa_gz = tmp_path / "genome.fa.gz"
    with gzip.open(fa_gz, "wt") as fh:
        fh.write(fa.read_text())
    ref_zs = load_ref("src/zero_shot_score.py", names=["seq_from_vcf"],
                      extra={"gzip": gzip, "sys": __import__("sys"),
                             "SeqIO": _FakeSeqIO,
                             "vcf": types.SimpleNamespace(Reader=_FakeVcfReader)})
    args = types.SimpleNamespace(inputVCF=str(vcf_path),
                                 inputFasta=str(fa_gz), tokenIdx=255)
    theirs_seqs, theirs_idx = ref_zs["seq_from_vcf"](args)
    ours_seqs, ours_idx = windows_from_vcf(vcf_path, fa_gz, window=512,
                                           token_idx=255)
    assert (ours_seqs, ours_idx) == (theirs_seqs, theirs_idx)


# ---------------------------------------------------------------------------
# train_XGBoost.py — RC-averaged center embeddings
# ---------------------------------------------------------------------------


def test_rc_average_embeddings_match_reference(rng):
    """Runs the reference's extract_embeddings (exec'd, with a fake torch
    model that replays OUR model's hidden states) and compares against the
    repo engine's RC-averaged center embeddings — both sides consume the
    identical forward, so any disagreement is in the RC-average math
    (src/train_XGBoost.py:96-114)."""
    import torch
    import jax
    import jax.numpy as jnp

    from plantcaduceus_tpu.engine.runner import InferenceRunner
    from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
    from plantcaduceus_tpu.models import caduceus
    from plantcaduceus_tpu.models.config import CaduceusConfig
    from plantcaduceus_tpu.parallel import mesh as meshlib

    cfg = CaduceusConfig(d_model=32, n_layer=2, vocab_size=16, d_state=8)
    params = caduceus.init_params(jax.random.PRNGKey(0), cfg)
    tok = DnaTokenizer()
    n, L, token_idx = 8, 64, 32
    seqs = [_rand_seq(rng, L, alphabet="ACGT") for _ in range(n)]
    ids = tok.encode_batch(seqs)

    hidden = np.asarray(
        caduceus.forward(params, jnp.asarray(ids), cfg, dtype=jnp.float32,
                         output_hidden_states=True)["hidden_states"],
        dtype=np.float32)

    class _FakeModel:
        def eval(self):
            return self

        def __call__(self, input_ids=None, output_hidden_states=False):
            return types.SimpleNamespace(
                hidden_states=[torch.tensor(hidden[: input_ids.shape[0]])])

    ref_xgb = load_ref("src/train_XGBoost.py", names=["extract_embeddings"],
                       extra={"torch": torch})
    loader = [{"input_ids": torch.tensor(ids)}]
    theirs = ref_xgb["extract_embeddings"](_FakeModel(), loader, "cpu",
                                           token_idx)

    mesh = meshlib.make_mesh(meshlib.MeshConfig(data=1),
                             devices=jax.devices()[:1])
    runner = InferenceRunner(params, cfg, mesh=mesh, dtype=jnp.float32,
                             batch_size=n)
    ours = runner.center_embeddings(ids, token_idx, progress=False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# lora_fine_tune.py — metric suites
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_lora_metrics():
    import torch
    from scipy.stats import pearsonr, spearmanr
    from sklearn.metrics import (accuracy_score, average_precision_score,
                                 f1_score, roc_auc_score)

    return load_ref(
        "src/lora_fine_tune.py",
        names=["compute_metrics_classification", "compute_metrics_regression",
               "compute_metrics_multilabel"],
        extra={"torch": torch, "accuracy_score": accuracy_score,
               "f1_score": f1_score, "roc_auc_score": roc_auc_score,
               "average_precision_score": average_precision_score,
               "pearsonr": pearsonr, "spearmanr": spearmanr})


def test_classification_metrics_match_reference(ref_lora_metrics, rng):
    from plantcaduceus_tpu.downstream import metrics

    logits = rng.normal(size=(50, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 50)
    labels[:2] = [0, 1]
    theirs = ref_lora_metrics["compute_metrics_classification"]((logits, labels))
    ours = metrics.classification_metrics(logits, labels)
    for k, v in theirs.items():
        assert ours[k] == pytest.approx(float(v), rel=1e-6), k


def test_regression_metrics_match_reference(ref_lora_metrics, rng):
    from plantcaduceus_tpu.downstream import metrics

    preds = rng.normal(size=(50, 1)).astype(np.float32)
    labels = (preds[:, 0] + rng.normal(scale=0.5, size=50)).astype(np.float64)
    theirs = ref_lora_metrics["compute_metrics_regression"]((preds, labels))
    ours = metrics.regression_metrics(preds, labels)
    for k, v in theirs.items():
        assert ours[k] == pytest.approx(float(v), rel=1e-5), k


def test_multilabel_metrics_match_reference(ref_lora_metrics, rng):
    from plantcaduceus_tpu.downstream import metrics

    logits = rng.normal(size=(40, 5)).astype(np.float32)
    labels = rng.integers(0, 2, (40, 5))
    labels[0] = 1
    labels[1] = 0
    theirs = ref_lora_metrics["compute_metrics_multilabel"]((logits, labels))
    ours = metrics.multilabel_metrics(logits, labels)
    for k, v in theirs.items():
        assert ours[k] == pytest.approx(float(v), rel=1e-5), k
