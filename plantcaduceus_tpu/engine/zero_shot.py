"""Zero-shot variant-effect scoring — the north-star workload.

Reproduces src/zero_shot_score.py end-to-end on TPU: mask the window center,
masked-LM forward, softmax over the four nucleotide logits, score
``log(P_alt) - log(P_ref)``. Two input modes (TSV with ref/alt/sequences
columns; VCF+FASTA with reference window semantics), three output modes
(TSV with ``zeroShotScore``, BED, annotated VCF with
``INFO plantCAD_zero_shot``).

Multi-host: records are striped across processes
(``sequences[process_index::process_count]`` in :func:`nucleotide_probs`)
and scores all-gathered host-side before the single writer process emits
output.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

from plantcaduceus_tpu.engine.runner import InferenceRunner
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
from plantcaduceus_tpu.io.vcf import (
    ZERO_SHOT_INFO_HEADER,
    VcfReader,
    VcfWriter,
)

log = logging.getLogger(__name__)

NUCLEOTIDES = ("A", "C", "G", "T")


def mask_and_encode(sequences: Sequence[str], tokenizer: DnaTokenizer,
                    token_idx: int) -> np.ndarray:
    """Encode windows and set the scored index to [MASK]."""
    ids = tokenizer.encode_batch(sequences)
    ids[:, token_idx] = tokenizer.mask_token_id
    return ids


def _dedup(sequences: Sequence[str]):
    """(unique_sequences, inverse) such that unique[inverse[i]] ==
    sequences[i], preserving first-occurrence order.

    Saturation mutagenesis (pipelines/mutagenesis.py, mirroring the
    reference's 1_simulation.R) emits 3 records per position that all share
    one window — the masked forward depends only on the window, so scoring
    unique windows once is a ~3x end-to-end win on that pipeline and a
    no-op (zero-copy passthrough) when all windows are distinct."""
    index_of: dict = {}
    inverse = np.empty(len(sequences), np.int64)
    unique: List[str] = []
    for i, s in enumerate(sequences):
        j = index_of.setdefault(s, len(unique))
        if j == len(unique):
            unique.append(s)
        inverse[i] = j
    if len(unique) == len(sequences):
        return sequences, None
    return unique, inverse


def _unstripe(gathered: np.ndarray, counts) -> np.ndarray:
    """Reassemble globally-ordered rows from per-host strided shards.
    gathered: [n_hosts, per_host_padded, ...]; counts[h] = real rows of host
    h (host h held records h::n_hosts)."""
    total = int(sum(counts))
    out = np.zeros((total,) + gathered.shape[2:], gathered.dtype)
    n = gathered.shape[0]
    for h in range(n):
        out[h::n] = gathered[h, : counts[h]]
    return out


def nucleotide_probs(runner: InferenceRunner, tokenizer: DnaTokenizer,
                     sequences: Sequence[str], token_idx: int,
                     progress: bool = True) -> np.ndarray:
    """[N, 4] softmax probs over a,c,g,t at the masked center.

    Multi-host: each process scores its stride of the records
    (``sequences[process_index::process_count]``) and results are
    all-gathered so every host holds the full, globally-ordered array —
    SURVEY.md §2.7's record-striding + all_gather plan."""
    import jax

    from plantcaduceus_tpu.io.tokenizer import nucleotide_ids

    nuc_ids = nucleotide_ids(tokenizer)
    sequences, inverse = _dedup(sequences)
    if inverse is not None:
        log.info("Scoring %d unique windows for %d records",
                 len(sequences), len(inverse))
    if len(sequences) == 0:
        return np.zeros((0, 4), np.float32)
    n_proc = jax.process_count()
    if n_proc == 1:
        ids = mask_and_encode(sequences, tokenizer, token_idx)
        probs = runner.masked_probs(ids, nuc_ids, token_idx,
                                    progress=progress)
    else:
        from jax.experimental import multihost_utils

        k = jax.process_index()
        mine = list(sequences[k::n_proc])
        if mine:
            ids = mask_and_encode(mine, tokenizer, token_idx)
            local = runner.masked_probs(ids, nuc_ids, token_idx,
                                        progress=progress)
        else:  # fewer records than hosts: still join the all-gather
            local = np.zeros((0, 4), np.float32)
        per = -(-len(sequences) // n_proc)
        if len(mine) < per:  # pad so all hosts contribute equal shapes
            local = np.concatenate(
                [local, np.zeros((per - len(mine),) + local.shape[1:],
                                 local.dtype)])
        gathered = np.asarray(multihost_utils.process_allgather(local))
        counts = [len(sequences[h::n_proc]) for h in range(n_proc)]
        probs = _unstripe(gathered, counts)
    return probs if inverse is None else probs[inverse]


def log_ratio_scores(probs: np.ndarray, refs: Sequence[str],
                     alts: Sequence[str]) -> np.ndarray:
    """log(P_alt / P_ref) per row (src/zero_shot_score.py:124-134)."""
    ref_idx = np.asarray([NUCLEOTIDES.index(r) for r in refs])
    alt_idx = np.asarray([NUCLEOTIDES.index(a) for a in alts])
    rows = np.arange(len(probs))
    return np.log(probs[rows, alt_idx] / probs[rows, ref_idx])


# ---------------------------------------------------------------------------
# TSV mode
# ---------------------------------------------------------------------------


def score_table(runner: InferenceRunner, tokenizer: DnaTokenizer, df,
                token_idx: int = 255, progress: bool = True):
    """Score a pandas dataframe with ref/alt/sequences columns in place.
    Invalid (non-SNP) rows are dropped, as the reference does
    (src/zero_shot_score.py:229-233). Returns the filtered frame with a
    ``zeroShotScore`` column."""
    valid = df["ref"].isin(NUCLEOTIDES) & df["alt"].isin(NUCLEOTIDES)
    n_dropped = int((~valid).sum())
    if n_dropped:
        log.info("Filtered out %d invalid SNPs", n_dropped)
    df = df[valid].copy()
    probs = nucleotide_probs(runner, tokenizer, df["sequences"].tolist(),
                             token_idx, progress=progress)
    df["zeroShotScore"] = log_ratio_scores(probs, df["ref"].tolist(),
                                           df["alt"].tolist())
    return df


def write_table(df, output: str, as_bed: bool = False) -> None:
    if as_bed:
        out = df.copy()
        out["start"] = out["pos"] - 1
        out["end"] = out["pos"]
        out = out[["chr", "start", "end", "ref", "alt", "zeroShotScore"]]
        out.to_csv(output, sep="\t", index=False, header=False)
    else:
        df.to_csv(output, sep="\t", index=False)


# ---------------------------------------------------------------------------
# VCF mode
# ---------------------------------------------------------------------------


def windows_from_vcf(vcf_path, fasta_path, window: int = 512,
                     token_idx: int = 255) -> Tuple[List[str], List[int]]:
    """Extract scoring windows for every record with at least one SNV alt.
    Returns (sequences, record_indices) exactly like
    src/zero_shot_score.py:172-214 (including edge N-padding). Uses the C++
    libpcio FASTA reader when built (io.native), Python fallback otherwise."""
    from plantcaduceus_tpu.io.native import open_fasta

    fasta = open_fasta(fasta_path)
    sequences: List[str] = []
    record_indices: List[int] = []
    prev_chrom: Optional[str] = None
    for idx, rec in enumerate(VcfReader(vcf_path)):
        if not rec.has_snv:
            continue
        seq = fasta.window(rec.chrom, rec.pos0, window, token_idx)
        sequences.append(seq)
        record_indices.append(idx)
        if prev_chrom is not None and prev_chrom != rec.chrom:
            fasta.evict(prev_chrom)
        prev_chrom = rec.chrom
    return sequences, record_indices


def annotate_vcf(vcf_path, output: str, record_indices: Sequence[int],
                 probs: np.ndarray) -> None:
    """Re-read the VCF and write scores into INFO plantCAD_zero_shot; non-SNV
    alt alleles emit '.' (src/zero_shot_score.py:137-169)."""
    reader = VcfReader(vcf_path)
    by_record = {int(r): i for i, r in enumerate(record_indices)}
    with VcfWriter(output, reader.header_lines,
                   extra_info=[ZERO_SHOT_INFO_HEADER]) as writer:
        for idx, rec in enumerate(reader):
            row = by_record.get(idx)
            if row is None:
                continue
            p = probs[row]
            ref_p = p[NUCLEOTIDES.index(rec.ref.upper())]
            scores = []
            for alt in rec.alts:
                if rec.alt_is_snv(alt):
                    alt_p = p[NUCLEOTIDES.index(alt.upper())]
                    scores.append(str(np.log(alt_p / ref_p)))
                else:
                    scores.append(".")
            writer.write(rec.with_info("plantCAD_zero_shot", ",".join(scores)))


def score_vcf(runner: InferenceRunner, tokenizer: DnaTokenizer,
              vcf_path, fasta_path, output: str,
              token_idx: int = 255, window: int = 512,
              progress: bool = True) -> int:
    """Full VCF pipeline. Returns number of scored records."""
    sequences, record_indices = windows_from_vcf(vcf_path, fasta_path,
                                                 window, token_idx)
    log.info("Scoring %d SNV records", len(sequences))
    probs = nucleotide_probs(runner, tokenizer, sequences, token_idx,
                             progress=progress)
    annotate_vcf(vcf_path, output, record_indices, probs)
    return len(sequences)
