"""Pre-training data pipeline.

Feeds the masked-LM trainer with fixed-length genome windows + soft-mask
loss weights, reproducing src/HF_pre_train.py's tokenize/map path over the
Angiosperm corpus (HF dataset with columns assembly/chrom/start/end/strand/
seq — removed after tokenisation at :444) without requiring HF hub access:

* ``sequence_source`` abstracts where raw sequences come from: an HF dataset
  (hub id or load_from_disk dir), a TSV/parquet with a ``seq`` column, a
  FASTA sliced into windows, or a synthetic stream (smoke tests).
* ``PretrainDataset`` tokenises, computes lowercase soft-mask weights
  (HF_pre_train.py:424-437), applies the MLM collator, and yields
  fixed-shape numpy batches. Multi-host: records stripe by
  (process_index, process_count) — SURVEY.md §2.7's record-striding plan.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator, List, Optional

import numpy as np

from plantcaduceus_tpu.io.fasta import iter_fasta
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
from plantcaduceus_tpu.train.masking import MlmCollator, soft_mask_weights

log = logging.getLogger(__name__)


# In-memory source cap: ~2M 512-bp windows ≈ 1 GB of Python strings. The
# materialised path exists for fixtures/fine-tune tables; corpus-scale
# pre-training must stream (train.streaming), which is O(buffer) RSS.
DEFAULT_MAX_SEQUENCES = 2_000_000


def _capped(it, max_sequences: int, spec: str) -> List[str]:
    out: List[str] = []
    for s in it:
        out.append(s)
        if len(out) > max_sequences:
            raise ValueError(
                f"dataset {spec!r} exceeds the in-memory cap of "
                f"{max_sequences} sequences; use the streaming path instead "
                f"(--dataset shards:<dir-or-file>, train/streaming.py) or "
                f"raise max_sequences explicitly")
    return out


def sequence_source(spec: str, split: str = "train",
                    seq_column: str = "seq",
                    window: int = 512, stride: Optional[int] = None,
                    synthetic_n: int = 4096,
                    seed: int = 0,
                    max_sequences: int = DEFAULT_MAX_SEQUENCES) -> List[str]:
    """Resolve a dataset spec to a list of raw sequences.

    spec forms:
      ``synthetic``                     — random ACGT windows (smoke/bench)
      ``path.tsv`` / ``path.parquet``   — table with a seq column
      ``path.fa[.gz]``                  — FASTA tiled into windows
      ``hf:<name-or-dir>``              — HF datasets (hub id or saved dir)

    Sources larger than ``max_sequences`` are refused with a pointer at the
    O(buffer)-memory streaming path (``shards:`` specs).
    """
    if spec == "synthetic":
        rng = np.random.default_rng(seed)
        bases = np.array(list("ACGTacgt"))
        return ["".join(rng.choice(bases, window)) for _ in range(synthetic_n)]

    p = Path(spec)
    if p.suffix in (".tsv", ".txt", ".csv"):
        import pandas as pd

        df = pd.read_csv(p, sep="\t")
        col = seq_column if seq_column in df.columns else "sequences"
        return _capped(df[col].astype(str), max_sequences, spec)
    if p.suffix == ".parquet":
        import pandas as pd

        df = pd.read_parquet(p)
        return _capped(df[seq_column].astype(str), max_sequences, spec)
    if p.name.endswith((".fa", ".fasta", ".fa.gz", ".fasta.gz")):
        stride = stride or window

        def windows():
            for _, seq in iter_fasta(p):
                for i in range(0, max(1, len(seq) - window + 1), stride):
                    w = seq[i : i + window]
                    if len(w) == window:
                        yield w

        return _capped(windows(), max_sequences, spec)
    if spec.startswith("hf:"):
        import datasets

        name = spec[3:]
        if Path(name).is_dir():
            ds = datasets.load_from_disk(name)
        else:
            ds = datasets.load_dataset(name)
        if hasattr(ds, "keys") and split in ds:
            ds = ds[split]
        return _capped((str(x) for x in ds[seq_column]), max_sequences, spec)
    raise ValueError(f"unrecognised dataset spec {spec!r}")


class PretrainDataset:
    """Shuffled, host-sharded, collated batch stream."""

    def __init__(
        self,
        sequences: List[str],
        tokenizer: DnaTokenizer,
        batch_size: int,
        soft_masked_weight: float = 0.1,
        mlm_probability: float = 0.15,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        # Host-shard by record striding (deterministic across hosts).
        self.sequences = sequences[process_index::process_count]
        if not self.sequences:
            raise ValueError("no sequences for this host shard")
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.soft_masked_weight = soft_masked_weight
        self.collator = MlmCollator(tokenizer, mlm_probability, seed=seed + 1)
        self.seed = seed
        self.n_batches_per_epoch = max(1, len(self.sequences) // batch_size)
        self._order_cache = (-1, None)

    def batch_at(self, step: int) -> dict:
        """The batch for a global step, as a PURE function of (seed, step):
        the epoch's shuffle order and the step's MLM mask both come from
        counter-keyed generators. This is what makes checkpoint autoresume
        reproduce an uninterrupted run exactly (the reference's HF Trainer
        gets the same property by replaying/skipping the dataloader;
        re-keying is the O(1) equivalent)."""
        epoch, k = divmod(step, self.n_batches_per_epoch)
        if self._order_cache[0] != epoch:  # one permutation per epoch
            self._order_cache = (epoch, np.random.default_rng(
                [self.seed, epoch]).permutation(len(self.sequences)))
        order = self._order_cache[1]
        idx = order[k * self.batch_size : (k + 1) * self.batch_size]
        seqs = [self.sequences[j] for j in idx]
        ids = self.tokenizer.encode_batch(seqs)
        w = soft_mask_weights(seqs, self.soft_masked_weight)
        return self.collator(
            ids, loss_weights=w,
            rng=np.random.default_rng([self.seed + 1, step]))

    def iter_from(self, start_step: int) -> Iterator[dict]:
        step = start_step
        while True:  # steps-based training; epochs loop forever
            yield self.batch_at(step)
            step += 1

    def __iter__(self) -> Iterator[dict]:
        return self.iter_from(0)

    def eval_batches(self, n: Optional[int] = None) -> Iterator[dict]:
        """Deterministic pass (no shuffle) over up to n batches."""
        count = 0
        for i in range(0, len(self.sequences) - self.batch_size + 1,
                       self.batch_size):
            if n is not None and count >= n:
                return
            seqs = self.sequences[i : i + self.batch_size]
            ids = self.tokenizer.encode_batch(seqs)
            w = soft_mask_weights(seqs, self.soft_masked_weight)
            yield self.collator(ids, loss_weights=w)
            count += 1
