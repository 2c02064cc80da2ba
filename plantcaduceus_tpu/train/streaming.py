"""Sharded streaming dataset for large pre-training corpora.

Replaces the MosaicML streaming stack (MDS shards + deterministic multi-node
partitioning, reference pretrain/llmlib/data/text/mosaic_bert_text_data.py
and the MDS converters) with one TPU-native mechanism:

* a corpus is a directory of shard files (parquet / tsv / fasta / jsonl),
* shards are assigned round-robin to hosts from a deterministically shuffled
  order (seeded per epoch) — the num_canonical_nodes analogue,
* within a shard, records are block-shuffled with a bounded buffer, so
  memory stays O(buffer), not O(corpus),
* records flow through the same tokenise → soft-mask-weights → MLM-collate
  path as the in-memory pipeline.

``convert_to_shards`` is the offline converter (the MDS-writer analogue):
it splits any supported source into fixed-size parquet shards.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator, List, Optional, Sequence

import numpy as np

from plantcaduceus_tpu.io.fasta import iter_fasta
from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
from plantcaduceus_tpu.train.masking import MlmCollator, soft_mask_weights

log = logging.getLogger(__name__)

SHARD_SUFFIXES = (".parquet", ".tsv", ".txt", ".jsonl", ".fa", ".fasta")


def _read_shard(path: Path, seq_column: str, window: int,
                stride: Optional[int]) -> Iterator[str]:
    """Lazily yield the records of one shard. FASTA shards stream one
    chromosome at a time (O(chromosome) RSS, never O(file)) so a single
    multi-GB genome file works as a shard; table shards are loaded whole —
    the shard size IS the memory granularity there."""
    name = path.name
    if path.suffix == ".parquet":
        import pandas as pd

        yield from pd.read_parquet(path)[seq_column].astype(str)
        return
    if path.suffix in (".tsv", ".txt"):
        import pandas as pd

        df = pd.read_csv(path, sep="\t")
        col = seq_column if seq_column in df.columns else df.columns[0]
        yield from df[col].astype(str)
        return
    if path.suffix == ".jsonl":
        import json

        with open(path) as fh:
            for line in fh:
                if line.strip():
                    yield json.loads(line)[seq_column]
        return
    if name.endswith((".fa", ".fasta", ".fa.gz", ".fasta.gz")):
        stride = stride or window
        for _, seq in iter_fasta(path):
            for i in range(0, max(1, len(seq) - window + 1), stride):
                w = seq[i : i + window]
                if len(w) == window:
                    yield w
        return
    raise ValueError(f"unsupported shard type {path.suffix}")


class StreamingPretrainDataset:
    """Infinite batch stream over a shard directory."""

    def __init__(
        self,
        shard_dir,
        tokenizer: DnaTokenizer,
        batch_size: int,
        seq_column: str = "seq",
        window: int = 512,
        stride: Optional[int] = None,
        soft_masked_weight: float = 0.1,
        mlm_probability: float = 0.15,
        shuffle_buffer: int = 8192,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        eval_shards: int = 0,
        split: str = "train",
    ):
        """``eval_shards=K`` holds out the LAST K shards (sorted order) as
        the eval split; ``split`` selects which side this instance serves —
        the streaming analogue of the reference Trainer's train/validation
        datasets (HF_pre_train.py eval_strategy). ``shard_dir`` may also be
        a single shard FILE (e.g. one multi-GB genome FASTA): it streams
        windows at O(chromosome) memory."""
        root = Path(shard_dir)
        if root.is_file():
            shards = [root]
        else:
            shards = sorted(
                p for p in root.iterdir()
                if p.suffix in SHARD_SUFFIXES
                or p.name.endswith((".fa.gz", ".fasta.gz")))
        if not shards:
            raise FileNotFoundError(f"no shard files under {shard_dir}")
        if eval_shards:
            if eval_shards >= len(shards):
                raise ValueError(
                    f"eval_shards={eval_shards} would leave no training "
                    f"shards (corpus has {len(shards)})")
            shards = (shards[:-eval_shards] if split == "train"
                      else shards[-eval_shards:])
        elif split != "train":
            raise ValueError("split='eval' requires eval_shards > 0")
        self.shards = shards
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.seq_column = seq_column
        self.window = window
        self.stride = stride
        self.soft_masked_weight = soft_masked_weight
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.collator = MlmCollator(tokenizer, mlm_probability, seed=seed + 1)

    def _host_shards(self, epoch: int) -> List[Path]:
        """Deterministic epoch-shuffled shard order, striped across hosts.
        Every host computes the same global order (seeded by epoch), then
        takes its stride — the canonical-nodes partitioning analogue."""
        rng = np.random.default_rng(self.seed * 1000003 + epoch)
        order = rng.permutation(len(self.shards))
        mine = order[self.process_index :: self.process_count]
        if len(mine) == 0:  # fewer shards than hosts: share round-robin
            mine = [order[self.process_index % len(order)]]
        return [self.shards[i] for i in mine]

    def _records(self, epoch: int) -> Iterator[str]:
        rng = np.random.default_rng(self.seed * 7 + epoch * 13
                                    + self.process_index)
        buf: List[str] = []
        for shard in self._host_shards(epoch):
            for seq in _read_shard(shard, self.seq_column, self.window,
                                   self.stride):
                if len(seq) != self.window:
                    continue
                buf.append(seq)
                if len(buf) >= self.shuffle_buffer:
                    idx = rng.integers(len(buf))
                    buf[idx], buf[-1] = buf[-1], buf[idx]
                    yield buf.pop()
        rng.shuffle(buf := np.array(buf, dtype=object))
        yield from buf.tolist()

    def iter_from(self, start_step: int) -> Iterator[dict]:
        """Batch stream from a global step. Pre-``start_step`` batches are
        skipped WITHOUT tokenising/collating (shard IO still replays, which
        is what makes the resumed stream identical to the uninterrupted
        one); the MLM mask is keyed by the global batch index, so a resumed
        run reproduces an uninterrupted run's batches exactly."""
        epoch = 0
        step = 0
        pending: List[str] = []
        while True:
            for seq in self._records(epoch):
                pending.append(seq)
                if len(pending) == self.batch_size:
                    if step >= start_step:
                        ids = self.tokenizer.encode_batch(pending)
                        w = soft_mask_weights(pending, self.soft_masked_weight)
                        yield self.collator(
                            ids, loss_weights=w,
                            rng=np.random.default_rng([self.seed + 1, step]))
                    step += 1
                    pending = []
            epoch += 1

    def __iter__(self) -> Iterator[dict]:
        return self.iter_from(0)

    def eval_batches(self, n: Optional[int] = None) -> Iterator[dict]:
        """Deterministic pass over this split: shards in sorted order, no
        shuffle, collator rng keyed by batch index. Every host reads the
        SAME records (no striping): in multi-host training each host feeds
        identical local eval batches, so the mesh collectives inside
        eval_step always line up — eval is bounded by ``n`` batches, so the
        redundancy is cheap and the metrics are exact averages."""
        pending: List[str] = []
        count = 0
        for shard in self.shards:
            for seq in _read_shard(shard, self.seq_column, self.window,
                                   self.stride):
                if len(seq) != self.window:
                    continue
                pending.append(seq)
                if len(pending) == self.batch_size:
                    if n is not None and count >= n:
                        return
                    ids = self.tokenizer.encode_batch(pending)
                    w = soft_mask_weights(pending, self.soft_masked_weight)
                    yield self.collator(
                        ids, loss_weights=w,
                        rng=np.random.default_rng([self.seed + 2, count]))
                    count += 1
                    pending = []


def concat_chunks(sequences, window: int, tokenizer: DnaTokenizer,
                  sep_token: str = "[SEP]") -> Iterator[np.ndarray]:
    """Concat-mode chunking (the ConcatTokensDataset capability, reference
    pretrain/scripts/convert_bert_dataset_to_mds_streaming.py:280-371):
    join token streams with a separator id and emit fixed-length id windows,
    so no sequence material is dropped at record boundaries."""
    sep = tokenizer.get_vocab().get(sep_token, tokenizer.pad_token_id)
    buf = np.zeros(0, np.int32)
    for seq in sequences:
        ids = tokenizer.encode(seq)
        buf = np.concatenate([buf, ids, [sep]]) if buf.size else \
            np.concatenate([ids, [sep]]).astype(np.int32)
        while buf.size >= window:
            yield buf[:window].astype(np.int32)
            buf = buf[window:]


def convert_to_shards(source: Sequence[str], out_dir, shard_size: int = 65536,
                      seq_column: str = "seq") -> int:
    """Offline converter: iterable of sequences -> parquet shards."""
    import pandas as pd

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_shards = 0
    chunk: List[str] = []
    for seq in source:
        chunk.append(seq)
        if len(chunk) >= shard_size:
            pd.DataFrame({seq_column: chunk}).to_parquet(
                out_dir / f"shard_{n_shards:05d}.parquet", compression="zstd")
            n_shards += 1
            chunk = []
    if chunk:
        pd.DataFrame({seq_column: chunk}).to_parquet(
            out_dir / f"shard_{n_shards:05d}.parquet", compression="zstd")
        n_shards += 1
    log.info("wrote %d shards to %s", n_shards, out_dir)
    return n_shards
