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
                stride: Optional[int]) -> List[str]:
    if path.suffix == ".parquet":
        import pandas as pd

        return pd.read_parquet(path)[seq_column].astype(str).tolist()
    if path.suffix in (".tsv", ".txt"):
        import pandas as pd

        df = pd.read_csv(path, sep="\t")
        col = seq_column if seq_column in df.columns else df.columns[0]
        return df[col].astype(str).tolist()
    if path.suffix == ".jsonl":
        import json

        with open(path) as fh:
            return [json.loads(line)[seq_column] for line in fh if line.strip()]
    if path.suffix in (".fa", ".fasta"):
        stride = stride or window
        out = []
        for _, seq in iter_fasta(path):
            for i in range(0, max(1, len(seq) - window + 1), stride):
                w = seq[i : i + window]
                if len(w) == window:
                    out.append(w)
        return out
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
    ):
        self.shards = sorted(
            p for p in Path(shard_dir).iterdir()
            if p.suffix in SHARD_SUFFIXES)
        if not self.shards:
            raise FileNotFoundError(f"no shard files under {shard_dir}")
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
