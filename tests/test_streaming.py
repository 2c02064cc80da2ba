"""Streaming pretrain dataset: shard conversion, host partitioning, batches."""

import numpy as np
import pytest

from plantcaduceus_tpu.io.tokenizer import DnaTokenizer
from plantcaduceus_tpu.train.streaming import (StreamingPretrainDataset,
                                               convert_to_shards)


@pytest.fixture
def shard_dir(tmp_path, rng):
    seqs = ["".join(rng.choice(list("ACGTacgt"), 64)) for _ in range(300)]
    n = convert_to_shards(seqs, tmp_path / "shards", shard_size=100)
    assert n == 3
    return tmp_path / "shards", seqs


def test_streaming_batches(shard_dir):
    d, seqs = shard_dir
    ds = StreamingPretrainDataset(d, DnaTokenizer(), batch_size=16,
                                  seq_column="seq", window=64, seed=3)
    it = iter(ds)
    batches = [next(it) for _ in range(25)]  # > one epoch (300/16 = 18)
    for b in batches:
        assert b["input_ids"].shape == (16, 64)
        assert set(b) == {"input_ids", "labels", "loss_weights"}
        assert (b["labels"] != -100).any()


def test_host_shard_partitioning(shard_dir):
    d, _ = shard_dir
    tok = DnaTokenizer()
    d0 = StreamingPretrainDataset(d, tok, 8, seq_column="seq", window=64,
                                  process_index=0, process_count=2)
    d1 = StreamingPretrainDataset(d, tok, 8, seq_column="seq", window=64,
                                  process_index=1, process_count=2)
    s0 = {p.name for p in d0._host_shards(0)}
    s1 = {p.name for p in d1._host_shards(0)}
    assert not s0 & s1 and len(s0) + len(s1) == 3
    # deterministic across instantiations; varies by epoch
    assert {p.name for p in d0._host_shards(0)} == s0
    all_e1 = {p.name for p in d0._host_shards(1)} | {p.name
                                                     for p in d1._host_shards(1)}
    assert len(all_e1) == 3


def test_streaming_fasta_shards(tmp_path, rng):
    seq = "".join(rng.choice(list("ACGT"), 1000))
    (tmp_path / "g.fa").write_text(">c\n" + seq + "\n")
    ds = StreamingPretrainDataset(tmp_path, DnaTokenizer(), batch_size=4,
                                  window=100)
    b = next(iter(ds))
    assert b["input_ids"].shape == (4, 100)


def test_concat_chunks(rng):
    from plantcaduceus_tpu.train.streaming import concat_chunks

    tok = DnaTokenizer()
    seqs = ["ACGT" * 5, "GG", "TTTTTTTT"]  # 20 + 1 + 2 + 1 + 8 + 1 = 33 ids
    chunks = list(concat_chunks(seqs, window=8, tokenizer=tok))
    assert len(chunks) == 4  # 33 // 8
    assert all(c.shape == (8,) for c in chunks)
    flat = [i for c in chunks for i in c.tolist()]
    sep = tok.get_vocab()["[SEP]"]
    # separators present at record boundaries; no material dropped mid-stream
    assert flat[20] == sep and flat.count(sep) >= 2


def test_streaming_iter_from_reproduces_stream(shard_dir):
    """iter_from(k) equals the tail of the full stream without tokenising
    the skipped prefix — resumable streaming with step-keyed masking."""
    d, _ = shard_dir
    mk = lambda: StreamingPretrainDataset(d, DnaTokenizer(), batch_size=16,
                                          seq_column="seq", window=64, seed=9)
    it = iter(mk())
    full = [next(it) for _ in range(8)]
    tail = mk().iter_from(5)
    for want in full[5:]:
        got = next(tail)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])
