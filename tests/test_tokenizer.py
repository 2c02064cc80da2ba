"""Tokenizer goldens: id layout, case folding, complement map, RC helper."""

import numpy as np

from plantcaduceus_tpu.io.tokenizer import DnaTokenizer, reverse_complement


def test_vocab_layout():
    tok = DnaTokenizer()
    v = tok.get_vocab()
    assert v["[CLS]"] == 0 and v["[SEP]"] == 1 and v["[BOS]"] == 2
    assert v["[MASK]"] == 3 and v["[PAD]"] == 4
    assert v["[RESERVED]"] == 5 and v["[UNK]"] == 6
    assert (v["a"], v["c"], v["g"], v["t"], v["n"]) == (7, 8, 9, 10, 11)
    assert tok.mask_token_id == 3 and tok.pad_token_id == 4


def test_encode_case_insensitive():
    tok = DnaTokenizer()
    np.testing.assert_array_equal(tok.encode("ACGTN"), tok.encode("acgtn"))
    np.testing.assert_array_equal(tok.encode("ACGT"), [7, 8, 9, 10])
    assert len(tok.encode("A" * 512)) == 512  # no special tokens added
    assert tok.encode("X")[0] == tok.unk_token_id


def test_encode_batch():
    tok = DnaTokenizer()
    ids = tok.encode_batch(["ACGT", "TTTT"])
    assert ids.shape == (2, 4)
    np.testing.assert_array_equal(ids[1], [10] * 4)


def test_complement_map():
    tok = DnaTokenizer()
    cmap = tok.complement_map_ids()
    v = tok.get_vocab()
    assert cmap[v["a"]] == v["t"] and cmap[v["t"]] == v["a"]
    assert cmap[v["c"]] == v["g"] and cmap[v["g"]] == v["c"]
    assert cmap[v["n"]] == v["n"] and cmap[v["[MASK]"]] == v["[MASK]"]


def test_reverse_complement():
    assert reverse_complement("ACGTN") == "NACGT"
    assert reverse_complement(reverse_complement("GATTACA")) == "GATTACA"


def test_save_roundtrip(tmp_path):
    tok = DnaTokenizer()
    tok.save(tmp_path)
    tok2 = DnaTokenizer.from_hf_dir(tmp_path)
    assert tok2.get_vocab() == tok.get_vocab()


def test_from_hf_tokenizer_json(tmp_path):
    """HF fast-tokenizer format (tokenizer.json) with a custom id layout."""
    import json

    vocab = {"[PAD]": 0, "[UNK]": 1, "[MASK]": 2, "a": 3, "c": 4, "g": 5,
             "t": 6, "n": 7}
    (tmp_path / "tokenizer.json").write_text(json.dumps({
        "normalizer": {"type": "Lowercase"},
        "model": {"type": "WordLevel", "vocab": vocab},
        "added_tokens": [{"id": 2, "content": "[MASK]"}],
    }))
    tok = DnaTokenizer.from_hf_dir(tmp_path)
    assert tok.get_vocab()["a"] == 3 and tok.mask_token_id == 2
    np.testing.assert_array_equal(tok.encode("ACGT"), [3, 4, 5, 6])
    cmap = tok.complement_map_ids()
    assert cmap[3] == 6 and cmap[4] == 5


def _write_tokenizer_json(tmp_path, vocab, normalizer=None):
    import json

    (tmp_path / "tokenizer.json").write_text(json.dumps({
        "normalizer": normalizer,
        "model": {"type": "WordLevel", "vocab": vocab},
    }))


def test_from_hf_uppercase_vocab_is_case_sensitive(tmp_path):
    """An imported uppercase vocab without a Lowercase normalizer must NOT
    case-fold (reference CharacterTokenizer maps unknown case to [UNK])."""
    vocab = {"[PAD]": 0, "[UNK]": 1, "[MASK]": 2, "A": 3, "C": 4, "G": 5,
             "T": 6, "N": 7}
    _write_tokenizer_json(tmp_path, vocab)
    tok = DnaTokenizer.from_hf_dir(tmp_path)
    assert tok.lowercase is False
    np.testing.assert_array_equal(tok.encode("ACGT"), [3, 4, 5, 6])
    np.testing.assert_array_equal(tok.encode("acgt"), [1, 1, 1, 1])
    # complement map still pairs A<->T / C<->G in the vocab's own case
    cmap = tok.complement_map_ids()
    assert cmap[3] == 6 and cmap[4] == 5


def test_from_hf_lowercase_vocab_folds_like_released(tmp_path):
    """All-lowercase vocab (released PlantCaduceus layout) folds upper-cased
    genome windows onto the lowercase ids even without a declared
    normalizer (src/zero_shot_score.py:109,196 behavior)."""
    vocab = {"[PAD]": 0, "[UNK]": 1, "[MASK]": 2, "a": 3, "c": 4, "g": 5,
             "t": 6, "n": 7}
    _write_tokenizer_json(tmp_path, vocab)
    tok = DnaTokenizer.from_hf_dir(tmp_path)
    assert tok.lowercase is True
    np.testing.assert_array_equal(tok.encode("ACGT"), tok.encode("acgt"))


def test_from_hf_mixed_case_vocab_never_folds(tmp_path):
    """A vocab carrying BOTH cases keeps each case's own id (folding would
    corrupt one of them) — even with a Lowercase normalizer the exact
    vocab entry must win."""
    vocab = {"[UNK]": 0, "[MASK]": 1, "[PAD]": 6, "a": 2, "A": 3, "c": 4,
             "C": 5}
    _write_tokenizer_json(tmp_path, vocab)
    tok = DnaTokenizer.from_hf_dir(tmp_path)
    np.testing.assert_array_equal(tok.encode("aA"), [2, 3])
    np.testing.assert_array_equal(tok.encode("cC"), [4, 5])


def test_save_roundtrip_preserves_case_sensitivity(tmp_path):
    tok = DnaTokenizer(characters=("A", "C", "G", "T", "N"), lowercase=False)
    np.testing.assert_array_equal(tok.encode("acgt"), [tok.unk_token_id] * 4)
    tok.save(tmp_path)
    tok2 = DnaTokenizer.from_hf_dir(tmp_path)
    assert tok2.lowercase is False
    assert tok2.get_vocab() == tok.get_vocab()
    np.testing.assert_array_equal(tok2.encode("acgt"), [tok.unk_token_id] * 4)
