"""C++ libpcio vs the pure-Python FASTA path (skipped if no toolchain)."""

import pytest

from plantcaduceus_tpu.io import native
from plantcaduceus_tpu.io.fasta import FastaIndex

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libpcio not built")


@pytest.fixture
def fasta_file(tmp_path, rng):
    seq1 = "".join(rng.choice(list("acgtACGTn"), 4000))
    seq2 = "".join(rng.choice(list("ACGT"), 700))
    p = tmp_path / "g.fa"
    with open(p, "w") as f:
        f.write(">chrA description here\n")
        for i in range(0, len(seq1), 61):
            f.write(seq1[i : i + 61] + "\n")
        f.write(">chrB\n" + seq2 + "\n")
    return p, seq1, seq2


def test_native_matches_python(fasta_file, rng):
    p, seq1, seq2 = fasta_file
    nat = native.NativeFastaIndex(p)
    py = FastaIndex(p)
    assert nat.chrom_names() == ["chrA", "chrB"]
    assert nat.chrom_len("chrA") == len(seq1)
    for chrom, L in (("chrA", len(seq1)), ("chrB", len(seq2))):
        for pos in [0, 1, 254, 255, 256, L // 2, L - 2, L - 1]:
            assert nat.window(chrom, pos) == py.window(chrom, pos), (chrom, pos)


def test_native_bulk_windows(fasta_file):
    p, seq1, _ = fasta_file
    nat = native.NativeFastaIndex(p)
    positions = [0, 100, 2000, len(seq1) - 1]
    ws = nat.windows("chrA", positions, window=512, center_idx=255)
    assert ws.shape == (4, 512)
    py = FastaIndex(p)
    for i, pos in enumerate(positions):
        assert ws[i].tobytes().decode() == py.window("chrA", pos)


def test_native_unknown_chrom(fasta_file):
    p, _, _ = fasta_file
    nat = native.NativeFastaIndex(p)
    with pytest.raises(KeyError):
        nat.chrom_len("nope")
    with pytest.raises(KeyError):
        nat.windows("nope", [0])


def test_open_fasta_dispatch(fasta_file, tmp_path):
    p, _, _ = fasta_file
    assert isinstance(native.open_fasta(p), native.NativeFastaIndex)
    import gzip

    gz = tmp_path / "g.fa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(">c\nACGT\n")
    assert isinstance(native.open_fasta(gz), FastaIndex)
