"""Differential tests: transferScafPos / fastaTransfer vs reference goldens;
vcfChromTransfer vs an in-test oracle (the reference needs tabix, which is
unavailable here)."""

import gzip
from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"
TRANS = str(D / "sim.transfers.txt")


def test_transfer_scaf_pos(tmp_path):
    out = str(tmp_path / "o.tsv")
    fails = str(tmp_path / "fails.tsv")
    run_cli("genomics_general_tpu.cli.transfer_scaf_pos",
            ["-i", str(G / "freq_derived.tsv"), "-t", TRANS, "--header",
             "--keepFails", "-f", fails, "-o", out])
    assert_text_equal(G / "transfer_freq.tsv", out)
    assert_text_equal(G / "transfer_freq.fails.tsv", fails)


def test_fasta_transfer(tmp_path):
    out = str(tmp_path / "o.fa")
    run_cli("genomics_general_tpu.cli.fasta_transfer",
            ["-i", str(D / "sim_ref.fa"), "-t", TRANS, "-o", out])
    assert_text_equal(G / "transfer_ref.fa", out)


def test_vcf_chrom_transfer_oracle(tmp_path):
    vcf = G / "g2v_basic.vcf"
    out = str(tmp_path / "o.vcf")
    run_cli("genomics_general_tpu.cli.vcf_chrom_transfer",
            ["-v", str(vcf), "-t", TRANS, "-o", out])

    comp = str.maketrans("ACGT", "TGCA")
    head, data = [], []
    for line in vcf.read_text().rstrip("\n").split("\n"):
        (head if line.startswith("#") else data).append(line)
    transfers = [l.split("\t") for l in
                 Path(TRANS).read_text().rstrip("\n").split("\n")]
    want = [h for h in head if not h.startswith("##contig")]
    # contigs block is inserted where the first ##contig line was: none in
    # g2v_basic.vcf, so new contigs are absent from the oracle header too
    for new_chrom, new_start, new_end, chrom, start, end, strand in transfers:
        start, end = int(start), int(end)
        new_start, new_end = int(new_start), int(new_end)
        rows = [l.split("\t") for l in data
                if l.split("\t")[0] == chrom and
                start <= int(l.split("\t")[1]) <= end]
        if strand == "-":
            rows = rows[::-1]
        for f in rows:
            pos = int(f[1]) - start + 1
            f = list(f)
            f[0] = new_chrom
            f[1] = str(new_start + pos - 1) if strand == "+" \
                else str(new_end - pos + 1)
            f[3] = f[3].translate(comp)
            f[4] = f[4].translate(comp)
            want.append("\t".join(f))
    got = Path(out).read_text().rstrip("\n").split("\n")
    assert got == want


def test_vcf_chrom_transfer_indexed_matches_streamed(tmp_path):
    """With a native .tbi next to a BGZF input, vcfChromTransfer uses
    random access (io/tabix) and must produce byte-identical output to the
    whole-file pass."""
    from genomics_general_tpu.io import tabix as T
    vcf = G / "g2v_basic.vcf"
    streamed = str(tmp_path / "streamed.vcf")
    run_cli("genomics_general_tpu.cli.vcf_chrom_transfer",
            ["-v", str(vcf), "-t", TRANS, "-o", streamed])

    bgz = tmp_path / "in.vcf.gz"
    T.bgzip_file(str(vcf), str(bgz), block_payload=512)   # many tiny blocks
    T.build_index(str(bgz), preset="vcf")
    indexed = str(tmp_path / "indexed.vcf")
    run_cli("genomics_general_tpu.cli.vcf_chrom_transfer",
            ["-v", str(bgz), "-t", TRANS, "-o", indexed])
    assert Path(streamed).read_bytes() == Path(indexed).read_bytes()
