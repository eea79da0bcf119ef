"""Differential tests: sequence CLI (fasta/phylip region extraction)."""

from pathlib import Path

from genomics_general_tpu.cli.sequence import main

from .util import assert_text_equal

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"


def _run(args, in_path, out_path):
    with open(in_path) as fin, open(out_path, "w") as fout:
        main(args, stdin=fin, stdout=fout)


def test_sequence_regions_extend(tmp_path):
    out = tmp_path / "o.fa"
    _run(["-r", "scaf1:101-200", "scaf2:50-10",
          "--extendLeft", "5", "--extendRight", "5"],
         D / "sim_ref.fa", out)
    assert_text_equal(G / "seq_regions.fa", out)


def test_sequence_regions_file_phylip(tmp_path):
    out = tmp_path / "o.phy"
    _run(["-P", "-f", str(D / "sim.regions.txt"), "--preserveNames",
          "-l", "60"], D / "sim_ref.fa", out)
    assert_text_equal(G / "seq_regfile.phy", out)


def test_sequence_phylip_to_fasta_revcomp(tmp_path):
    out = tmp_path / "o.fa"
    _run(["-p", "-r", "scaf2:1-100:-", "--truncateNames"],
         D / "sim_single.phy", out)
    assert_text_equal(G / "seq_phy2fa.fa", out)


def test_sequence_fasta_to_phylip_unwrapped(tmp_path):
    out = tmp_path / "o.phy"
    _run(["-P", "-l", "0"], D / "sim_ref.fa", out)
    assert_text_equal(D / "sim_single.phy", out)
