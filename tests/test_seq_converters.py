"""Differential tests: geno_to_seq / seq_to_geno vs reference goldens."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"

PLOIDY2x20 = ["2"] * 20


def test_geno_to_seq_cat_split(tmp_path):
    out = str(tmp_path / "o.fa")
    run_cli("genomics_general_tpu.cli.geno_to_seq",
            ["-g", str(D / "sim1.geno.gz"), "-f", "fasta", "-M", "cat",
             "--splitPhased", "-s", out])
    assert_text_equal(G / "g2s_cat_split.fa", out)


def test_geno_to_seq_contigs_phylip_ntogap(tmp_path):
    out = str(tmp_path / "o.phy")
    run_cli("genomics_general_tpu.cli.geno_to_seq",
            ["-g", str(D / "sim_paint.geno.gz"), "-f", "phylip",
             "-M", "contigs", "--NtoGap", "--ploidy", "1", "-s", out])
    assert_text_equal(G / "g2s_contigs.phy", out)


def test_geno_to_seq_sites_windows(tmp_path):
    out = str(tmp_path / "o.fa")
    run_cli("genomics_general_tpu.cli.geno_to_seq",
            ["-g", str(D / "sim_paint.geno.gz"), "-f", "fasta",
             "-M", "windows", "--windType", "sites", "--windSize", "100",
             "--minSites", "100", "--maxDist", "1000000", "--overlap", "0",
             "--ploidy", "1", "-s", out])
    assert_text_equal(G / "g2s_wind.fa", out)


def test_seq_to_geno_fused_ploidy(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.seq_to_geno",
            ["-s", str(G / "g2s_cat_split.fa"), "-f", "fasta", "-M", "samples",
             "-C", "chrA", "-P"] + PLOIDY2x20 + ["-g", out])
    assert_text_equal(G / "s2g_fused.geno", out)


def test_seq_to_geno_multi_phylip(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.seq_to_geno",
            ["-s", str(G / "g2s_contigs.phy"), "-f", "phylip", "-M", "contigs",
             "-N", "samp1", "-g", out])
    assert_text_equal(G / "s2g_contigs.geno", out)
