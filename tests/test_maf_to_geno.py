"""Differential tests: maf_to_geno CLI vs reference mafToGeno.py goldens."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"
MAF = str(D / "sim1.maf")


def test_maf_all_tracks(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.maf_to_geno",
            ["-m", MAF, "--ref", "hg.chr1", "--seqNames", "hg.chr1",
             "pan.chr3", "gor.chr2", "pon.chr5", "--minSeqsRequired", "4",
             "-g", out])
    assert_text_equal(G / "maf_all.geno", out)


def test_maf_subset_rename_lowercase(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.maf_to_geno",
            ["-m", MAF, "--ref", "hg.chr1", "--seqNames", "hg.chr1",
             "pan.chr3", "gor.chr2", "--renameSeqsAs", "hg", "pan", "gor",
             "--renameChromAs", "chr1", "--lowercaseToN", "--minSize", "25",
             "-g", out])
    assert_text_equal(G / "maf_sub.geno", out)
