"""Differential tests: count_genotype_patterns vs reference goldens."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"


def test_count_patterns_phased(tmp_path):
    out = str(tmp_path / "o.csv")
    run_cli("genomics_general_tpu.cli.count_genotype_patterns",
            ["-i", str(D / "sim1.geno.gz"), "-f", "phased",
             "-s", "pop1_ind1,pop2_ind1,pop3_ind1,pop4_ind1", "-o", out])
    assert_text_equal(G / "countpat_phased.csv", out)


def test_count_patterns_max3_null_maxsites(tmp_path):
    out = str(tmp_path / "o.csv")
    run_cli("genomics_general_tpu.cli.count_genotype_patterns",
            ["-i", str(D / "sim1.geno.gz"), "-f", "phased",
             "-s", "pop1_ind1,pop2_ind1,pop3_ind1", "--maxAlleles", "3",
             "--includeNull", "--maxSites", "2000", "-o", out])
    assert_text_equal(G / "countpat_max3.csv", out)


def test_count_patterns_diplo(tmp_path):
    out = str(tmp_path / "o.csv")
    run_cli("genomics_general_tpu.cli.count_genotype_patterns",
            ["-i", str(D / "sim_diplo.geno.gz"), "-f", "diplo",
             "-s", "pop1_ind1,pop1_ind2,pop2_ind1", "-o", out])
    assert_text_equal(G / "countpat_diplo.csv", out)
