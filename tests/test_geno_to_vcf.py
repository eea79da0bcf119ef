"""Differential tests: geno_to_vcf CLI vs reference genoToVCF.py goldens."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"


def test_geno_to_vcf_basic(tmp_path):
    out = str(tmp_path / "o.vcf")
    run_cli("genomics_general_tpu.cli.geno_to_vcf",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased", "-o", out])
    assert_text_equal(G / "g2v_basic.vcf", out)


def test_geno_to_vcf_with_reference(tmp_path):
    out = str(tmp_path / "o.vcf")
    run_cli("genomics_general_tpu.cli.geno_to_vcf",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "-r", str(D / "sim_ref.fa"),
             "-s", "pop1_ind1,pop2_ind1,pop3_ind1", "-o", out])
    assert_text_equal(G / "g2v_ref.vcf", out)


def test_geno_to_vcf_diplo(tmp_path):
    out = str(tmp_path / "o.vcf")
    run_cli("genomics_general_tpu.cli.geno_to_vcf",
            ["-g", str(D / "sim_diplo.geno.gz"), "-f", "diplo", "-o", out])
    assert_text_equal(G / "g2v_diplo.vcf", out)
