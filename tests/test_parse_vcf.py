"""Differential tests: parse_vcf CLI vs reference parseVCF.py goldens."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"
VCF = str(D / "sim1.vcf.gz")


def test_vcf_basic(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf", ["-i", VCF, "-o", out])
    assert_text_equal(G / "vcf_basic.geno", out)


def test_vcf_skip_indels_min_qual(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", VCF, "--skipIndels", "--minQual", "30", "-o", out])
    assert_text_equal(G / "vcf_snp_qual.geno", out)


def test_vcf_gtf_filters(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", VCF, "--gtf", "flag=DP", "min=5", "max=50",
             "--gtf", "flag=GQ", "min=30", "gtTypes=Het", "-o", out])
    assert_text_equal(G / "vcf_gtf.geno", out)


def test_vcf_field_extraction(tmp_path):
    out = str(tmp_path / "o.tsv")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", VCF, "--field", "DP", "-o", out])
    assert_text_equal(G / "vcf_field_dp.tsv", out)


def test_vcf_dedup_reftrack_samples(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", VCF, "--excludeDuplicates", "--addRefTrack",
             "-s", "s1,s3,s5", "-o", out])
    assert_text_equal(G / "vcf_dedup_ref.geno", out)


def test_vcf_stdin_fast_path(tmp_path):
    """Piped VCF input: the C fast path reads the header from the first
    buffered chunks and must match the Python pipeline byte for byte."""
    import gzip
    import os
    import subprocess
    import sys
    text = gzip.decompress((Path(__file__).parent / "data"
                            / "sim1.vcf.gz").read_bytes())
    fast, slow = tmp_path / "fast.geno", tmp_path / "slow.geno"
    r = subprocess.run(
        [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcf",
         "-o", str(fast)], input=text, capture_output=True,
        cwd=Path(__file__).parent.parent)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcf",
         "-o", str(slow)], input=text, capture_output=True,
        cwd=Path(__file__).parent.parent,
        env=dict(os.environ, GGT_HOST_VCF="0"))
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert fast.read_bytes() == slow.read_bytes()
