"""Differential tests: coding_site_types / extract_cds_alignments /
parse_vcfs-vs-reference goldens (reference tabix calls are satisfied by
tests/bin/tabix during golden generation)."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"


def test_coding_site_types_basic(tmp_path):
    out = str(tmp_path / "o.tsv")
    run_cli("genomics_general_tpu.cli.coding_site_types",
            ["-a", str(D / "sim.gff3"), "-f", "gff3",
             "-r", str(D / "sim_ref.fa"), "-o", out, "--ignoreConflicts"])
    assert_text_equal(G / "cst_basic.tsv", out)


def test_coding_site_types_with_vcf(tmp_path):
    out = str(tmp_path / "o.tsv")
    run_cli("genomics_general_tpu.cli.coding_site_types",
            ["-a", str(D / "sim.gff3"), "-f", "gff3",
             "-r", str(D / "sim_ref.fa"), "-v", str(D / "sim_scaf.vcf.gz"),
             "-o", out, "--ignoreConflicts"])
    assert_text_equal(G / "cst_vcf.tsv", out)


def test_coding_site_types_gtf(tmp_path):
    out = str(tmp_path / "o.tsv")
    run_cli("genomics_general_tpu.cli.coding_site_types",
            ["-a", str(D / "sim.gtf"), "-f", "gtf",
             "-r", str(D / "sim_ref.fa"), "-o", out, "--noheader"])
    assert_text_equal(G / "cst_gtf.tsv", out)


def test_extract_cds_alignments_split(tmp_path):
    out = str(tmp_path / "o.phy")
    run_cli("genomics_general_tpu.cli.extract_cds_alignments",
            ["--annotation", str(D / "sim.gff3"),
             "-g", str(D / "sim1.geno.gz"), "-o", out])
    assert_text_equal(G / "cds_aln.phy", out)


def test_extract_cds_alignments_nosplit_fasta(tmp_path):
    out = str(tmp_path / "o.fa")
    run_cli("genomics_general_tpu.cli.extract_cds_alignments",
            ["--annotation", str(D / "sim.gff3"),
             "-g", str(D / "sim1.geno.gz"), "--no-split",
             "--outFormat", "fasta", "--includeCoordinates", "-o", out])
    assert_text_equal(G / "cds_aln_nosplit.fa", out)


def test_extract_cds_alignments_targets(tmp_path):
    out = str(tmp_path / "o.phy")
    run_cli("genomics_general_tpu.cli.extract_cds_alignments",
            ["--annotation", str(D / "sim.gff3"),
             "-g", str(D / "sim1.geno.gz"), "-t", "mRNA03", "mRNA08",
             "-o", out])
    assert_text_equal(G / "cds_aln_targets.phy", out)


def test_parse_vcfs_union_vs_reference(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcfs",
            ["-i", str(D / "sim1.vcf.gz"), "-i", str(D / "sim2.vcf.gz"),
             "-M", "union", "--excludeDuplicates", "-o", out])
    assert_text_equal(G / "vcfs_union.geno", out)


def test_parse_vcfs_intersect_vs_reference(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcfs",
            ["-i", str(D / "sim1.vcf.gz"), "-i", str(D / "sim2.vcf.gz"),
             "-M", "intersect", "--excludeDuplicates", "-o", out])
    assert_text_equal(G / "vcfs_intersect.geno", out)


def test_extract_cds_alignments_indexed_matches_golden(tmp_path):
    """With a native .tbi alongside a BGZF geno, extraction uses random
    access (io/tabix) and must reproduce the streamed-path golden."""
    from genomics_general_tpu.io import tabix as T
    bgz = tmp_path / "sim1.geno.bgz"
    T.bgzip_file(str(D / "sim1.geno.gz"), str(bgz), block_payload=2048)
    T.build_index(str(bgz), preset="geno")
    out = str(tmp_path / "o.phy")
    run_cli("genomics_general_tpu.cli.extract_cds_alignments",
            ["--annotation", str(D / "sim.gff3"), "-g", str(bgz), "-o", out])
    assert_text_equal(G / "cds_aln.phy", out)
