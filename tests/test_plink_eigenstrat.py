"""Differential tests: geno_to_plink / geno_to_eigenstrat vs reference
goldens, plus a partial-missing regression for filter_genotypes' plain-text
ploidy-inference path."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"


def test_geno_to_plink(tmp_path):
    prefix = str(tmp_path / "p")
    run_cli("genomics_general_tpu.cli.geno_to_plink",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "--prefix", prefix, "--makeFAM"])
    assert_text_equal(G / "plink_sim1.ped", prefix + ".ped")
    assert_text_equal(G / "plink_sim1.map", prefix + ".map")
    assert_text_equal(G / "plink_sim1.fam", prefix + ".fam")


def test_geno_to_eigenstrat(tmp_path):
    run_cli("genomics_general_tpu.cli.geno_to_eigenstrat",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "--genoOutFile", str(tmp_path / "e.geno"),
             "--snpOutFile", str(tmp_path / "e.snp"),
             "--indOutFile", str(tmp_path / "e.ind"),
             "--chromFile", str(D / "sim.chroms.txt")])
    assert_text_equal(G / "eig_sim1.geno", tmp_path / "e.geno")
    assert_text_equal(G / "eig_sim1.snp", tmp_path / "e.snp")
    assert_text_equal(G / "eig_sim1.ind", tmp_path / "e.ind")


def test_geno_to_eigenstrat_cumulative_subset(tmp_path):
    run_cli("genomics_general_tpu.cli.geno_to_eigenstrat",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "-s", "pop1_ind1,pop2_ind1,pop3_ind1",
             "--genoOutFile", str(tmp_path / "e.geno"),
             "--snpOutFile", str(tmp_path / "e.snp"),
             "--indOutFile", str(tmp_path / "e.ind"),
             "--chromFile", str(D / "sim.chroms_id.txt"),
             "--cumulativePos"])
    assert_text_equal(G / "eig_cum.geno", tmp_path / "e.geno")
    assert_text_equal(G / "eig_cum.snp", tmp_path / "e.snp")
    assert_text_equal(G / "eig_cum.ind", tmp_path / "e.ind")


def test_filter_plain_text_partial_missing(tmp_path):
    """Regression: plain-text input + inferred ploidy must not re-parse the
    peeked chunk (rows were duplicated); partial genotypes count as missing
    for --minCalls (GenomeSite poisoning)."""
    geno = tmp_path / "micro.geno"
    geno.write_text(
        "#CHROM\tPOS\ti1\ti2\ti3\ti4\n"
        "s1\t10\tA|N\tA|A\tT|T\tT|A\n"
        "s1\t20\tC|C\tC|N\tN|C\tC|C\n"
        "s1\t30\tG|G\tG|G\tA|G\tN|N\n"
        "s1\t40\tT|A\tA|A\tN|T\tA|A\n")
    out = tmp_path / "o.geno"
    run_cli("genomics_general_tpu.cli.filter_genotypes",
            ["-i", str(geno), "-if", "phased", "-o", str(out),
             "--minCalls", "3", "-of", "phased"])
    assert out.read_text() == (
        "#CHROM\tPOS\ti1\ti2\ti3\ti4\n"
        "s1\t10\tA|N\tA|A\tT|T\tT|A\n"
        "s1\t30\tG|G\tG|G\tA|G\tN|N\n"
        "s1\t40\tT|A\tA|A\tN|T\tA|A\n")
