"""Differential tests: freq / sfs / distMat vs reference goldens."""

import pytest

from .util import REPO, assert_text_equal, run_cli

D = REPO / "tests" / "data"
G = REPO / "tests" / "golden"
POPS4 = ["-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
         "--popsFile", str(D / "sim1.pops.txt")]


@pytest.mark.golden
def test_freq_base_counts(tmp_path):
    out = tmp_path / "o.tsv"
    run_cli("genomics_general_tpu.cli.freq",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased", *POPS4,
             "-o", str(out)])
    assert_text_equal(G / "freq_counts.tsv", out)


@pytest.mark.golden
def test_freq_derived(tmp_path):
    out = tmp_path / "o.tsv"
    run_cli("genomics_general_tpu.cli.freq",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased", *POPS4,
             "--target", "derived", "--minData", "2", "-o", str(out)])
    assert_text_equal(G / "freq_derived.tsv", out)


@pytest.mark.golden
def test_sfs_folded_with_pairs(tmp_path):
    pref = str(tmp_path / "sfs_")
    run_cli("genomics_general_tpu.cli.sfs",
            ["-i", str(D / "sim1.geno.gz"), "--inputType", "genotypes",
             "--genoFormat", "phased", "-p", "pop1", "-p", "pop2",
             "--popsFile", str(D / "sim1.pops.txt"), "--doPairs",
             "--pref", pref, "--suff", ".sfs"])
    assert_text_equal(G / "sfs_folded_pop1.sfs", pref + "pop1.sfs")
    assert_text_equal(G / "sfs_folded_pop2.sfs", pref + "pop2.sfs")
    assert_text_equal(G / "sfs_folded_pop1_pop2.sfs", pref + "pop1_pop2.sfs")


@pytest.mark.golden
def test_sfs_polarized(tmp_path):
    pref = str(tmp_path / "sfs_")
    run_cli("genomics_general_tpu.cli.sfs",
            ["-i", str(D / "sim1.geno.gz"), "--inputType", "genotypes",
             "--genoFormat", "phased", "-p", "pop1", "-p", "pop2", "-p", "pop4",
             "--popsFile", str(D / "sim1.pops.txt"), "--polarized",
             "--pref", pref, "--suff", ".sfs"])
    assert_text_equal(G / "sfs_pol_pop1.sfs", pref + "pop1.sfs")
    assert_text_equal(G / "sfs_pol_pop2.sfs", pref + "pop2.sfs")


@pytest.mark.golden
def test_sfs_subsample(tmp_path):
    """Downsampling path: the np.random stream must be consumed in the
    reference's exact per-site order across streaming chunk boundaries."""
    pref = str(tmp_path / "sfs_")
    run_cli("genomics_general_tpu.cli.sfs",
            ["-i", str(D / "sim1.geno.gz"), "--inputType", "genotypes",
             "--genoFormat", "phased", "-p", "pop1", "-p", "pop2",
             "--popsFile", str(D / "sim1.pops.txt"),
             "--subsample", "6", "--seed", "42",
             "--pref", pref, "--suff", ".sfs"])
    assert_text_equal(G / "sfs_sub_pop1.sfs", pref + "pop1.sfs")
    assert_text_equal(G / "sfs_sub_pop2.sfs", pref + "pop2.sfs")


@pytest.mark.golden
def test_sfs_regions(tmp_path):
    """Per-region spectra (Intervals contains_point add vectors)."""
    pref = str(tmp_path / "sfs_")
    run_cli("genomics_general_tpu.cli.sfs",
            ["-i", str(D / "sim1.geno.gz"), "--inputType", "genotypes",
             "--genoFormat", "phased", "-p", "pop1", "-p", "pop2",
             "--popsFile", str(D / "sim1.pops.txt"),
             "--regions", "scaf1:1-400000", "scaf1:400001-900000",
             "scaf2:1-500000",
             "--pref", pref, "--suff", ".sfs"])
    assert_text_equal(G / "sfs_reg_pop1.sfs", pref + "pop1.sfs")
    assert_text_equal(G / "sfs_reg_pop2.sfs", pref + "pop2.sfs")


@pytest.mark.golden
def test_distmat_windows(tmp_path):
    out = tmp_path / "o.phy"
    wdata = tmp_path / "w.tsv"
    run_cli("genomics_general_tpu.cli.dist_mat",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "-w", "50000", "-m", "50", "--outFormat", "phylip",
             "--windowDataOutFile", str(wdata), "-o", str(out)])
    assert_text_equal(G / "distmat_wind.phy", out)
    assert_text_equal(G / "distmat_wind.data.tsv", wdata)


@pytest.mark.golden
def test_distmat_cat(tmp_path):
    out = tmp_path / "o.phy"
    run_cli("genomics_general_tpu.cli.dist_mat",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "--windType", "cat", "--outFormat", "phylip", "-o", str(out)])
    assert_text_equal(G / "distmat_cat.phy", out)
