"""Differential tests: popgenWindows CLI vs reference goldens.

Goldens are produced by tests/gen_golden.sh running the actual reference
scripts (/root/reference) on the committed synthetic fixtures.
"""

import pytest

from .util import REPO, assert_csv_equal, run_cli

D = REPO / "tests" / "data"
G = REPO / "tests" / "golden"
POPS = ["-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
        "--popsFile", str(D / "sim1.pops.txt")]
MOD = "genomics_general_tpu.cli.popgen_windows"


@pytest.mark.golden
def test_coordinate_full_panel(tmp_path):
    out = tmp_path / "o.csv"
    run_cli(MOD, ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                  "-w", "50000", "-s", "25000", "-m", "100", "--minData", "0.3",
                  *POPS,
                  "--analysis", "popFreq", "popDist", "popPairDist",
                  "indPairDist", "indHet", "hapStats",
                  "--writeFailedWindows", "--addWindowID", "-o", str(out)])
    assert_csv_equal(G / "popgen_coord.csv", out)


@pytest.mark.golden
def test_sites_windows(tmp_path):
    out = tmp_path / "o.csv"
    run_cli(MOD, ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                  "--windType", "sites", "-w", "250", "-O", "50", "-D", "50000",
                  "-m", "100", *POPS,
                  "--analysis", "popDist", "popPairDist", "-o", str(out)])
    assert_csv_equal(G / "popgen_sites.csv", out)


@pytest.mark.golden
def test_predefined_windows(tmp_path):
    out = tmp_path / "o.csv"
    run_cli(MOD, ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                  "--windType", "predefined",
                  "--windCoords", str(D / "sim1.windCoords.txt"), "-m", "50",
                  *POPS, "--analysis", "popDist", "popPairDist",
                  "--writeFailedWindows", "--addWindowID", "-o", str(out)])
    assert_csv_equal(G / "popgen_predef.csv", out)


@pytest.mark.golden
def test_haploid_mix(tmp_path):
    out = tmp_path / "o.csv"
    run_cli(MOD, ["-g", str(D / "sim_hap.geno.gz"), "-f", "phased",
                  "-w", "50000", "-m", "50", "-p", "pop1", "-p", "pop2",
                  "--popsFile", str(D / "sim_hap.pops.txt"),
                  "--haploid", "pop1_ind1",
                  "--analysis", "popDist", "popPairDist", "-o", str(out)])
    assert_csv_equal(G / "popgen_hap.csv", out)


@pytest.mark.golden
def test_diplo_format(tmp_path):
    out = tmp_path / "o.csv"
    run_cli(MOD, ["-g", str(D / "sim_diplo.geno.gz"), "-f", "diplo",
                  "-w", "50000", "-m", "50", "-p", "pop1", "-p", "pop2",
                  "--popsFile", str(D / "sim_diplo.pops.txt"),
                  "--analysis", "popDist", "popPairDist", "-o", str(out)])
    assert_csv_equal(G / "popgen_diplo.csv", out)


@pytest.mark.golden
def test_ind_blocks_fast_path_equals_host_path(tmp_path):
    """The fused per-individual blocks path (popDist/popPairDist/indHet/
    indPairDist without popFreq/hapStats) must be byte-identical to the
    general host-finalize path (which is itself golden-validated)."""
    args = ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
            "-w", "50000", "-s", "25000", "-m", "100", "--minData", "0.3",
            *POPS,
            "--analysis", "popDist", "popPairDist", "indPairDist", "indHet",
            "--writeFailedWindows"]
    fast = tmp_path / "fast.csv"
    run_cli(MOD, args + ["-o", str(fast)])
    host = tmp_path / "host.csv"
    run_cli(MOD, args + ["-o", str(host)],
            env_extra={"GGT_HOST_DIST_FINALIZE": "1"})
    assert fast.read_bytes() == host.read_bytes()


@pytest.mark.golden
@pytest.mark.parametrize("analysis", [["indHet"], ["indPairDist"],
                                      ["indHet", "indPairDist"]])
def test_ind_blocks_subsets_equal_host_path(tmp_path, analysis):
    """Individual-stat-only runs skip the minSites context mutation (the
    wrapper only mutates when popDist/popPairDist run first) — both paths
    must agree on that too."""
    args = ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
            "-w", "50000", "-m", "50", *POPS,
            "--analysis", *analysis, "--writeFailedWindows"]
    fast = tmp_path / "fast.csv"
    run_cli(MOD, args + ["-o", str(fast)])
    host = tmp_path / "host.csv"
    run_cli(MOD, args + ["-o", str(host)],
            env_extra={"GGT_HOST_DIST_FINALIZE": "1"})
    assert fast.read_bytes() == host.read_bytes()
