"""Differential tests: ABBABABAwindows / fourPopWindows vs reference goldens."""

import pytest

from .util import REPO, assert_csv_equal, run_cli

D = REPO / "tests" / "data"
G = REPO / "tests" / "golden"
POPS = ["--popsFile", str(D / "sim1.pops.txt"),
        "-P1", "pop1", "-P2", "pop2", "-P3", "pop3", "-O", "pop4"]


@pytest.mark.golden
def test_abba_coordinate(tmp_path):
    out = tmp_path / "o.csv"
    run_cli("genomics_general_tpu.cli.abba_windows",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "-w", "50000", "-s", "25000", "-m", "50", "--minData", "0.3",
             *POPS, "--writeFailedWindows", "-o", str(out)])
    assert_csv_equal(G / "abba_coord.csv", out)


@pytest.mark.golden
def test_abba_sites(tmp_path):
    out = tmp_path / "o.csv"
    run_cli("genomics_general_tpu.cli.abba_windows",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "--windType", "sites", "-w", "100", "-m", "20",
             *POPS, "-o", str(out)])
    assert_csv_equal(G / "abba_sites.csv", out)


@pytest.mark.golden
def test_four_pop_panel(tmp_path):
    out = tmp_path / "o.csv"
    run_cli("genomics_general_tpu.cli.four_pop_windows",
            ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
             "-w", "50000", "-s", "50000", "-m", "50", "--minData", "0.3",
             *POPS, "--writeFailedWindows", "-o", str(out)])
    assert_csv_equal(G / "fourpop_coord.csv", out)
