"""Differential tests: dist_paint CLI vs reference distPaint.py goldens."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"
GENO = str(D / "sim_paint.geno.gz")
POPS = str(D / "sim_paint.pops.txt")


def test_dist_paint_ranksum(tmp_path):
    out = str(tmp_path / "o.tsv")
    run_cli("genomics_general_tpu.cli.dist_paint",
            ["-g", GENO, "-w", "50000", "-s", "25000", "-m", "50",
             "-p", "pop1", "-p", "pop2", "-p", "pop3", "--popsFile", POPS,
             "--writeFailedWindows", "-o", out])
    assert_text_equal(G / "distpaint_test.tsv", out)


def test_dist_paint_delta_sites(tmp_path):
    out = str(tmp_path / "o.tsv")
    run_cli("genomics_general_tpu.cli.dist_paint",
            ["-g", GENO, "--windType", "sites", "-w", "200", "-m", "100",
             "-p", "pop1", "-p", "pop2", "-p", "pop3", "--popsFile", POPS,
             "--delta_threshold", "0.02", "--addWindowID", "-o", out])
    assert_text_equal(G / "distpaint_delta.tsv", out)
