"""Differential tests: window_stats CLI vs reference windowStats.py goldens.

Goldens are generated via stdout because the reference's ``args.ourFile``
typo (windowStats.py:99) makes -o crash there; our CLI fixes -o.
"""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"
TSV = str(G / "freq_derived.tsv")


def test_window_stats_coordinate(tmp_path):
    out = str(tmp_path / "o.csv")
    run_cli("genomics_general_tpu.cli.window_stats",
            ["-i", TSV, "-w", "20000", "-s", "10000", "-m", "5", "-o", out])
    assert_text_equal(G / "windowstats_coord.csv", out)


def test_window_stats_sites(tmp_path):
    out = str(tmp_path / "o.csv")
    run_cli("genomics_general_tpu.cli.window_stats",
            ["-i", TSV, "--windType", "sites", "-w", "50", "-O", "10",
             "-m", "10", "--stats", "mean", "median", "min", "max", "sd",
             "sum", "q5", "q25", "q75", "q95", "-o", out])
    assert_text_equal(G / "windowstats_sites.csv", out)


def test_window_stats_predefined(tmp_path):
    out = str(tmp_path / "o.csv")
    run_cli("genomics_general_tpu.cli.window_stats",
            ["-i", TSV, "--windType", "predefined", "--windCoords",
             str(D / "sim1.windCoords.txt"), "--columns", "pop2", "pop3",
             "-o", out])
    assert_text_equal(G / "windowstats_predef.csv", out)
