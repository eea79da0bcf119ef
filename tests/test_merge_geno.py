"""Differential tests: merge_geno CLI vs reference mergeGeno.py goldens."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"
IN1 = str(D / "sim1.geno.gz")
IN2 = str(D / "sim_hap.geno.gz")


def test_merge_intersect(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.merge_geno",
            ["-i", IN1, "-i", IN2, "-f", str(D / "sim.fai"),
             "--method", "intersect", "-o", out])
    assert_text_equal(G / "merge_intersect.geno", out)


def test_merge_union_must_include(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.merge_geno",
            ["-i", IN1, "-i", IN2, "-f", str(D / "sim.fai"),
             "--method", "union", "--unionMin", "1", "--mustIncludeFirst",
             "1", "--missing", "NN", "-o", out])
    assert_text_equal(G / "merge_union.geno", out)


def test_merge_all_output_only(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.merge_geno",
            ["-i", IN1, "-i", IN2, "-f", str(D / "sim_small.fai"),
             "--method", "all", "--outputOnly", "2", "-o", out])
    assert_text_equal(G / "merge_all.geno", out)
