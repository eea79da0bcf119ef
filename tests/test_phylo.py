"""Tests for the phylo layer: built-in NJ, LD stats, maxLDphase, and the
phyml/raxml sliding-window CLIs with the builtin-nj backend."""

import gzip
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from .util import REPO, run_cli

D = Path(__file__).parent / "data"


def test_nj_recovers_additive_tree():
    """NJ must exactly reconstruct distances from an additive tree:
    ((A:2,B:3):1,(C:4,D:5));"""
    from genomics_general_tpu.stats.nj import neighbor_joining
    #      A   B   C   D
    dist = np.array([[0, 5, 7, 8],
                     [5, 0, 8, 9],
                     [7, 8, 0, 9],
                     [8, 9, 9, 0]], float)
    tree = neighbor_joining(dist, ["A", "B", "C", "D"])
    # A and B must be joined first with branch lengths 2 and 3
    assert "(A:2.0,B:3.0)" in tree or "(B:3.0,A:2.0)" in tree
    assert tree.endswith(";")


def test_ld_pair_matches_reference():
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        genomics = importlib.import_module("genomics")
    finally:
        sys.path.pop(0)
    from genomics_general_tpu.stats.ld import ld_pair
    rng = np.random.default_rng(5)
    for _ in range(60):
        a = rng.choice([0, 1, 2, -999], size=30, p=[.4, .4, .1, .1])
        b = rng.choice([0, 3, -999], size=30, p=[.5, .4, .1])
        ref = genomics.LD(a, b)
        mine = ld_pair(np.where(a == -999, -1, a), np.where(b == -999, -1, b))
        for k in ("D", "Dprime", "r", "r2"):
            if np.isnan(ref[k]):
                assert np.isnan(mine[k]), k
            else:
                assert abs(ref[k] - mine[k]) < 1e-12, k


def test_ld_matrix_matches_pairwise_oracle():
    """Vectorized table path (and its device twin) vs the scalar ld_pair."""
    import numpy as np

    from genomics_general_tpu.stats.ld import ld_matrix, ld_pair

    rng = np.random.default_rng(11)
    a = rng.integers(0, 3, size=(14, 40)).astype(np.int8)
    a[rng.random(a.shape) < 0.2] = -1
    for stat in ("D", "Dprime", "r", "r2"):
        want = np.zeros((40, 40))
        for x in range(40):
            for y in range(40):
                want[x, y] = ld_pair(a[:, x], a[:, y])[stat]
        got_np = ld_matrix(a, stat)
        got_dev = ld_matrix(a, stat, use_device=True)
        np.testing.assert_array_equal(got_np, want)
        np.testing.assert_allclose(got_dev, want, rtol=1e-12, atol=1e-15)


def test_max_ld_phase_matches_reference():
    sys.path.insert(0, "/root/reference")
    try:
        import importlib
        genomics = importlib.import_module("genomics")
    finally:
        sys.path.pop(0)
    from genomics_general_tpu.stats.ld import max_ld_phase
    rng = np.random.default_rng(11)
    H, S = 8, 12
    # biallelic sites only (the reference asserts this)
    arr = rng.choice([0, 1], size=(H, S)).astype(np.int64)
    arr[rng.random((H, S)) < 0.1] = -999
    names = [f"i{k // 2}" for k in range(H)]
    aln = genomics.Alignment(numArray=arr.copy(), names=[f"i{k//2}_{'AB'[k%2]}" for k in range(H)],
                             sampleNames=names)
    ref_aln = genomics.maxLDphase(aln)
    mine = max_ld_phase(np.where(arr == -999, -1, arr).astype(np.int8),
                        names)
    ref_num = np.where(ref_aln.numArray == -999, -1, ref_aln.numArray)
    np.testing.assert_array_equal(ref_num.astype(np.int8), mine)


def test_phyml_sliding_windows_builtin_nj(tmp_path):
    prefix = str(tmp_path / "out")
    run_cli("genomics_general_tpu.cli.phyml_sliding_windows",
            ["-g", str(D / "sim1.geno.gz"), "-p", prefix,
             "-w", "50000", "-M", "100", "--phyml", "builtin-nj",
             "--njCorrect", "--seed", "1"])
    data = Path(prefix + ".data.tsv").read_text().rstrip("\n").split("\n")
    assert data[0] == "\t".join(
        ["scaffold", "start", "end", "mid", "sites", "lnL"])
    trees = gzip.open(prefix + ".trees.gz", "rt").read().rstrip("\n").split("\n")
    assert len(trees) == len(data) - 1
    good = [t for t in trees if t != "NA"]
    assert good, "no trees produced"
    for t in good:
        assert t.endswith(";") and t.count("(") == t.count(")")
        assert "pop1_ind1_A" in t


def test_phyml_thread_pool_deterministic(tmp_path):
    """-T 4 must produce byte-identical outputs to -T 1: the ordered
    reorder queue preserves window order and bootstrap draws come off the
    seeded stream on the main thread."""
    outs = {}
    for t in ("1", "4"):
        prefix = str(tmp_path / ("t" + t))
        run_cli("genomics_general_tpu.cli.phyml_sliding_windows",
                ["-g", str(D / "sim1.geno.gz"), "-p", prefix,
                 "-w", "50000", "-M", "100", "--phyml", "builtin-nj",
                 "--bootstraps", "2", "--seed", "7", "-T", t])
        outs[t] = (
            Path(prefix + ".data.tsv").read_bytes(),
            gzip.open(prefix + ".trees.gz", "rb").read(),
            gzip.open(prefix + ".BS0.trees.gz", "rb").read(),
            gzip.open(prefix + ".BS1.trees.gz", "rb").read())
    assert outs["1"] == outs["4"]


def test_raxml_sliding_windows_builtin_nj(tmp_path):
    prefix = str(tmp_path / "rx")
    run_cli("genomics_general_tpu.cli.raxml_sliding_windows",
            ["-g", str(D / "sim1.geno.gz"), "-p", prefix,
             "-w", "50000", "-M", "100", "--raxml", "builtin-nj"])
    data = Path(prefix + ".data.tsv").read_text().rstrip("\n").split("\n")
    trees = gzip.open(prefix + ".trees.gz", "rt").read().rstrip("\n").split("\n")
    assert len(trees) == len(data) - 1
    assert any(t != "NA" for t in trees)


def test_phyml_pool_concurrency(tmp_path):
    """-T 4 runs external-binary windows concurrently: with a sleep-bound
    fake phyml, 4 workers must beat serial wall time clearly (the work is
    pure sleep, so this is robust to host-load noise)."""
    import stat
    import time
    fake = tmp_path / "fakephyml"
    fake.write_text(
        "#!/bin/sh\n"
        "# parse --input <file>; emit a tree + stats like phyml does\n"
        'in=""\n'
        'while [ $# -gt 0 ]; do\n'
        '  if [ "$1" = "--input" ]; then in="$2"; shift; fi\n'
        "  shift\n"
        "done\n"
        "sleep 0.3\n"
        'echo "(a,b);" > "${in}_phyml_tree.txt"\n'
        'echo "Log-likelihood: -123.4" > "${in}_phyml_stats.txt"\n')
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    walls = {}
    outs = {}
    for t in ("1", "4"):
        prefix = str(tmp_path / ("p" + t))
        t0 = time.perf_counter()
        run_cli("genomics_general_tpu.cli.phyml_sliding_windows",
                ["-g", str(D / "sim1.geno.gz"), "-p", prefix,
                 "-w", "50000", "-M", "10", "--phyml", str(fake),
                 "--tmp", str(tmp_path), "-T", t])
        walls[t] = time.perf_counter() - t0
        outs[t] = (Path(prefix + ".data.tsv").read_bytes(),
                   gzip.open(prefix + ".trees.gz", "rb").read())
    assert outs["1"] == outs["4"]
    assert b"(a,b);" in outs["1"][1]
    assert b"-123.4" in outs["1"][0]
    assert walls["4"] < walls["1"] * 0.55, walls
