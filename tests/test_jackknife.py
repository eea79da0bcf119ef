"""Tests for the block-jackknife module and CLI against a direct
transcription of jackknife.R (the reference's R implementation; R itself
is unavailable here)."""

import csv
from pathlib import Path

import numpy as np

from .util import run_cli

G = Path(__file__).parent / "golden"


def r_block_indices(block_size, positions, chromosomes=None):
    """Literal transcription of get.block.indices (jackknife.R:5-36)."""
    positions = np.asarray(positions)
    blocks = []
    if chromosomes is None:
        starts = np.arange(positions.min(), positions.max() + 1, block_size)
        for s in starts:
            blocks.append(np.where((positions >= s) &
                                   (positions <= s + block_size - 1))[0])
    else:
        chromosomes = np.asarray(chromosomes)
        chrom_names = list(dict.fromkeys(chromosomes))
        for c in chrom_names:
            p = positions[chromosomes == c]
            for s in np.arange(p.min(), p.max() + 1, block_size):
                blocks.append(np.where((chromosomes == c) &
                                       (positions >= s) &
                                       (positions <= s + block_size - 1))[0])
    return [b for b in blocks if b.size > 0]


def r_block_jackknife(indices, fun, *args):
    """Literal transcription of block.jackknife (jackknife.R:41-61)."""
    n = len(indices)
    overall = fun(*args)
    pseudo = []
    for idx in indices:
        keep = np.ones(args[0].shape[0], bool)
        keep[idx] = False
        pseudo.append(overall * n - fun(*(a[keep] for a in args)) * (n - 1))
    pseudo = np.array(pseudo)
    sd = np.std(pseudo, ddof=1)
    return {"mean": np.mean(pseudo), "variance": np.var(pseudo, ddof=1),
            "standard_deviation": sd, "standard_error": sd / np.sqrt(n)}


def test_block_indices_match_r():
    from genomics_general_tpu.stats.jackknife import block_indices
    rng = np.random.default_rng(3)
    pos = np.sort(rng.integers(100, 100000, 500))
    chroms = np.array(["c1"] * 300 + ["c2"] * 200)
    for kw in ({}, {"chromosomes": chroms}):
        mine = block_indices(5000, pos, **kw)
        ref = r_block_indices(5000, pos, **kw)
        assert len(mine) == len(ref)
        for a, b in zip(mine, ref):
            np.testing.assert_array_equal(a, b)


def test_ratio_jackknife_matches_generic():
    from genomics_general_tpu.stats.jackknife import (block_indices,
                                                      ratio_jackknife)
    rng = np.random.default_rng(9)
    pos = np.sort(rng.integers(1, 200000, 400))
    num = rng.normal(0.2, 1.0, 400)
    den = rng.uniform(0.5, 2.0, 400)
    idx = block_indices(20000, pos)
    ref = r_block_jackknife(idx, lambda n, d: n.sum() / d.sum(), num, den)
    block_num = np.array([num[i].sum() for i in idx])
    block_den = np.array([den[i].sum() for i in idx])
    mine = ratio_jackknife(block_num, block_den)
    for k in ref:
        assert abs(ref[k] - mine[k]) < 1e-10, k


def test_mean_jackknife_matches_generic():
    from genomics_general_tpu.stats.jackknife import (block_indices,
                                                      mean_jackknife)
    rng = np.random.default_rng(13)
    pos = np.sort(rng.integers(1, 100000, 300))
    vals = rng.normal(0, 1, 300)
    idx = block_indices(10000, pos)
    ref = r_block_jackknife(idx, lambda v: v.mean(), vals)
    mine = mean_jackknife(vals, idx)
    for k in ref:
        assert abs(ref[k] - mine[k]) < 1e-10, k


def test_jackknife_cli_d_from_abba_windows(tmp_path):
    out = str(tmp_path / "jk.tsv")
    run_cli("genomics_general_tpu.cli.jackknife",
            ["-i", str(G / "abba_coord.csv"), "--blockSize", "100000",
             "--D", "-o", out])
    lines = Path(out).read_text().rstrip("\n").split("\n")
    assert lines[0].split("\t")[0] == "stat"
    row = dict(zip(lines[0].split("\t"), lines[1].split("\t")))
    assert row["stat"] == "D"
    # overall D must equal ratio of summed window counts
    with open(G / "abba_coord.csv") as f:
        rows = [r for r in csv.DictReader(f)
                if r["ABBA"] not in ("nan", "")]
    abba = sum(float(r["ABBA"]) for r in rows)
    baba = sum(float(r["BABA"]) for r in rows)
    assert abs(float(row["overall"]) - (abba - baba) / (abba + baba)) < 1e-12
    assert int(row["n_blocks"]) > 1
    assert float(row["standard_error"]) > 0
