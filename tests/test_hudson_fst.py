"""Hudson Fst extension: oracle test + CLI smoke.

The estimator is wired from the window pi/dxy stats (1 - Hw/Hb with
Hw = (pi_x + pi_y)/2, Hb = dxy).  The oracle re-derives it per window from
per-site allele frequencies on complete data, where the mean-pairwise-
difference pi equals the sitewise unbiased heterozygosity n/(n-1)(1-sum p^2)
(a deliberately different code path: frequencies and scalar site loops
instead of pair-count matrices)."""

import subprocess
import sys
from pathlib import Path

import numpy as np

from genomics_general_tpu.stats.popgen import (DistStatsContext,
                                               group_dist_stats,
                                               hudson_fst_from_stats)

REPO = Path(__file__).resolve().parent.parent


def oracle_hudson(alleles, rows1, rows2, spans):
    out = []
    for f, l in spans:
        a = alleles[:, f:l]
        hw = []
        for rows in (rows1, rows2):
            n = len(rows)
            h_sites = []
            for s in range(a.shape[1]):
                c = np.bincount(a[rows, s], minlength=4)
                p = c / n
                h_sites.append(n / (n - 1) * (1 - (p ** 2).sum()))
            hw.append(np.mean(h_sites))
        hb_sites = []
        for s in range(a.shape[1]):
            p1 = np.bincount(a[rows1, s], minlength=4) / len(rows1)
            p2 = np.bincount(a[rows2, s], minlength=4) / len(rows2)
            hb_sites.append(1 - (p1 * p2).sum())
        hb = np.mean(hb_sites)
        out.append(1 - 0.5 * (hw[0] + hw[1]) / hb)
    return np.array(out)


def test_hudson_matches_freq_oracle():
    rng = np.random.default_rng(5)
    H, S = 16, 400
    alleles = rng.integers(0, 2, size=(H, S)).astype(np.int8)
    alleles[:, ::7] = rng.integers(0, 4, size=(H, S))[:, ::7].astype(np.int8)
    rows1, rows2 = list(range(8)), list(range(8, 16))
    spans = [(0, 100), (100, 250), (250, 400)]
    # pair-count matrices via brute-force numpy (complete data)
    W = len(spans)
    mism = np.zeros((W, H, H), dtype=np.int32)
    shar = np.zeros((W, H, H), dtype=np.int32)
    for w, (f, l) in enumerate(spans):
        a = alleles[:, f:l]
        mism[w] = (a[:, None, :] != a[None, :, :]).sum(axis=2)
        shar[w] = l - f
    ctx = DistStatsContext(mism, shar)
    row_group = ["p1"] * 8 + ["p2"] * 8
    values = group_dist_stats(ctx, row_group, do_pairs=True,
                              min_sites=1, min_data=0.0)
    hud = hudson_fst_from_stats(values, ["p1", "p2"])["FstHud_p1_p2"]
    want = oracle_hudson(alleles, rows1, rows2, spans)
    np.testing.assert_allclose(hud, want, rtol=1e-12, atol=1e-12)


def test_hudson_cli_smoke():
    d = REPO / "tests" / "data"
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        out = Path(td) / "hud.csv"
        r = subprocess.run(
            [sys.executable, "-m", "genomics_general_tpu.cli.popgen_windows",
             "-g", str(d / "sim1.geno.gz"), "-f", "phased",
             "-w", "100000", "-m", "100",
             "-p", "pop1", "-p", "pop2",
             "--popsFile", str(d / "sim1.pops.txt"),
             "--fstMethod", "Hudson", "-o", str(out)],
            capture_output=True, cwd=REPO)
        assert r.returncode == 0, r.stderr.decode()
        lines = out.read_text().splitlines()
        head = lines[0].split(",")
        assert "FstHud_pop1_pop2" in head
        assert "Fst_pop1_pop2" in head     # the reference column stays
        col = head.index("FstHud_pop1_pop2")
        vals = [ln.split(",")[col] for ln in lines[1:]]
        assert any(v not in ("nan", "") for v in vals)
