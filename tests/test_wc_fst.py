"""Weir-Cockerham Fst extension: oracle test + CLI smoke.

wc_fst_windows is validated against an independent per-site re-derivation of
the WC84 haploid variance components (written from the published formulas,
looping alleles/sites scalar-by-scalar — a deliberately different code path
from the vectorized implementation)."""

import subprocess
import sys
from pathlib import Path

import numpy as np

from genomics_general_tpu.stats.popgen import wc_fst_windows

REPO = Path(__file__).resolve().parent.parent


def oracle_components(cx, cy):
    """Scalar re-derivation: per-site (a, a+b) sums, WC84 haploid (r=2)."""
    A = np.zeros(cx.shape[0])
    AB = np.zeros(cx.shape[0])
    for s in range(cx.shape[0]):
        n1 = cx[s].sum()
        n2 = cy[s].sum()
        n = n1 + n2
        if n1 < 1 or n2 < 1 or n <= 2:
            continue
        r = 2
        nc = (n - (n1 ** 2 + n2 ** 2) / n) / (r - 1)
        for al in range(4):
            p1 = cx[s, al] / n1
            p2 = cy[s, al] / n2
            pbar = (n1 * p1 + n2 * p2) / n
            msp = (n1 * (p1 - pbar) ** 2 + n2 * (p2 - pbar) ** 2) / (r - 1)
            msg = (n1 * p1 * (1 - p1) + n2 * p2 * (1 - p2)) / (n - r)
            a = (msp - msg) / nc
            A[s] += a
            AB[s] += a + msg
    return A, AB


def test_wc_fst_matches_oracle():
    rng = np.random.default_rng(11)
    S = 500
    # per-site per-pop counts with varying sample sizes (missing data)
    def counts(n_hap, p_shift):
        c = np.zeros((S, 4), dtype=np.int64)
        for s in range(S):
            n = int(rng.integers(0, n_hap + 1))
            if n:
                probs = rng.dirichlet([1 + p_shift, 1, 0.3, 0.1])
                c[s] = rng.multinomial(n, probs)
        return c
    cx = counts(20, 3.0)
    cy = counts(16, 0.2)
    spans = [(0, 100), (100, 150), (150, 150), (150, 500), (0, 500)]
    got = wc_fst_windows(cx, cy, spans)
    A, AB = oracle_components(cx, cy)
    for w, (f, l) in enumerate(spans):
        num = A[f:l].sum()
        den = AB[f:l].sum()
        want = num / den if den != 0 else np.nan
        if want != want:
            assert got[w] != got[w]
        else:
            np.testing.assert_allclose(got[w], want, rtol=1e-12)


def test_wc_fst_fixed_difference_is_one():
    # two pops fixed for different alleles, full data -> theta == 1
    S = 50
    cx = np.zeros((S, 4), np.int64)
    cy = np.zeros((S, 4), np.int64)
    cx[:, 0] = 10
    cy[:, 2] = 10
    got = wc_fst_windows(cx, cy, [(0, S)])
    np.testing.assert_allclose(got, [1.0], rtol=1e-12)


def test_wc_fst_identical_pops_near_zero():
    # same allele freqs in both pops -> E[theta] ~ 0 (slightly negative ok)
    rng = np.random.default_rng(5)
    S = 2000
    p = rng.uniform(0.2, 0.8, size=S)
    cx = np.zeros((S, 4), np.int64)
    cy = np.zeros((S, 4), np.int64)
    cx[:, 0] = rng.binomial(40, p)
    cx[:, 1] = 40 - cx[:, 0]
    cy[:, 0] = rng.binomial(40, p)
    cy[:, 1] = 40 - cy[:, 0]
    got = wc_fst_windows(cx, cy, [(0, S)])
    assert abs(got[0]) < 0.01


def test_popgen_cli_wc_flag(tmp_path, data_dir):
    """--fstMethod WC adds FstWC_ columns; the reference columns stay
    byte-identical to a run without the flag."""
    from genomics_general_tpu.cli.popgen_windows import main

    geno = data_dir / "sim1.geno.gz"
    pops = data_dir / "sim1.pops.txt"
    base = tmp_path / "base.csv"
    wc = tmp_path / "wc.csv"
    argv = ["-g", str(geno), "-f", "phased", "-w", "50000", "-m", "10",
            "-p", "pop1", "-p", "pop2", "--popsFile", str(pops)]
    main(argv + ["-o", str(base)])
    main(argv + ["--fstMethod", "WC", "-o", str(wc)])
    b = base.read_text().splitlines()
    w = wc.read_text().splitlines()
    assert w[0] == b[0] + ",FstWC_pop1_pop2"
    for lb, lw in zip(b[1:], w[1:]):
        assert lw.startswith(lb + ",")
        extra = float(lw.rsplit(",", 1)[1])
        assert -1.0 <= extra <= 1.0 or extra != extra
