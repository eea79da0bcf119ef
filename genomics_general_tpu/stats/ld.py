"""Linkage-disequilibrium statistics and LD-maximizing pseudo-phasing.

Host mirror of the reference LD layer: per-pair D / D' / r / r2
(genomics.py:1132-1157 — including the D/Dmin sign convention and
major-allele 'ancestral' default), whole-window LD matrices
(genomics.py:1072-1077), and the greedy haplotype re-phasing
``max_ld_phase`` (genomics.py:1166-1194) used by phyml_sliding_windows
--maxLDphase.
"""

from __future__ import annotations

import itertools

import numpy as np

NAN_LD = {"D": np.nan, "Dprime": np.nan, "r": np.nan, "r2": np.nan}


def ld_pair(bases_a: np.ndarray, bases_b: np.ndarray, anc_a=None, anc_b=None):
    """LD between two sites given per-haplotype allele codes (missing < 0)."""
    arr = np.column_stack([bases_a, bases_b])
    arr = arr[(arr >= 0).all(axis=1)]
    alleles_a, counts_a = np.unique(arr[:, 0], return_counts=True)
    alleles_b, counts_b = np.unique(arr[:, 1], return_counts=True)
    if not len(alleles_a) == len(alleles_b) == 2:
        return dict(NAN_LD)
    if anc_a is None:
        anc_a = alleles_a[counts_a == max(counts_a)][0]
    else:
        assert anc_a in alleles_a, "ancestral allele not present"
    if anc_b is None:
        anc_b = alleles_b[counts_b == max(counts_b)][0]
    else:
        assert anc_b in alleles_b, "ancestral allele not present"
    bool_arr = arr != [anc_a, anc_b]
    p_a, p_b = np.mean(bool_arr, axis=0)
    p_ab = np.mean(bool_arr.all(axis=1))
    d = p_ab - p_a * p_b
    d_min = max(-p_a * p_b, -(1 - p_a) * (1 - p_b)) if d < 0 \
        else min(p_a * (1 - p_b), (1 - p_a) * p_b)
    with np.errstate(invalid="ignore", divide="ignore"):
        d_prime = d / d_min
        r = d / np.sqrt(p_a * (1 - p_a) * p_b * (1 - p_b))
    return {"D": d, "Dprime": d_prime, "r": r, "r2": r ** 2}


def ld_matrix(alleles: np.ndarray, stat: str = "r2") -> np.ndarray:
    """[S, S] pairwise LD over a window's [H, S] allele matrix
    (Alignment.LDmatrix, genomics.py:1072-1077)."""
    S = alleles.shape[1]
    out = np.zeros((S, S))
    for x in range(S):
        for y in range(x, S):
            out[x, y] = out[y, x] = ld_pair(alleles[:, x], alleles[:, y])[stat]
    return out


def unique_indices(things, preserve_order=False):
    t, first, inverse = np.unique(things, return_index=True,
                                  return_inverse=True)
    indices = [np.where(inverse == i)[0] for i in range(len(t))]
    order = np.argsort(first) if preserve_order else np.arange(len(first))
    return [t[order], [indices[i] for i in order]]


def max_ld_phase(alleles: np.ndarray, sample_names, stat: str = "r2"):
    """Greedy LD-maximizing pseudo-phasing (genomics.py:1166-1194).

    alleles: [H, S] haplotype codes; sample_names: per-row sample labels
    (consecutive rows of one sample are that sample's haplotypes).  Returns
    a re-phased copy.
    """
    sample_indices = unique_indices(sample_names, preserve_order=True)[1]
    H, S = alleles.shape
    assert H == sum(len(ind) for ind in sample_indices)
    nan_mask = alleles >= 0
    n_hets = np.array([
        sum(len(np.unique(alleles[ind, x][nan_mask[ind, x]])) > 1
            for ind in sample_indices) for x in range(S)])
    sites_to_do = np.argsort(n_hets)[::-1]
    sites_to_do = sites_to_do[n_hets[sites_to_do] >= 1]
    new = alleles.copy()
    if len(sites_to_do) >= 2:
        first = sites_to_do[0]
        new[:, first] = list(itertools.chain(
            *[sorted(new[ind, first]) for ind in sample_indices]))
        for x in range(1, len(sites_to_do)):
            opt1 = list(itertools.chain(
                *[sorted(new[ind, sites_to_do[x]])
                  for ind in sample_indices]))
            opt2 = list(itertools.chain(
                *[sorted(new[ind, sites_to_do[x]])[::-1]
                  for ind in sample_indices]))
            with np.errstate(invalid="ignore"):
                ld1 = np.mean([ld_pair(new[:, sites_to_do[y]],
                                       np.asarray(opt1))[stat]
                               for y in range(x)])
                ld2 = np.mean([ld_pair(new[:, sites_to_do[y]],
                                       np.asarray(opt2))[stat]
                               for y in range(x)])
            new[:, sites_to_do[x]] = opt1 if ld1 >= ld2 else opt2
    return new
