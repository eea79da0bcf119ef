"""Pairwise joint-genotype tables for LD statistics on the MXU.

The reference computes per-site-pair LD by building a python list of jointly
called haplotypes and calling np.unique per pair (genomics.py:1132-1157 via
LDmatrix :1072-1077) — O(S^2) python calls per window.  Here the whole
window's pairwise 2x2 (really 4x4) joint allele tables come from ONE
matmul:

    N[x, y, a, b] = sum_h called[h,x] called[h,y] [alleles[h,x]=a][alleles[h,y]=b]
                  = (onehot.reshape(H, S*4))^T @ (onehot.reshape(H, S*4))

with onehot zeroed at missing sites — the same trick as
kernels/pairdist.pairwise_counts.  All float64 probability math happens on
host from the exact integer tables (stats/ld.ld_from_tables), preserving
the reference's per-pair biallelic gate and major-allele tie-breaks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pair_allele_tables(alleles: jnp.ndarray) -> jnp.ndarray:
    """int8 [H, S] -> int32 [S, S, 4, 4] joint allele-count tables over
    jointly-called haplotypes."""
    codes = jnp.arange(4, dtype=jnp.int8)
    onehot = (alleles[:, :, None] == codes).astype(jnp.bfloat16)  # [H, S, 4]
    H, S, _ = onehot.shape
    flat = onehot.reshape(H, S * 4)
    n = jnp.einsum("hx,hy->xy", flat, flat,
                   preferred_element_type=jnp.float32)
    return n.reshape(S, 4, S, 4).transpose(0, 2, 1, 3).astype(jnp.int32)


def window_pair_tables(alleles: np.ndarray) -> np.ndarray:
    """Host wrapper: numpy [S, S, 4, 4] int32 tables for one window."""
    return np.asarray(pair_allele_tables(jnp.asarray(alleles)))
