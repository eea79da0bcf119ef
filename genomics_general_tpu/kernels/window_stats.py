"""Fused on-device window statistics (the engine's "forward step").

This is the all-device fast path: one jitted function takes the encoded
haplotype matrix plus a window batch and produces per-window population
statistics entirely on device in float32 — pair counts on the MXU, masked
block means, pi/dxy/Fst, per-pop allele counts.  It is the compute graph the
multi-chip runner shards (see parallel/mesh.py) and what ``__graft_entry__``
exposes; the CSV-exact production path instead pulls the integer count
tensors back and finalizes in float64 (stats/popgen.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pairdist import gather_window_batch, pairwise_counts


def _block_nanmean(dist: jnp.ndarray, shared_pos: jnp.ndarray,
                   mask_i: jnp.ndarray, mask_j: jnp.ndarray) -> jnp.ndarray:
    """Mean over a population block of the distance matrix, ignoring entries
    with zero shared sites and the diagonal; [B] per window."""
    sel = mask_i[None, :, None] * mask_j[None, None, :]
    valid = sel * shared_pos
    num = jnp.sum(jnp.where(valid > 0, dist, 0.0), axis=(1, 2))
    den = jnp.sum(valid, axis=(1, 2))
    return num / den


@functools.partial(jax.jit, static_argnames=("s_max",))
def window_stats_step(alleles: jnp.ndarray, first: jnp.ndarray,
                      n_sites: jnp.ndarray, pop_mask: jnp.ndarray,
                      s_max: int):
    """Forward step over one window batch.

    Parameters
    ----------
    alleles : int8 [H, S] encoded haplotypes (0..3, -1 missing)
    first, n_sites : int32 [B] window spans on the site axis
    pop_mask : float32 [P, H] population membership
    s_max : static padded window length

    Returns dict of [B]-shaped (or [B, P...]) float32 stats:
    pi [B, P], dxy [B, P, P], fst [B, P, P], plus integer pair counts.
    """
    wa, valid = gather_window_batch(alleles, first, n_sites, s_max)
    mismatch, shared = pairwise_counts(wa, valid)
    dist = mismatch.astype(jnp.float32) / jnp.maximum(shared, 1).astype(jnp.float32)
    shared_pos = (shared > 0).astype(jnp.float32)
    H = alleles.shape[0]
    eye = jnp.eye(H, dtype=jnp.float32)
    shared_offdiag = shared_pos * (1.0 - eye)

    P = pop_mask.shape[0]
    pm = pop_mask.astype(jnp.float32)

    # pi: within-pop block mean (diag excluded)
    pi = jnp.stack([_block_nanmean(dist, shared_offdiag, pm[p], pm[p])
                    for p in range(P)], axis=1)                       # [B, P]

    # dxy: between-pop block means
    dxy = jnp.stack([
        jnp.stack([_block_nanmean(dist, shared_offdiag, pm[a], pm[b])
                   for b in range(P)], axis=1)
        for a in range(P)], axis=1)                                   # [B,P,P]

    # Fst = 1 - pi_s / pi_t (reference weighting, genomics.py:987-993)
    n_pop = pm.sum(axis=1)                                            # [P]
    w = n_pop[:, None] / (n_pop[:, None] + n_pop[None, :])            # [P,P]
    pi_s = w[None] * pi[:, :, None] + (1 - w[None]) * pi[:, None, :]
    pooled = jnp.stack([
        jnp.stack([_block_nanmean(dist, shared_offdiag,
                                  jnp.clip(pm[a] + pm[b], 0, 1),
                                  jnp.clip(pm[a] + pm[b], 0, 1))
                   for b in range(P)], axis=1)
        for a in range(P)], axis=1)
    fst = 1.0 - pi_s / pooled

    # per-window per-pop allele counts (for freq/SFS-style accumulators)
    onehot = ((wa[..., None] == jnp.arange(4, dtype=jnp.int8))
              & valid[:, None, :, None]).astype(jnp.bfloat16)         # [B,H,s,4]
    wcounts = jnp.einsum("ph,bhsa->bpa", pm.astype(jnp.bfloat16), onehot,
                         preferred_element_type=jnp.float32)          # [B,P,4]

    return {"pi": pi, "dxy": dxy, "fst": fst,
            "mismatch": mismatch, "shared": shared,
            "pop_counts": wcounts.astype(jnp.int32)}
