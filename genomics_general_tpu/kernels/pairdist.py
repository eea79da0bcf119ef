"""Pairwise masked-Hamming counting on the MXU.

The reference's hottest loop is the O(N^2 * L) per-window distance matrix
(``Alignment.distMatrix`` / ``pairDist`` / ``numHamming``,
/root/reference/genomics.py:903-916, 1219-1221): for haplotypes i, j

    shared(i,j) = #sites where both are called
    dist(i,j)   = #mismatches / shared(i,j)          (nan when shared == 0)

We compute the two integer count matrices with batched matmuls over 0/1
one-hot factors (f32 accumulation => exact integers):

    match(i,j)  = sum_s sum_a onehot[i,s,a] * onehot[j,s,a]
    shared(i,j) = sum_s called[i,s] * called[j,s]
    mismatch    = shared - match

The float64 division and all block/nan reductions happen on host
(stats/popgen.py) to stay bit-identical with the reference.

Window batching: windows are contiguous spans of the chunk's site axis; a
batch gathers B spans padded to S_max (padding index 0 with valid=False, so
padded sites contribute nothing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pairwise_counts(window_alleles: jnp.ndarray,
                    valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched pairwise mismatch/shared counts.

    Parameters
    ----------
    window_alleles : int8 [B, H, S] (padded window batch)
    valid : bool [B, S] validity of each padded site slot

    Returns (mismatch int32 [B, H, H], shared int32 [B, H, H]).
    """
    v = valid[:, None, :]                                        # [B,1,S]
    called = ((window_alleles >= 0) & v).astype(jnp.bfloat16)     # [B,H,S]
    shared = jnp.einsum("bhs,bgs->bhg", called, called,
                        preferred_element_type=jnp.float32)
    codes = jnp.arange(4, dtype=jnp.int8)
    onehot = ((window_alleles[..., None] == codes) & v[..., None])
    onehot = onehot.astype(jnp.bfloat16)                          # [B,H,S,4]
    B, H, S, _ = onehot.shape
    flat = onehot.reshape(B, H, S * 4)
    match = jnp.einsum("bhx,bgx->bhg", flat, flat,
                       preferred_element_type=jnp.float32)
    mismatch = shared - match
    return mismatch.astype(jnp.int32), shared.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("s_max",))
def gather_window_batch(alleles: jnp.ndarray, first: jnp.ndarray,
                        n_sites: jnp.ndarray, s_max: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather B contiguous spans from alleles [H, S] into [B, H, s_max].

    first : int32 [B] span starts; n_sites : int32 [B] span lengths.
    Padded slots gather site 0 but are masked by the returned valid [B, s_max].
    """
    offs = jnp.arange(s_max, dtype=jnp.int32)
    idx = first[:, None] + offs[None, :]
    valid = offs[None, :] < n_sites[:, None]
    idx = jnp.where(valid, idx, 0)
    wa = alleles[:, idx]                   # [H, B, s_max]
    return wa.transpose(1, 0, 2), valid


def long_span_pair_counts(alleles_dev: jnp.ndarray, first: int, last: int,
                          block: int = 1 << 18):
    """Pairwise counts over one very long span (e.g. distMat --windType cat):
    stream site blocks through the batched kernel and accumulate on host.
    Avoids the reference's materialize-the-genome RAM cliff (README.md:214)."""
    H = alleles_dev.shape[0]
    mism = np.zeros((H, H), dtype=np.int64)
    shar = np.zeros((H, H), dtype=np.int64)
    for b0 in range(first, last, block):
        b1 = min(b0 + block, last)
        wa = alleles_dev[:, b0:b1][None]
        valid = jnp.ones((1, b1 - b0), dtype=bool)
        m, s = pairwise_counts(wa, valid)
        mism += np.asarray(m[0], dtype=np.int64)
        shar += np.asarray(s[0], dtype=np.int64)
    return mism, shar


def _pack_counts(m, s, s_max):
    # One fetch per batch, packed [B, 2*H*H]: device->host links have high
    # fixed latency, and keeping the (possibly sharded) batch axis leading
    # avoids on-device relayout / collectives.  Counts are bounded by s_max,
    # so uint16 halves the transfer when windows fit (they always do for
    # bucketed window batches; cat-mode long spans go through
    # long_span_pair_counts instead).
    out = jnp.stack([m, s], axis=1).reshape(m.shape[0], -1)
    return out.astype(jnp.uint16) if s_max < (1 << 16) else out


@functools.partial(jax.jit, static_argnames=("s_max",))
def _gathered_pair_counts(alleles: jnp.ndarray, first: jnp.ndarray,
                          n_sites: jnp.ndarray, s_max: int):
    wa, valid = gather_window_batch(alleles, first, n_sites, s_max)
    m, s = pairwise_counts(wa, valid)
    return _pack_counts(m, s, s_max)


@functools.lru_cache(maxsize=8)
def _sharded_gathered_pair_counts(mesh):
    """Data-parallel variant: the window-batch axis is sharded over the
    mesh's ``data`` axis; the allele matrix is replicated (SURVEY §2.10 DP).
    XLA partitions the gather + matmuls with no collectives on the hot path;
    output stays batch-sharded, fetched once per batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, static_argnames=("s_max",),
                       out_shardings=batch)
    def fn(alleles, first, n_sites, s_max):
        # constraints (not in_shardings): inputs may arrive replicated
        # (engine's rolling device buffer) or as host arrays
        first = jax.lax.with_sharding_constraint(first, batch)
        n_sites = jax.lax.with_sharding_constraint(n_sites, batch)
        wa, valid = gather_window_batch(alleles, first, n_sites, s_max)
        m, s = pairwise_counts(wa, valid)
        return _pack_counts(m, s, s_max)

    return fn


def window_pair_counts(alleles_dev: jnp.ndarray, first: np.ndarray,
                       n_sites: np.ndarray, batch_size: int = 1024,
                       bucket_rounding: int = 1024, mesh=None):
    """Host driver: compute pairwise counts for all windows.

    Windows are bucketed by padded length (rounded up to ``bucket_rounding``)
    to bound recompilation and dispatched in fixed-size batches.  All device
    calls are launched asynchronously before any result is fetched, so
    host<->device latency overlaps with compute.  With a ``mesh``, each batch
    is sharded data-parallel over the mesh devices.  Returns numpy
    (mismatch [W, H, H], shared [W, H, H]) in window order.
    """
    W = first.shape[0]
    H = alleles_dev.shape[0]
    mism = np.empty((W, H, H), dtype=np.int32)
    shar = np.empty((W, H, H), dtype=np.int32)
    if W == 0:
        return mism, shar
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    fn = _sharded_gathered_pair_counts(mesh) if mesh is not None \
        else _gathered_pair_counts
    padded = np.maximum(
        bucket_rounding,
        ((n_sites + bucket_rounding - 1) // bucket_rounding) * bucket_rounding)
    order = np.argsort(padded, kind="stable")
    pending = []
    i = 0
    while i < W:
        j = i
        s_max = int(padded[order[i]])
        while j < W and padded[order[j]] == s_max and j - i < batch_size:
            j += 1
        sel = order[i:j]
        b = sel.size
        # pad the batch to n_dev * 2^k (not to batch_size): bounds compile
        # count to log2(batch_size) variants while keeping transfers ~b-sized
        # and the batch divisible over the mesh
        bsz = max(8, n_dev)
        while bsz < b:
            bsz *= 2
        f = np.zeros(bsz, dtype=np.int32)
        ns = np.zeros(bsz, dtype=np.int32)
        f[:b] = first[sel]
        ns[:b] = n_sites[sel]
        ms = fn(alleles_dev, jnp.asarray(f), jnp.asarray(ns), s_max)
        pending.append((sel, b, bsz, ms))
        i = j
    for sel, b, bsz, ms in pending:
        host = np.asarray(ms).astype(np.int32, copy=False).reshape(bsz, 2, H, H)
        mism[sel] = host[:b, 0]
        shar[sel] = host[:b, 1]
    return mism, shar
