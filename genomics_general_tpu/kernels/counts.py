"""Per-site allele counting on the MXU.

Replaces the reference's per-site Python loops (``binBaseFreqs`` /
``Alignment.siteFreqs``, /root/reference/genomics.py:592-599, 1049-1052) with
one batched matmul per chunk:

    counts[s, p, a] = sum_h pop_mask[p, h] * (alleles[h, s] == a)

The one-hot factors are 0/1 bfloat16 and the matmul accumulates in float32
(``preferred_element_type``), so results are *exact integers* for any
realistic cohort (< 2^24 haplotypes per population).  Counts are returned as
int32; every downstream statistic derives from them in float64 on host,
guaranteeing value-equality with the reference's numpy math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# sites processed per device dispatch when chunking long site axes
DEFAULT_SITE_BLOCK = 1 << 18


def _one_hot_alleles(alleles: jnp.ndarray) -> jnp.ndarray:
    """int8 [..., S] -> bf16 one-hot [..., S, 4]; missing (<0) rows are zero."""
    a = alleles[..., None]
    codes = jnp.arange(4, dtype=jnp.int8)
    return (a == codes).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=())
def site_pop_counts(alleles: jnp.ndarray, pop_mask: jnp.ndarray) -> jnp.ndarray:
    """Base counts per site per population.

    Parameters
    ----------
    alleles : int8 [H, S]
    pop_mask : float/bf16 [P, H] 0/1 membership

    Returns int32 [S, P, 4].
    """
    onehot = _one_hot_alleles(alleles)                      # [H, S, 4]
    H, S, _ = onehot.shape
    flat = onehot.reshape(H, S * 4)
    counts = jnp.dot(pop_mask.astype(jnp.bfloat16), flat,
                     preferred_element_type=jnp.float32)    # [P, S*4]
    counts = counts.reshape(-1, S, 4).transpose(1, 0, 2)
    return counts.astype(jnp.int32)


@jax.jit
def site_nonmissing(alleles: jnp.ndarray, pop_mask: jnp.ndarray) -> jnp.ndarray:
    """Non-missing haplotype count per site per population: int32 [S, P]."""
    m = (alleles >= 0).astype(jnp.bfloat16)                 # [H, S]
    out = jnp.dot(pop_mask.astype(jnp.bfloat16), m,
                  preferred_element_type=jnp.float32)       # [P, S]
    return out.T.astype(jnp.int32)


@functools.lru_cache(maxsize=8)
def _sharded_site_pop_counts(mesh):
    """Sequence-parallel variant: the site axis sharded over the mesh's
    ``data`` axis (SURVEY §2.10 SP); the pop mask is replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sites = NamedSharding(mesh, P(None, "data"))

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P("data")))
    def fn(alleles, pop_mask):
        # constraint (not in_shardings): inputs may arrive replicated
        # (slices of the engine's rolling device buffer) or as host arrays
        alleles = jax.lax.with_sharding_constraint(alleles, sites)
        return site_pop_counts(alleles, pop_mask)

    return fn


@jax.jit
def _site_pop_counts_u16(alleles: jnp.ndarray, pop_mask: jnp.ndarray):
    # wire-packed variant: counts are bounded by the haplotype count, so
    # uint16 halves the device->host fetch (the link runs ~20 MB/s down)
    return site_pop_counts(alleles, pop_mask).astype(jnp.uint16)


@functools.lru_cache(maxsize=8)
def _sharded_site_pop_counts_u16(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    sites = NamedSharding(mesh, P(None, "data"))

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P("data")))
    def fn(alleles, pop_mask):
        alleles = jax.lax.with_sharding_constraint(alleles, sites)
        return site_pop_counts(alleles, pop_mask).astype(jnp.uint16)

    return fn


class SitePopCountsHandle:
    """In-flight per-site count blocks (dispatched, not yet fetched)."""

    def __init__(self, S: int, P: int, pending: list):
        self.S, self.P, self.pending = S, P, pending

    def collect(self) -> np.ndarray:
        out = np.empty((self.S, self.P, 4), dtype=np.int32)
        for s0, s1, arr in self.pending:
            out[s0:s1] = np.asarray(arr)[:s1 - s0]
        self.pending = []
        return out


def site_pop_counts_dispatch(alleles, pop_mask: np.ndarray,
                             block: int = DEFAULT_SITE_BLOCK,
                             mesh=None) -> SitePopCountsHandle:
    """Dispatch per-site counting for the whole span without fetching.

    ``alleles`` may be a host int8 [H, S] span (uploaded bit-packed via
    kernels/transfer) or a device array; with a ``mesh`` each block is
    sharded sequence-parallel over the mesh devices.  Results come back
    uint16 (counts are bounded by the haplotype count) and widen to int32
    on host."""
    H, S = alleles.shape
    P = pop_mask.shape[0]
    handle = SitePopCountsHandle(S, P, [])
    if S == 0:
        return handle
    if isinstance(alleles, np.ndarray) and mesh is None and P <= 8:
        # adaptive executor (same policy as kernels/pairdist): small-cohort
        # counting is one C pass over the span with zero device transfers —
        # the O(sites) count fetch rode a link whose bandwidth varies 40x
        from .pairdist import _exec_choice
        if _exec_choice(H) == "host":
            from ..io import native
            membership = np.zeros(H, dtype=np.uint8)
            for p in range(P):
                membership[np.asarray(pop_mask[p]) > 0] |= 1 << p
            c = native.site_pop_counts_host_native(alleles, membership)
            if c is not None:
                if c.shape[1] < P:       # trailing all-empty masks
                    c = np.concatenate(
                        [c, np.zeros((S, P - c.shape[1], 4), c.dtype)],
                        axis=1)
                handle.pending.append((0, S, c[:, :P].astype(np.int32)))
                return handle
    if isinstance(alleles, np.ndarray):
        from . import transfer
        alleles = transfer.upload_span(alleles, mesh=mesh)
    pm = jnp.asarray(pop_mask)
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    fn = _sharded_site_pop_counts_u16(mesh) if mesh is not None \
        else _site_pop_counts_u16
    for s0 in range(0, S, block):
        s1 = min(s0 + block, S)
        blk = alleles[:, s0:s1]
        n = s1 - s0
        if n_dev > 1 and n % n_dev:
            # pad the site axis to the mesh size; -1 (missing) sites add 0
            blk = jnp.concatenate(
                [blk, jnp.full((H, n_dev - n % n_dev), -1, dtype=jnp.int8)],
                axis=1)
        handle.pending.append((s0, s1, fn(blk, pm)))
    return handle


def site_pop_counts_chunked(alleles, pop_mask: np.ndarray,
                            block: int = DEFAULT_SITE_BLOCK,
                            mesh=None) -> np.ndarray:
    """Dispatch + collect in one call: numpy int32 [S, P, 4]."""
    return site_pop_counts_dispatch(alleles, pop_mask, block=block,
                                    mesh=mesh).collect()


@jax.jit
def sample_base_counts(alleles: jnp.ndarray) -> jnp.ndarray:
    """Per-haplotype-row one-hot (for per-individual counting): int32 [H, S, 4]."""
    return _one_hot_alleles(alleles).astype(jnp.int32)
