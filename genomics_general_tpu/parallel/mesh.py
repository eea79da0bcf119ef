"""Multi-chip / multi-host scaling for the window-statistics engine.

Replaces the reference's per-script multiprocessing pipeline (producer ->
worker Processes -> sorter Thread -> writer, e.g.
/root/reference/popgenWindows.py:386-421) with a static sharded schedule over
a `jax.sharding.Mesh`:

* window batches are sharded **data-parallel** over the ``data`` axis — each
  device computes the pair-count matrices / allele counts for its contiguous
  slab of windows (output order is positional, so no sorter is needed),
* the encoded haplotype matrix is replicated (it is the "model state" analog;
  population metadata in the reference is likewise replicated via pickling),
* genome-wide accumulators (SFS bins, global distance matrices, block-
  jackknife partials) are merged with ``psum`` collectives over ICI,
* multi-host runs give each host its own scaffold/byte range of the input
  (hosts parse independently); per-window outputs are gathered to host 0 by
  window id, which is statically known — ordering is deterministic by
  construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_window_pair_counts(alleles: np.ndarray, first: np.ndarray,
                               n_sites: np.ndarray, mesh: Mesh,
                               s_max: int | None = None):
    """Data-parallel pair counts: window batch sharded over mesh devices.

    Pads the batch to a multiple of the mesh size, places the batch axis with
    a NamedSharding, and lets XLA partition the gather + matmuls.  Returns
    numpy (mismatch [W,H,H], shared [W,H,H]).
    """
    n_dev = mesh.devices.size
    W = first.shape[0]
    if s_max is None:
        s_max = max(1024, int(((n_sites.max() if W else 1) + 1023) // 1024) * 1024)
    Wp = max(n_dev, ((W + n_dev - 1) // n_dev) * n_dev)
    f = np.zeros(Wp, np.int32)
    ns = np.zeros(Wp, np.int32)
    f[:W] = first
    ns[:W] = n_sites

    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    alleles_d = jax.device_put(jnp.asarray(alleles), repl)
    f_d = jax.device_put(jnp.asarray(f), batch_sharding)
    ns_d = jax.device_put(jnp.asarray(ns), batch_sharding)

    @functools.partial(jax.jit, static_argnames=("s_max",),
                       out_shardings=(batch_sharding, batch_sharding))
    def step(alleles, first, n_sites, s_max):
        from ..kernels.pairdist import gather_window_batch, pairwise_counts
        wa, valid = gather_window_batch(alleles, first, n_sites, s_max)
        return pairwise_counts(wa, valid)

    m, s = step(alleles_d, f_d, ns_d, s_max)
    return np.asarray(m)[:W], np.asarray(s)[:W]


def sharded_pair_counts_tp(alleles: np.ndarray, first: np.ndarray,
                           n_sites: np.ndarray, mesh: Mesh,
                           s_max: int | None = None):
    """Tensor-parallel pair counts: the HAPLOTYPE (row) axis of the
    [W, H, H] output is sharded over the mesh (SURVEY §2.10 TP — the
    optional strategy for very large cohorts, where a single device cannot
    hold the [W, H, H] blocks).  The allele matrix is replicated; each
    device computes its row-block of every window's matrix (XLA partitions
    the Gram matmuls by output rows — no collectives on the hot path).
    Returns numpy (mismatch [W, H, H], shared [W, H, H])."""
    n_dev = mesh.devices.size
    W = first.shape[0]
    H = alleles.shape[0]
    if s_max is None:
        s_max = max(256, int((int(n_sites.max()) if W else 1) + 255)
                    // 256 * 256)
    Hp = ((H + n_dev - 1) // n_dev) * n_dev
    a = np.full((Hp, alleles.shape[1]), -1, dtype=np.int8)
    a[:H] = alleles
    rows = NamedSharding(mesh, P(None, "data", None))     # [W, i, j] rows
    repl = NamedSharding(mesh, P())
    a_d = jax.device_put(jnp.asarray(a), repl)
    f_d = jax.device_put(jnp.asarray(first.astype(np.int32)), repl)
    ns_d = jax.device_put(jnp.asarray(n_sites.astype(np.int32)), repl)

    @functools.partial(jax.jit, static_argnames=("s_max",),
                       out_shardings=(rows, rows))
    def step(alleles, first, n_sites, s_max):
        from ..kernels.pairdist import gather_window_batch, pairwise_counts
        wa, valid = gather_window_batch(alleles, first, n_sites, s_max)
        return pairwise_counts(wa, valid)

    m, s = step(a_d, f_d, ns_d, s_max)
    return np.asarray(m)[:, :H, :H], np.asarray(s)[:, :H, :H]


def sharded_site_pop_counts(alleles: np.ndarray, pop_mask: np.ndarray,
                            mesh: Mesh):
    """Sequence-parallel allele counting: the site axis is sharded over the
    mesh (the reference's streaming/"long context" analog, SURVEY §2.10)."""
    n_dev = mesh.devices.size
    H, S = alleles.shape
    Sp = ((S + n_dev - 1) // n_dev) * n_dev
    a = np.full((H, Sp), -1, dtype=np.int8)
    a[:, :S] = alleles
    site_sharding = NamedSharding(mesh, P(None, "data"))
    repl = NamedSharding(mesh, P())
    a_d = jax.device_put(jnp.asarray(a), site_sharding)
    pm_d = jax.device_put(jnp.asarray(pop_mask), repl)

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P("data")))
    def step(alleles, pm):
        from ..kernels.counts import site_pop_counts
        return site_pop_counts(alleles, pm)

    out = step(a_d, pm_d)
    return np.asarray(out)[:S]


def sharded_global_sfs(alleles: np.ndarray, pop_mask: np.ndarray,
                       n_hap: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Genome-wide folded joint SFS accumulated on device and merged with a
    psum over the mesh (the jackknife/SFS accumulator pattern, SURVEY §2.3).

    Returns a dense [n_hap[0]+1, ..., n_hap[P-1]+1] spectrum counting sites
    with complete data in every pop (minor-allele targets).
    """
    from jax import shard_map

    n_dev = mesh.devices.size
    H, S = alleles.shape
    Sp = ((S + n_dev - 1) // n_dev) * n_dev
    a = np.full((H, Sp), -1, dtype=np.int8)
    a[:, :S] = alleles
    P_ = pop_mask.shape[0]
    dims = tuple(int(n) + 1 for n in n_hap)

    def local(alleles_blk, pm):
        from ..kernels.counts import site_pop_counts
        counts = site_pop_counts(alleles_blk, pm)          # [s, P, 4]
        nh = jnp.asarray(n_hap, dtype=jnp.int32)
        complete = (counts.sum(axis=2) == nh[None, :]).all(axis=1)
        total = counts.sum(axis=1)                          # [s, 4]
        n_alleles = (total > 0).sum(axis=1)
        ok = complete & (n_alleles >= 1) & (n_alleles <= 2)
        order = jnp.argsort(total, axis=1)
        target = order[:, 2]                                # second-highest
        tgt_counts = jnp.take_along_axis(
            counts, target[:, None, None], axis=2)[:, :, 0]  # [s, P]
        flat_idx = jnp.zeros(alleles_blk.shape[1], dtype=jnp.int32)
        stride = 1
        for p in range(P_ - 1, -1, -1):
            flat_idx = flat_idx + tgt_counts[:, p] * stride
            stride *= dims[p]
        sfs = jnp.zeros(int(np.prod(dims)), dtype=jnp.int32)
        sfs = sfs.at[flat_idx].add(ok.astype(jnp.int32))
        return jax.lax.psum(sfs, "data")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, "data"), P()),
                   out_specs=P())
    out = fn(jnp.asarray(a), jnp.asarray(pop_mask))
    return np.asarray(out).reshape(dims)
