"""Sharded-mesh tests: N-device results must equal 1-device results."""

import numpy as np
import pytest

pytestmark = pytest.mark.multichip


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    H, S = 12, 3000
    alleles = rng.integers(0, 4, size=(H, S)).astype(np.int8)
    alleles[rng.random((H, S)) < 0.1] = -1
    pop_mask = np.zeros((2, H), np.float32)
    pop_mask[0, :6] = 1
    pop_mask[1, 6:] = 1
    return alleles, pop_mask


def test_sharded_pair_counts_match_single(data):
    import jax.numpy as jnp

    from genomics_general_tpu.kernels.pairdist import window_pair_counts
    from genomics_general_tpu.parallel import mesh as pmesh

    alleles, _ = data
    first = np.array([0, 500, 1000, 1500, 2000, 2400], np.int32)
    n_s = np.array([500, 500, 500, 500, 400, 600], np.int32)
    m = pmesh.make_mesh()
    assert m.devices.size == 8
    mism, shar = pmesh.sharded_window_pair_counts(alleles, first, n_s, m,
                                                  s_max=1024)
    m1, s1 = window_pair_counts(jnp.asarray(alleles), first, n_s,
                                batch_size=8, bucket_rounding=1024)
    np.testing.assert_array_equal(mism, m1)
    np.testing.assert_array_equal(shar, s1)


def test_sharded_pair_counts_tp_match_single(data):
    """Tensor-parallel variant: the haplotype rows of the [W, H, H] output
    shard over the mesh (SURVEY §2.10 TP, for cohorts whose pair blocks
    exceed one device's memory) — results equal the single-device kernel."""
    import jax.numpy as jnp

    from genomics_general_tpu.kernels.pairdist import window_pair_counts
    from genomics_general_tpu.parallel import mesh as pmesh

    alleles, _ = data
    first = np.array([0, 700, 1500, 2300], np.int32)
    n_s = np.array([700, 800, 800, 700], np.int32)
    m = pmesh.make_mesh()
    mism, shar = pmesh.sharded_pair_counts_tp(alleles, first, n_s, m,
                                              s_max=1024)
    m1, s1 = window_pair_counts(jnp.asarray(alleles), first, n_s,
                                batch_size=8, bucket_rounding=1024)
    np.testing.assert_array_equal(mism, m1)
    np.testing.assert_array_equal(shar, s1)


def test_sharded_site_counts_match_single(data):
    from genomics_general_tpu.kernels import counts as counts_k
    from genomics_general_tpu.parallel import mesh as pmesh

    alleles, pop_mask = data
    m = pmesh.make_mesh()
    got = pmesh.sharded_site_pop_counts(alleles, pop_mask, m)
    want = counts_k.site_pop_counts_chunked(alleles, pop_mask)
    np.testing.assert_array_equal(got, want)


def test_sharded_global_sfs_oracle(data):
    from genomics_general_tpu.parallel import mesh as pmesh

    alleles, pop_mask = data
    m = pmesh.make_mesh()
    n_hap = pop_mask.sum(axis=1).astype(int)
    sfs = pmesh.sharded_global_sfs(alleles, pop_mask, n_hap, m)

    # numpy oracle
    want = np.zeros_like(sfs)
    for s in range(alleles.shape[1]):
        col = alleles[:, s]
        cnts = []
        ok = True
        for p in range(pop_mask.shape[0]):
            rows = np.flatnonzero(pop_mask[p])
            vals = col[rows]
            vals = vals[vals >= 0]
            if vals.size != n_hap[p]:
                ok = False
                break
            cnts.append(np.bincount(vals, minlength=4))
        if not ok:
            continue
        total = np.sum(cnts, axis=0)
        n_alleles = (total > 0).sum()
        if not 1 <= n_alleles <= 2:
            continue
        target = np.argsort(total)[2]
        idx = tuple(int(c[target]) for c in cnts)
        want[idx] += 1
    np.testing.assert_array_equal(sfs, want)


def test_dryrun_multichip():
    import importlib.util
    from pathlib import Path
    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
