"""Wire-format-v2 pairwise kernel: pack/unpack, tri counts vs the 4-state
oracle, and the on-device float64 block-stats path vs the host finalize."""

import numpy as np
import pytest

from genomics_general_tpu.kernels import pairdist as pair_k
from genomics_general_tpu.kernels import transfer
from genomics_general_tpu.stats import popgen


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def messy_alleles(rng, H=14, S=900):
    """Random alleles with missing data and deliberate multi-allelic sites."""
    a = rng.integers(0, 2, size=(H, S)).astype(np.int8)   # mostly biallelic 0/1
    a[rng.random((H, S)) < 0.12] = -1
    tri = rng.choice(S, size=S // 20, replace=False)       # ~5% multi-allelic
    for s in tri:
        a[rng.integers(0, H, 3), s] = rng.integers(2, 4)
    return a


def oracle_counts(a, first, n_sites):
    W = len(first)
    H = a.shape[0]
    m = np.zeros((W, H, H), np.int64)
    s = np.zeros((W, H, H), np.int64)
    nm = a >= 0
    for w in range(W):
        span = slice(first[w], first[w] + n_sites[w])
        for i in range(H):
            for j in range(H):
                both = nm[i, span] & nm[j, span]
                s[w, i, j] = both.sum()
                m[w, i, j] = (a[i, span][both] != a[j, span][both]).sum()
    return m, s


def make_windows(S, rng, overlap=False):
    if overlap:
        first = np.array([0, 100, 250, 400, 400, 700], np.int32)
        n = np.array([300, 300, 300, 200, 400, 200], np.int32)
    else:
        bounds = np.sort(rng.choice(np.arange(1, S), 5, replace=False))
        first = np.concatenate([[0], bounds]).astype(np.int32)
        n = (np.concatenate([bounds, [S]]) - first).astype(np.int32)
    return first, n


def test_pack_pair_wire_numpy_matches_native(rng):
    a = messy_alleles(rng)
    H, S = a.shape
    sp8 = -(-S // 8) + 3          # a few pad bytes; both packers must zero them
    c1 = np.empty((H, sp8), np.uint8)
    a1 = np.empty((H, sp8), np.uint8)
    r1 = transfer._pack_pair_planes_numpy(a, c1, a1, sp8)
    from genomics_general_tpu.io import native
    c2 = np.empty((H, sp8), np.uint8)
    a2 = np.empty((H, sp8), np.uint8)
    r2 = native.pack_pair_planes_native(a, c2, a2, sp8)
    if r2 is None:
        pytest.skip("native library unavailable")
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(r1[0], r2[0])   # refalt codes
    np.testing.assert_array_equal(r1[1], r2[1])   # exception indices


@pytest.mark.parametrize("overlap", [False, True])
def test_fused_v2_tri_matches_oracle(rng, overlap):
    a = messy_alleles(rng)
    H, S = a.shape
    first, n = make_windows(S, rng, overlap)
    handle = pair_k._dispatch_fused(a, first, n)
    m, s = handle.collect()
    om, os_ = oracle_counts(a, first, n)
    np.testing.assert_array_equal(m, om)
    np.testing.assert_array_equal(s, os_)


def test_fused_v2_no_exceptions_path(rng):
    a = rng.integers(0, 2, size=(10, 400)).astype(np.int8)  # pure biallelic
    a[rng.random(a.shape) < 0.1] = -1
    first = np.array([0, 200], np.int32)
    n = np.array([200, 200], np.int32)
    m, s = pair_k._dispatch_fused(a, first, n).collect()
    om, os_ = oracle_counts(a, first, n)
    np.testing.assert_array_equal(m, om)
    np.testing.assert_array_equal(s, os_)


def test_block_stats_matches_host_finalize(rng):
    a = messy_alleles(rng, H=16, S=1200)
    H, S = a.shape
    first, n = make_windows(S, rng)
    groups = [["pA", "pB"][h % 2] for h in range(H)]
    min_sites, min_data = 50, 0.3

    pops = [str(p) for p in np.unique(groups)]
    mask = np.zeros((len(pops), H), np.float64)
    for gi, g in enumerate(pops):
        mask[gi, np.array(groups) == g] = 1.0
    sizes = [int(mask[gi].sum()) for gi in range(len(pops))]

    sums, cnts = pair_k.window_pair_block_stats_dispatch(
        a, first, n, mask, min_sites).collect()
    got = popgen.group_dist_stats_from_blocks(
        sums, cnts, pops, sizes, do_pairs=True, min_data=min_data)

    om, os_ = oracle_counts(a, first, n)
    ctx = popgen.DistStatsContext(om.astype(np.int32), os_.astype(np.int32))
    want = popgen.group_dist_stats(ctx, groups, do_pairs=True,
                                   min_sites=min_sites, min_data=min_data)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-12, atol=1e-14,
                                   err_msg=k)
