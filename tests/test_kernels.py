"""Unit tests of the device kernels against pure-numpy oracles."""

import numpy as np
import pytest

from genomics_general_tpu.kernels import counts as counts_k
from genomics_general_tpu.kernels import pairdist as pair_k


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def random_alleles(rng, H=24, S=700, missing=0.15):
    a = rng.integers(0, 4, size=(H, S)).astype(np.int8)
    a[rng.random((H, S)) < missing] = -1
    return a


def test_site_pop_counts_oracle(rng):
    a = random_alleles(rng)
    H, S = a.shape
    P = 3
    mask = np.zeros((P, H), np.float32)
    for h in range(H):
        mask[rng.integers(0, P), h] = 1
    got = np.asarray(counts_k.site_pop_counts(a, mask))
    want = np.zeros((S, P, 4), np.int32)
    for p in range(P):
        rows = np.flatnonzero(mask[p])
        for s in range(S):
            vals = a[rows, s]
            vals = vals[vals >= 0]
            want[s, p] = np.bincount(vals, minlength=4)
    np.testing.assert_array_equal(got, want)


def test_site_nonmissing_oracle(rng):
    a = random_alleles(rng)
    H, S = a.shape
    mask = np.ones((1, H), np.float32)
    got = np.asarray(counts_k.site_nonmissing(a, mask))[:, 0]
    np.testing.assert_array_equal(got, (a >= 0).sum(axis=0))


def test_pairwise_counts_oracle(rng):
    a = random_alleles(rng, H=10, S=300)
    H, S = a.shape
    valid = np.ones((1, S), bool)
    valid[0, 250:] = False          # padded tail must not contribute
    mism, shar = pair_k.pairwise_counts(a[None], valid)
    mism, shar = np.asarray(mism)[0], np.asarray(shar)[0]
    nm = a >= 0
    for i in range(H):
        for j in range(H):
            m = nm[i, :250] & nm[j, :250]
            assert shar[i, j] == m.sum()
            assert mism[i, j] == (a[i, :250][m] != a[j, :250][m]).sum()


def test_window_pair_counts_buckets(rng):
    a = random_alleles(rng, H=8, S=5000)
    import jax.numpy as jnp
    first = np.array([0, 100, 1000, 2000], np.int32)
    n = np.array([50, 600, 1500, 3000], np.int32)
    mism, shar = pair_k.window_pair_counts(jnp.asarray(a), first, n,
                                           batch_size=2, bucket_rounding=512)
    nm = a >= 0
    for w in range(4):
        sl = slice(first[w], first[w] + n[w])
        for i in range(8):
            for j in range(8):
                m = nm[i, sl] & nm[j, sl]
                assert shar[w, i, j] == m.sum()
                assert mism[w, i, j] == (a[i, sl][m] != a[j, sl][m]).sum()


def test_site_pop_counts_host_executor_matches_device():
    """GGT_EXEC=host routes site counting through the C pass; counts must
    equal the device kernel's exactly (overlapping masks included)."""
    import os

    import numpy as np

    from genomics_general_tpu.kernels import counts as counts_k
    rng = np.random.default_rng(9)
    H, S = 14, 3000
    al = rng.integers(-1, 4, size=(H, S)).astype(np.int8)
    mask = np.zeros((3, H), np.float32)
    mask[0, :7] = 1
    mask[1, 7:] = 1
    mask[2, :] = 1                      # union overlaps both
    old = os.environ.get("GGT_EXEC")
    try:
        os.environ["GGT_EXEC"] = "tpu"
        dev = counts_k.site_pop_counts_chunked(al, mask)
        os.environ["GGT_EXEC"] = "host"
        host = counts_k.site_pop_counts_chunked(al, mask)
    finally:
        os.environ["GGT_EXEC"] = old or "tpu"
    np.testing.assert_array_equal(host, dev)
