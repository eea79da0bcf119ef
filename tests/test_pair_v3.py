"""Wire-format-v3 (class-partitioned planes) pairwise kernel: classifier
parity (C vs numpy), v3 vs v2 count equality on messy data, and edge cases
(all-mono flushes, all-missing sites, empty classes)."""

import os

import numpy as np
import pytest

from genomics_general_tpu.kernels import pairdist as pair_k
from genomics_general_tpu.kernels import transfer

from .test_pair_v2 import make_windows, messy_alleles, oracle_counts


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def test_classify_native_matches_numpy(rng):
    a = messy_alleles(rng, H=12, S=700)
    from genomics_general_tpu.io import native
    r_nat = native.classify_pair_sites_native(a)
    if r_nat is None:
        pytest.skip("native library unavailable")
    r_np = transfer._classify_pair_sites_numpy(a)
    for got, want, name in zip(r_nat, r_np,
                               ("cls", "refalt", "ex_idx", "counts")):
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_emit_planes_native_matches_numpy(rng):
    a = messy_alleles(rng, H=9, S=500)
    first = np.array([0], np.int32)
    n = np.array([a.shape[1]], np.int32)
    buf_nat = transfer.pack_pair_wire_v3(a, first, n, 8)
    os.environ["GGT_NO_NATIVE_PARSER"] = "1"
    try:
        buf_np = transfer.pack_pair_wire_v3(a, first, n, 8)
    finally:
        del os.environ["GGT_NO_NATIVE_PARSER"]
    assert buf_nat[1:] == buf_np[1:]
    np.testing.assert_array_equal(buf_nat[0], buf_np[0])


def _counts_with_wire(a, first, n, wire):
    old = os.environ.get("GGT_WIRE")
    os.environ["GGT_WIRE"] = wire
    try:
        return pair_k._dispatch_fused(a, first, n).collect()
    finally:
        if old is None:
            os.environ.pop("GGT_WIRE", None)
        else:
            os.environ["GGT_WIRE"] = old


@pytest.mark.parametrize("overlap", [False, True])
def test_v3_matches_v2_and_oracle(rng, overlap):
    a = messy_alleles(rng, H=13, S=1000)
    first, n = make_windows(a.shape[1], rng, overlap)
    m3, s3 = _counts_with_wire(a, first, n, "3")
    m2, s2 = _counts_with_wire(a, first, n, "2")
    np.testing.assert_array_equal(m3, m2)
    np.testing.assert_array_equal(s3, s2)
    om, os_ = oracle_counts(a, first, n)
    np.testing.assert_array_equal(m3, om)
    np.testing.assert_array_equal(s3, os_)


def test_v3_all_monomorphic_flush(rng):
    """Every site clean-mono: zero wire planes, shared = window length."""
    H, S = 8, 600
    a = np.full((H, S), 2, np.int8)
    first = np.array([0, 300], np.int32)
    n = np.array([300, 300], np.int32)
    m, s = pair_k._dispatch_fused(a, first, n).collect()
    assert (m == 0).all()
    assert (s == 300).all()


def test_v3_edge_classes(rng):
    """All-missing sites drop; mono-with-missing and clean-biallelic mix."""
    H = 6
    cols = []
    cols += [np.full(H, -1, np.int8)] * 5                   # all missing
    for _ in range(40):                                     # mono w/ missing
        c = np.full(H, 1, np.int8)
        c[rng.integers(0, H)] = -1
        cols.append(c)
    for _ in range(40):                                     # clean biallelic
        c = rng.integers(0, 2, H).astype(np.int8)
        c[0] = 0
        c[1] = 1
        cols.append(c)
    cols += [np.full(H, 3, np.int8)] * 30                   # clean mono
    a = np.stack(cols, axis=1)
    rng.shuffle(a.T)            # interleave the classes
    S = a.shape[1]
    first = np.array([0, 50], np.int32)
    n = np.array([50, S - 50], np.int32)
    m, s = pair_k._dispatch_fused(a, first, n).collect()
    om, os_ = oracle_counts(a, first, n)
    np.testing.assert_array_equal(m, om)
    np.testing.assert_array_equal(s, os_)


def test_v3_multiallelic_exceptions(rng):
    """>2-allele sites ride the exception patch in v3 exactly as in v2."""
    H, S = 10, 400
    a = rng.integers(0, 2, size=(H, S)).astype(np.int8)
    a[:, 50] = np.arange(H) % 4                             # 4 alleles
    a[:4, 51] = [0, 1, 2, 3]
    a[4:, 51] = -1
    first = np.array([0, 45], np.int32)
    n = np.array([100, 300], np.int32)
    m, s = pair_k._dispatch_fused(a, first, n).collect()
    om, os_ = oracle_counts(a, first, n)
    np.testing.assert_array_equal(m, om)
    np.testing.assert_array_equal(s, os_)
