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


@pytest.mark.parametrize("overlap", [False, True])
def test_host_executor_matches_device(rng, overlap):
    """The host C pairwise executor (GGT_EXEC=host) must produce the same
    mismatch/shared integers as the jit path on messy data."""
    a = messy_alleles(rng, H=11, S=900)
    first, n = make_windows(a.shape[1], rng, overlap)
    mh, sh = _counts_with_wire(a, first, n, "3")           # device (conftest)
    old = os.environ.get("GGT_EXEC")
    os.environ["GGT_EXEC"] = "host"
    try:
        m2, s2 = pair_k._dispatch_fused(a, first, n).collect()
    finally:
        os.environ["GGT_EXEC"] = old or "tpu"
    np.testing.assert_array_equal(m2, mh)
    np.testing.assert_array_equal(s2, sh)


def test_host_executor_blocks_matches_device(rng):
    """Blocks mode (sums/cnts) host vs device, including min_sites gating
    and the het rows of blocks_het."""
    a = messy_alleles(rng, H=12, S=1100)
    H = a.shape[0]
    first, n = make_windows(a.shape[1], rng)
    mask = np.zeros((2, H)); mask[0, :6] = 1; mask[1, 6:] = 1
    het_rows = np.array([[0, 2, 4, 6, 8, 10], [1, 3, 5, 7, 9, 11]],
                        dtype=np.int32)
    ind_mask = np.zeros((6, H))
    for k in range(6):
        ind_mask[k, 2 * k:2 * k + 2] = 1

    def run(exec_):
        old = os.environ.get("GGT_EXEC")
        os.environ["GGT_EXEC"] = exec_
        try:
            b = pair_k.window_pair_block_stats_dispatch(
                a, first, n, mask, 40).collect()
            hb = pair_k.window_pair_ind_blocks_dispatch(
                a, first, n, ind_mask, het_rows, 40).collect()
        finally:
            os.environ["GGT_EXEC"] = old or "tpu"
        return b, hb

    (s_d, c_d), (hs_d, hc_d, hm_d, hsh_d) = run("tpu")
    (s_h, c_h), (hs_h, hc_h, hm_h, hsh_h) = run("host")
    np.testing.assert_allclose(s_h, s_d, rtol=1e-12, atol=1e-15)
    np.testing.assert_array_equal(c_h, c_d)
    np.testing.assert_allclose(hs_h, hs_d, rtol=1e-12, atol=1e-15)
    np.testing.assert_array_equal(hc_h, hc_d)
    np.testing.assert_array_equal(hm_h, hm_d)
    np.testing.assert_array_equal(hsh_h, hsh_d)


def test_host_executor_cli_golden(tmp_path):
    """popgenWindows with GGT_EXEC=host matches the device-path output."""
    from .util import run_cli
    from pathlib import Path
    D = Path(__file__).parent / "data"
    args = ["-g", str(D / "sim1.geno.gz"), "-f", "phased", "-w", "50000",
            "-m", "100", "--popsFile", str(D / "sim1.pops.txt"),
            "-p", "pop1", "-p", "pop2", "--analysis", "popDist",
            "popPairDist", "indHet"]
    run_cli("genomics_general_tpu.cli.popgen_windows",
            args + ["-o", str(tmp_path / "dev.csv")],
            env_extra={"GGT_EXEC": "tpu"})
    run_cli("genomics_general_tpu.cli.popgen_windows",
            args + ["-o", str(tmp_path / "host.csv")],
            env_extra={"GGT_EXEC": "host"})
    assert (tmp_path / "dev.csv").read_bytes() == \
        (tmp_path / "host.csv").read_bytes()


def test_v3_large_H_device_path(rng):
    """Cohort-scale sanity for the DEVICE path (the auto executor only uses
    it above the host/device crossover): H=160 haplotypes, v3 vs v2 vs a
    vectorized numpy oracle."""
    H, S = 160, 1500
    a = rng.integers(0, 2, size=(H, S)).astype(np.int8)
    a[rng.random((H, S)) < 0.08] = -1
    a[rng.integers(0, H, 5), 700] = 2                       # one exception
    first = np.array([0, 400, 900], np.int32)
    n = np.array([500, 500, 600], np.int32)

    def np_oracle(w):
        sub = a[:, first[w]:first[w] + n[w]].astype(np.int64)
        called = (sub >= 0).astype(np.float64)
        s = called @ called.T
        oh = np.stack([(sub == c) for c in range(4)], axis=-1) \
            .astype(np.float64)
        m = s - np.einsum("hsa,gsa->hg", oh, oh)
        return m.astype(np.int64), s.astype(np.int64)

    m3, s3 = _counts_with_wire(a, first, n, "3")
    m2, s2 = _counts_with_wire(a, first, n, "2")
    np.testing.assert_array_equal(m3, m2)
    np.testing.assert_array_equal(s3, s2)
    for w in range(3):
        om, os_ = np_oracle(w)
        np.testing.assert_array_equal(m3[w], om)
        np.testing.assert_array_equal(s3[w], os_)


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
