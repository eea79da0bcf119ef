"""Tests for the packed host->device transfer and the fused f32 fast step.

Covers the round-1 review items: transfer.py previously had zero tests and
zero callers; window_stats_step (the __graft_entry__ forward step) had no
accuracy comparison against the CSV-exact float64 path; sample_het's
non-diploid behavior (reference raises IndexError, we emit NaN) was untested.
"""

import numpy as np
import pytest

from genomics_general_tpu.kernels.transfer import device_alleles, pack_alleles
from genomics_general_tpu.kernels import pairdist as pair_k
from genomics_general_tpu.stats import popgen


def _random_alleles(rng, H=14, S=500, missing=0.12):
    a = rng.integers(0, 4, size=(H, S)).astype(np.int8)
    a[rng.random((H, S)) < missing] = -1
    return a


@pytest.mark.parametrize("packed", ["0", "1"])
def test_pack_unpack_roundtrip(packed, monkeypatch):
    # device_alleles defaults to raw device_put (measured faster on the
    # target host); GGT_PACKED_TRANSFER=1 opts into the bit-packed planes
    monkeypatch.setenv("GGT_PACKED_TRANSFER", packed)
    rng = np.random.default_rng(3)
    for H, S in [(1, 1), (5, 7), (8, 8), (13, 1023), (40, 4097)]:
        a = _random_alleles(rng, H, S)
        got = np.asarray(device_alleles(a))
        np.testing.assert_array_equal(got, a)


def test_pack_wire_saving():
    a = _random_alleles(np.random.default_rng(0), H=16, S=4096)
    codes, miss, s = pack_alleles(a)
    assert s == 4096
    assert codes.nbytes + miss.nbytes < a.nbytes / 2.5


def test_pack_rejects_out_of_range():
    a = np.array([[0, 1, 4]], dtype=np.int8)
    with pytest.raises(AssertionError):
        pack_alleles(a)
    a = np.array([[-2, 0, 1]], dtype=np.int8)
    with pytest.raises(AssertionError):
        pack_alleles(a)


def test_fast_step_matches_exact_path():
    """window_stats_step (f32, on-device) vs the float64 CSV-exact path.

    The fast path ignores the reference's minData/minSites gates, so compare
    on complete data where both definitions coincide.
    """
    import functools

    from genomics_general_tpu.kernels.window_stats import window_stats_step

    rng = np.random.default_rng(7)
    H, S = 12, 1024
    alleles = rng.integers(0, 4, size=(H, S)).astype(np.int8)  # complete data
    first = np.arange(0, S, 128, dtype=np.int32)
    n_s = np.full(first.shape, 128, dtype=np.int32)
    pop_mask = np.zeros((2, H), np.float32)
    pop_mask[0, : H // 2] = 1
    pop_mask[1, H // 2:] = 1

    fast = window_stats_step(alleles, first, n_s, pop_mask, s_max=128)

    import jax.numpy as jnp
    mism, shar = pair_k.window_pair_counts(jnp.asarray(alleles), first, n_s,
                                           bucket_rounding=128)
    ctx = popgen.DistStatsContext(mism, shar)
    exact = popgen.group_dist_stats(
        ctx, ["pop1"] * (H // 2) + ["pop2"] * (H // 2),
        do_pairs=True, min_sites=0, min_data=0.0)

    np.testing.assert_allclose(np.asarray(fast["pi"])[:, 0], exact["pi_pop1"],
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(fast["pi"])[:, 1], exact["pi_pop2"],
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(fast["dxy"])[:, 0, 1],
                               exact["dxy_pop1_pop2"], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(fast["fst"])[:, 0, 1],
                               exact["Fst_pop1_pop2"], rtol=2e-4, atol=2e-5)


def test_sample_het_non_diploid_emits_nan():
    """Reference sampleHet raises IndexError on non-diploids
    (/root/reference/genomics.py:918-929 indexes two haplotypes); the engine
    documents NaN output instead — pin that behavior."""
    rng = np.random.default_rng(1)
    a = _random_alleles(rng, H=5, S=200)
    first = np.array([0], np.int32)
    n_s = np.array([200], np.int32)
    import jax.numpy as jnp
    mism, shar = pair_k.window_pair_counts(jnp.asarray(a), first, n_s,
                                           bucket_rounding=256)
    ctx = popgen.DistStatsContext(mism, shar)
    rows = [np.array([0, 1]), np.array([2]), np.array([3, 4])]
    het = popgen.sample_het(ctx, ["dip1", "hap", "dip2"], rows)
    assert np.isnan(het["hap"]).all()
    assert het["dip1"].shape == (1,)
