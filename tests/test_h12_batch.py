"""batch_cluster_sizes (window-axis-vectorized greedy clustering) must match
the scalar reference transcription exactly, including diag-NaN self-match
semantics and the break-to-singletons step (genomics.py:1239-1261)."""

import numpy as np

from genomics_general_tpu.stats import popgen


def test_batch_cluster_sizes_matches_scalar_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(100):
        n = int(rng.integers(1, 15))
        W = int(rng.integers(1, 6))
        d = rng.random((W, n, n))
        d = (d + d.transpose(0, 2, 1)) / 2
        if rng.random() < 0.5:
            idx = np.arange(n)
            d[:, idx, idx] = np.nan
        d[rng.random(d.shape) < 0.2] = np.nan
        md = float(rng.random())
        sizes, ones = popgen.batch_cluster_sizes(d, md)
        for w in range(W):
            ref = popgen.cluster_sizes(d[w], md)
            got = [int(x) for x in sizes[w] if x > 0] + [1] * int(ones[w])
            assert got == ref, (trial, w, got, ref)


def test_h12_stats_matches_scalar_oracle():
    rng = np.random.default_rng(1)
    W, H = 7, 12
    dist = rng.random((W, H, H))
    dist = (dist + dist.transpose(0, 2, 1)) / 2
    shared = np.full((W, H, H), 100, np.int64)
    groups = ["a"] * 6 + ["b"] * 6
    ctx = popgen.DistStatsContext(np.zeros((W, H, H), np.int64), shared)
    ctx.dist = dist
    got = popgen.h12_stats(ctx, groups, 0.3)

    for p, idx in (("a", np.arange(6)), ("b", np.arange(6, 12))):
        for w in range(W):
            sizes = np.array(popgen.cluster_sizes(
                dist[w][np.ix_(idx, idx)], 0.3))
            freq = sizes / sizes.sum()
            h1 = (freq ** 2).sum()
            if len(freq) > 1:
                h12 = h1 + 2 * freq[0] * freq[1]
                h2 = (freq[1:] ** 2).sum()
            else:
                h12, h2 = h1, 0.0
            assert abs(got["H1_" + p][w] - h1) < 1e-12
            assert abs(got["H12_" + p][w] - h12) < 1e-12
            assert abs(got["H2_" + p][w] - h2) < 1e-12
