"""Host ABBA executor (C pop counts + numpy f64 terms) vs the device
kernel: window sums must agree to float64 ulps, and the CLI output must be
byte-identical across executors."""

import os
from pathlib import Path

import numpy as np
import pytest

from genomics_general_tpu.kernels import abba as A

from .util import run_cli

D = Path(__file__).parent / "data"


def _messy(rng, H=40, S=4000):
    f = rng.beta(0.4, 0.4, size=S)
    al = (rng.random((H, S)) < f).astype(np.int8) \
        * rng.integers(1, 4, size=S).astype(np.int8)
    al[rng.random((H, S)) < 0.1] = -1
    tri = rng.choice(S, size=S // 30, replace=False)
    for s in tri:
        al[rng.integers(0, H, 3), s] = rng.integers(0, 4)
    return al


@pytest.mark.parametrize("mode", ["polarize", "fixed", "minor"])
@pytest.mark.parametrize("full", [False, True])
def test_host_matches_device(mode, full):
    import jax
    jax.config.update("jax_enable_x64", True)
    rng = np.random.default_rng(3)
    al = _messy(rng)
    H, S = al.shape
    first = np.arange(0, S - 100, 97, dtype=np.int32)
    n = np.full(first.size, 100, np.int32)
    mask = np.zeros((5, H), np.float32)
    for k in range(4):
        mask[k, k * 10:(k + 1) * 10] = 1
    mask[4] = mask[:4].sum(axis=0)
    n_pops = [10, 10, 10, 10]

    def run(exec_):
        old = os.environ.get("GGT_EXEC")
        os.environ["GGT_EXEC"] = exec_
        try:
            return A.window_abba_sums_dispatch(
                al, first, n, mask, n_pops, 0.3, mode, full).collect()
        finally:
            os.environ["GGT_EXEC"] = old or "tpu"

    d, h = run("tpu"), run("host")
    assert (np.isnan(d) == np.isnan(h)).all()
    np.testing.assert_allclose(h, d, rtol=0, atol=1e-9)


def test_cli_host_executor_matches_goldens(tmp_path):
    """The host executor meets the same golden standard as the device path
    (one 4-decimal rounding quantum — per-site terms are identical float64;
    only the window summation tree can differ by ulps)."""
    from .test_abba_windows import CONFIGS, G
    from .util import assert_csv_equal
    for golden, module, args in CONFIGS:
        out = tmp_path / golden
        run_cli(module, args + ["-o", str(out)],
                env_extra={"GGT_EXEC": "host"})
        assert_csv_equal(G / golden, out, tol=1.01e-4)
