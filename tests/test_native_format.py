"""The C window-CSV emitter must reproduce io/writers.fmt_float (numpy
scale-rint-unscale rounding + shortest repr) and fmt_int_or_nan exactly,
including the quirky cases; out-of-range values must refuse (caller falls
back to the Python loop)."""

import numpy as np
import pytest

from genomics_general_tpu.io import native
from genomics_general_tpu.io.writers import fmt_float, fmt_int_or_nan


def _format_rows(values, col_kind, round_to=4, mid=None, good=None):
    W, C = values.shape
    chunks = []
    ok = native.format_window_csv(
        [b"s1"], np.zeros(W, np.int32),
        np.arange(1, W + 1, dtype=np.int64) * 10,
        np.arange(1, W + 1, dtype=np.int64) * 10 + 9,
        np.full(W, 5.0) if mid is None else mid,
        np.full(W, 7, dtype=np.int64),
        values, np.asarray(col_kind, np.uint8), round_to,
        np.ones(W, bool), np.ones(W, bool) if good is None else good,
        chunks.append)
    return ok, b"".join(chunks).decode().splitlines()


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
def test_float_semantics_match_writers():
    rng = np.random.default_rng(3)
    tricky = [0.34625, 0.03125, -0.0000001, 0.00005, 1.0, 0.0, np.nan,
              123456.789, 0.99995, -0.5, 1e-9, 2.5, 3.5, 0.12344999999]
    vals = np.array([tricky + list(rng.uniform(-2, 2, 6))
                     for _ in range(50)])
    vals[vals > 1.9] = np.nan
    ok, lines = _format_rows(vals, [0] * vals.shape[1])
    assert ok and len(lines) == 50
    for w, line in enumerate(lines):
        cols = line.split(",")
        assert cols[0] == "s1"
        got = cols[5:]
        want = [fmt_float(v, 4) for v in vals[w]]
        assert got == want, (w, got, want)


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
def test_int_and_nan_columns():
    vals = np.array([[3.0, np.nan, -7.9], [0.0, 12.0, np.nan]])
    ok, lines = _format_rows(vals, [1, 1, 1])
    assert ok
    for w, line in enumerate(lines):
        got = line.split(",")[5:]
        want = [fmt_int_or_nan(v) for v in vals[w]]
        assert got == want


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
def test_failed_rows_and_mid_nan():
    vals = np.array([[0.5], [0.25]])
    good = np.array([True, False])
    ok, lines = _format_rows(vals, [0], good=good,
                             mid=np.array([4.0, np.nan]))
    assert ok
    assert lines[0].split(",")[5] == "0.5"
    assert lines[1].split(",")[3] == "nan"      # mid
    assert lines[1].split(",")[5] == "nan"      # failed window stat


@pytest.mark.skipif(native.get_lib() is None, reason="no native lib")
def test_out_of_range_refuses():
    vals = np.array([[0.5], [1e13]])
    ok, _ = _format_rows(vals, [0])
    assert not ok                                # caller must fall back
