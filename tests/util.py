"""Shared helpers for differential tests against reference goldens."""

from __future__ import annotations

import csv
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_cli(module: str, args: list[str], env_extra: dict | None = None) -> None:
    import os
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root",
           # keep golden runs on the device (jit) executor by default; the
           # host pairwise executor has dedicated equality tests
           "GGT_EXEC": os.environ.get("GGT_EXEC", "tpu")}
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([sys.executable, "-m", module] + args,
                       capture_output=True, text=True, env=env)
    if r.returncode != 0:
        raise AssertionError(f"{module} failed:\n{r.stderr[-3000:]}")


def assert_csv_equal(ref_path, ours_path, by_name: bool = True,
                     tol: float = 0.0):
    """Compare CSVs; by_name compares per-column values keyed on header name
    (reference column ORDER can depend on set iteration for het_/d_ columns).

    tol > 0 allows a per-value absolute difference for float cells — used
    for device-reduction paths whose float64 summation *tree* differs from
    numpy's pairwise order (values equal to << 1 ulp of the sum; only the
    4-decimal rounding step can flip, so tol is one rounding quantum)."""
    with open(ref_path) as f:
        ref = list(csv.DictReader(f))
    with open(ours_path) as f:
        ours = list(csv.DictReader(f))
    assert len(ref) == len(ours), f"row count {len(ref)} != {len(ours)}"
    if ref:
        assert set(ref[0].keys()) == set(ours[0].keys()), (
            sorted(set(ref[0]) ^ set(ours[0]))[:10])
    mismatches = []
    for i, (r, o) in enumerate(zip(ref, ours)):
        for c in r:
            if r[c] != o[c]:
                if tol:
                    try:
                        if abs(float(r[c]) - float(o[c])) <= tol:
                            continue
                    except ValueError:
                        pass
                mismatches.append((i, c, r[c], o[c]))
    assert not mismatches, f"{len(mismatches)} mismatches; first 10: {mismatches[:10]}"


def assert_text_equal(ref_path, ours_path):
    ref = Path(ref_path).read_text()
    ours = Path(ours_path).read_text()
    assert ref == ours, "text outputs differ"
