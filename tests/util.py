"""Shared helpers for differential tests against reference goldens."""

from __future__ import annotations

import csv
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_cli(module: str, args: list[str]) -> None:
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root"}
    r = subprocess.run([sys.executable, "-m", module] + args,
                       capture_output=True, text=True, env=env)
    if r.returncode != 0:
        raise AssertionError(f"{module} failed:\n{r.stderr[-3000:]}")


def assert_csv_equal(ref_path, ours_path, by_name: bool = True):
    """Compare CSVs; by_name compares per-column values keyed on header name
    (reference column ORDER can depend on set iteration for het_/d_ columns)."""
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
                mismatches.append((i, c, r[c], o[c]))
    assert not mismatches, f"{len(mismatches)} mismatches; first 10: {mismatches[:10]}"


def assert_text_equal(ref_path, ours_path):
    ref = Path(ref_path).read_text()
    ours = Path(ours_path).read_text()
    assert ref == ours, "text outputs differ"
