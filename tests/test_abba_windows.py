"""Differential tests: ABBABABAwindows / fourPopWindows vs reference goldens.

Each config runs twice:

* device path (default, kernels/abba.py fused window reduction) — compared
  at one 4-decimal rounding quantum of tolerance, because its float64
  summation tree differs from numpy's pairwise order (values agree to
  << 1 ulp of the sum; only the final rounding step can flip),
* host path (GGT_ABBA_HOST=1, stats/abbababa.py) — byte-identical to the
  reference goldens.
"""

import pytest

from .util import REPO, assert_csv_equal, run_cli

D = REPO / "tests" / "data"
G = REPO / "tests" / "golden"
POPS = ["--popsFile", str(D / "sim1.pops.txt"),
        "-P1", "pop1", "-P2", "pop2", "-P3", "pop3", "-O", "pop4"]

# (golden, module, args)
CONFIGS = [
    ("abba_coord.csv", "genomics_general_tpu.cli.abba_windows",
     ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
      "-w", "50000", "-s", "25000", "-m", "50", "--minData", "0.3",
      *POPS, "--writeFailedWindows"]),
    ("abba_sites.csv", "genomics_general_tpu.cli.abba_windows",
     ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
      "--windType", "sites", "-w", "100", "-m", "20", *POPS]),
    ("fourpop_coord.csv", "genomics_general_tpu.cli.four_pop_windows",
     ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
      "-w", "50000", "-s", "50000", "-m", "50", "--minData", "0.3",
      *POPS, "--writeFailedWindows"]),
]


@pytest.mark.golden
@pytest.mark.parametrize("golden,module,args", CONFIGS,
                         ids=[c[0].split(".")[0] for c in CONFIGS])
def test_device_path_tolerance(golden, module, args, tmp_path):
    out = tmp_path / "o.csv"
    run_cli(module, args + ["-o", str(out)])
    assert_csv_equal(G / golden, out, tol=1.01e-4)


@pytest.mark.golden
@pytest.mark.parametrize("golden,module,args", CONFIGS,
                         ids=[c[0].split(".")[0] for c in CONFIGS])
def test_host_path_byte_exact(golden, module, args, tmp_path):
    out = tmp_path / "o.csv"
    run_cli(module, args + ["-o", str(out)],
            env_extra={"GGT_ABBA_HOST": "1"})
    assert_csv_equal(G / golden, out)
