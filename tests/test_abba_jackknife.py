"""abba_windows --jackknife: genome-wide D/fd/fdM +- SE by block jackknife.

Checks (a) host vs device path agreement on the jackknife table, (b) the
table equals an independent reconstruction from per-window ratio components
via the generic delete-one-block procedure (block.jackknife semantics,
jackknife.R:41-61, with FUN = ratio-of-sums), and (c) ratio_jackknife ==
block_jackknife on the same blocks (algebraic identity sanity).
"""

import numpy as np
import pytest

from genomics_general_tpu.stats import jackknife as J

from .util import REPO, run_cli

D = REPO / "tests" / "data"
POPS = ["--popsFile", str(D / "sim1.pops.txt"),
        "-P1", "pop1", "-P2", "pop2", "-P3", "pop3", "-O", "pop4"]
ARGS = ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
        "-w", "25000", "-s", "25000", "-m", "20", "--minData", "0.3", *POPS]
BS = "60000"


def _read_table(path):
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        rows = {}
        for line in f:
            parts = line.rstrip("\n").split("\t")
            rows[parts[0]] = dict(zip(header[1:], parts[1:]))
    return rows


def test_host_device_agree(tmp_path):
    outs = {}
    for name, env in (("dev", None), ("host", {"GGT_ABBA_HOST": "1"})):
        o = tmp_path / f"{name}.csv"
        jk = tmp_path / f"{name}.jk.tsv"
        run_cli("genomics_general_tpu.cli.abba_windows",
                ARGS + ["-o", str(o), "--jackknife", BS,
                        "--jackknifeFile", str(jk)],
                env_extra=env)
        outs[name] = _read_table(jk)
    assert set(outs["dev"]) == {"D", "fd", "fdM"}
    for stat in ("D", "fd", "fdM"):
        a, b = outs["dev"][stat], outs["host"][stat]
        assert a["n_blocks"] == b["n_blocks"]
        for col in ("overall", "jackknife_mean", "standard_error"):
            np.testing.assert_allclose(float(a[col]), float(b[col]),
                                       rtol=1e-8, atol=1e-12)


def test_matches_generic_block_jackknife(tmp_path):
    """The CLI table must equal block.jackknife (generic delete-one-block,
    jackknife.R:41-61) run on the per-window ratio components, which we
    reconstruct independently through the library host path."""
    o = tmp_path / "o.csv"
    jk = tmp_path / "jk.tsv"
    run_cli("genomics_general_tpu.cli.abba_windows",
            ARGS + ["-o", str(o), "--jackknife", BS,
                    "--jackknifeFile", str(jk)],
            env_extra={"GGT_ABBA_HOST": "1"})
    table = _read_table(jk)

    # independent reconstruction: read windows from the CSV, recompute the
    # per-window sums through stats.abbababa directly
    from genomics_general_tpu.io import geno as geno_io
    from genomics_general_tpu.samples import SampleData
    from genomics_general_tpu.stats import abbababa
    from genomics_general_tpu.kernels import counts as counts_k

    sd = SampleData.from_pop_args(
        population_args=[["pop1"], ["pop2"], ["pop3"], ["pop4"]],
        pops_file=str(D / "sim1.pops.txt"), geno_format="phased")
    data = geno_io.read_geno(str(D / "sim1.geno.gz"), sample_data=sd,
                             geno_format="phased")
    pop_rows = [data.model.pop_row_indices[p] for p in sd.pop_names]
    n_pops = [r.size for r in pop_rows]
    union = np.unique(np.concatenate(pop_rows))

    mids, chroms, comp = [], [], []
    with open(o) as f:
        header = f.readline().rstrip().split(",")
        for line in f:
            cells = dict(zip(header, line.rstrip().split(",")))
            lo, hi = int(cells["start"]), int(cells["end"])
            scaf = cells["scaffold"]
            sidx = data.scaffold_names.index(scaf)
            m = (data.scaffold_ids == sidx) & (data.positions >= lo) \
                & (data.positions <= hi)
            cp = [np.stack([(data.alleles[r][:, m] == b).sum(axis=0)
                            for b in range(4)], axis=1)
                  for r in pop_rows]
            cu = np.stack([(data.alleles[union][:, m] == b).sum(axis=0)
                           for b in range(4)], axis=1)
            res = abbababa.window_four_pop_panel(
                cp, cu, n_pops, 0.3, True, False, False, with_sums=True)
            assert res["sitesUsed"] >= 20     # CLI wrote only good windows
            mids.append(int(float(cells["mid"])))
            chroms.append(scaf)
            comp.append((res["_num_f4"], res["_den_D"], res["_den_fd"],
                         res["_den_fdm"]))
    comp = np.array(comp)
    indices = J.block_indices(int(BS), np.array(mids), np.array(chroms))
    assert len(indices) >= 3
    for col, stat in ((1, "D"), (2, "fd"), (3, "fdM")):
        num, den = comp[:, 0], comp[:, col]
        ref = J.block_jackknife(
            indices, lambda n, d: n.sum() / d.sum(), num, den)
        got = table[stat]
        np.testing.assert_allclose(float(got["overall"]),
                                   num.sum() / den.sum(), rtol=1e-9)
        for k, col_name in (("mean", "jackknife_mean"),
                            ("variance", "variance"),
                            ("standard_error", "standard_error")):
            np.testing.assert_allclose(float(got[col_name]), ref[k],
                                       rtol=1e-7, atol=1e-12)
        assert int(got["n_blocks"]) == len(indices)


def test_ratio_equals_generic():
    rng = np.random.default_rng(3)
    num = rng.normal(size=40)
    den = rng.uniform(1, 2, size=40)
    idx = [np.arange(i, min(i + 7, 40)) for i in range(0, 40, 7)]
    a = J.ratio_jackknife(np.array([num[i].sum() for i in idx]),
                          np.array([den[i].sum() for i in idx]))
    b = J.block_jackknife(idx, lambda n, d: n.sum() / d.sum(), num, den)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-10)
