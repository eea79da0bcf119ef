"""TPU-native popgenWindows: sliding-window pi / dxy / Fst (+ Tajima panel,
per-individual het & distances, H1/H12/H2).

CLI mirrors /root/reference/popgenWindows.py (flags :170-210, CSV assembly
:319-354, per-window wrapper :28-75).  The pipeline replaces the reference's
process pool with: vectorized host parse -> static window plan -> batched MXU
pair-count / allele-count kernels -> float64 host finalize -> ordered CSV.
"""

from __future__ import annotations

import argparse
import itertools
import sys

import numpy as np

from .. import windows as W
from ..io import geno as geno_io
from ..io import writers
from ..kernels import counts as counts_k
from ..kernels import pairdist as pair_k
from ..stats import popgen
from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="popgenWindows")
    common.add_window_args(p)
    p.add_argument("--minData", type=float, action="store", default=0.01)
    common.add_pop_args(p)
    p.add_argument("--samples", action="store", metavar="sample names")
    common.add_ploidy_args(p)
    p.add_argument("--analysis", action="store", nargs="+",
                   choices=("popFreq", "popDist", "popPairDist", "indPairDist",
                            "indHet", "hapStats"),
                   default=("popDist", "popPairDist"))
    p.add_argument("--hapDist", type=float, default=0)
    p.add_argument("--roundTo", type=int, default=4)
    common.add_io_args(p)
    p.add_argument("--addWindowID", action="store_true")
    p.add_argument("--writeFailedWindows", action="store_true")
    return p


def main(argv=None) -> int:
    from ..jaxconfig import enable_compilation_cache
    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    wind = common.resolve_window_args(args)
    analysis = args.analysis

    extra = args.samples.split(",") if args.samples else []
    sd = common.sample_data_from_args(args, extra_inds=extra)
    if not sd.ind_names:
        # no pops/samples given: take all from the file header
        with geno_io.open_maybe_gz(args.genoFile, "rb") as gf:
            header = gf.readline()
        all_inds = [c.decode() for c in header.split()[2:]]
        sd.ind_names = all_inds
        for ind in all_inds:
            sd.ploidy.setdefault(ind, 1 if args.genoFormat == "haplo" else 2)
        if any(a in analysis for a in ("popFreq", "popDist", "popPairDist", "hapStats")) \
                and not sd.pop_names:
            sd.pop_names = ["all"]
            sd.pop_inds = {"all": all_inds}
    pop_names = sd.pop_names
    all_inds = sd.ind_names

    # ---- read + filter
    reader = geno_io.GenoReader(args.genoFile if args.genoFile else sys.stdin,
                                sample_data=sd, geno_format=args.genoFormat,
                                header=args.header)
    data = reader.read_all()
    keep = W.filter_scaffolds(data.scaffold_ids, data.scaffold_names,
                              include=common.read_scaffold_list(args.include),
                              exclude=common.read_scaffold_list(args.exclude))
    if not keep.all():
        data.alleles = data.alleles[:, keep]
        data.positions = data.positions[keep]
        data.scaffold_ids = data.scaffold_ids[keep]

    plan = common.build_plan(wind, data.scaffold_ids, data.positions,
                             data.scaffold_names)
    model = data.model
    n_windows = plan.n_windows
    min_sites = wind["minSites"]
    sites = plan.n_sites
    good = sites >= min_sites
    mid = plan.mid(data.positions)

    # ---- stats column list (popgenWindows.py:326-354)
    stats: list[str] = []
    if "popFreq" in analysis:
        for prefix in ("l_", "S_", "thetaPi_", "thetaW_", "TajD_"):
            stats += [prefix + n for n in pop_names]
    if "popDist" in analysis:
        stats += ["pi_" + n for n in pop_names]
    if "popPairDist" in analysis:
        stats += ["dxy_" + x + "_" + y for x, y in itertools.combinations(pop_names, 2)]
        stats += ["Fst_" + x + "_" + y for x, y in itertools.combinations(pop_names, 2)]
    if "indPairDist" in analysis:
        stats += ["_".join(["d", i, j])
                  for i, j in itertools.combinations_with_replacement(sorted(all_inds), 2)]
    if "indHet" in analysis:
        stats += ["het_" + n for n in all_inds]
    if "hapStats" in analysis:
        for prefix in ("H1_", "H12_", "H2_"):
            stats += [prefix + n for n in pop_names]
    int_stats = {s for s in stats if s.startswith(("l_",))}

    # ---- device + finalize
    values: dict[str, np.ndarray] = {}

    need_dist = any(a in analysis for a in
                    ("popDist", "popPairDist", "indPairDist", "indHet", "hapStats"))
    if need_dist and n_windows:
        from ..kernels.transfer import device_alleles
        alleles_dev = device_alleles(data.alleles)
        mism, shar = pair_k.window_pair_counts(
            alleles_dev, plan.first.astype(np.int32), sites.astype(np.int32))
        ctx = popgen.DistStatsContext(mism, shar)
        # analysis order matters: the reference mutates the cached matrix
        # (popgenWindows.py:51-64)
        if "popDist" in analysis or "popPairDist" in analysis:
            values.update(popgen.group_dist_stats(
                ctx, model.row_group, do_pairs="popPairDist" in analysis,
                min_sites=min_sites, min_data=args.minData))
        if "indPairDist" in analysis:
            pd = popgen.ind_pair_dists(ctx, model.sample_names, model.sample_rows)
            for i, j in itertools.combinations_with_replacement(
                    sorted(pd.keys()), 2):
                values["_".join(["d", i, j])] = pd[i][j]
        if "indHet" in analysis:
            het = popgen.sample_het(ctx, model.sample_names, model.sample_rows)
            for key, v in het.items():
                values["het_" + key] = v
        if "hapStats" in analysis:
            values.update(popgen.h12_stats(ctx, model.row_group, args.hapDist))

    if "popFreq" in analysis and n_windows:
        complete = (data.alleles >= 0).all(axis=0)
        group_counts = {}
        group_sizes = {}
        groups_arr = np.array(["" if g is None else g for g in model.row_group])
        for g in np.unique(groups_arr):
            rows = np.flatnonzero(groups_arr == g)
            mask = np.zeros((1, model.n_rows), dtype=np.float32)
            mask[0, rows] = 1.0
            c = counts_k.site_pop_counts_chunked(data.alleles, mask)[:, 0, :]
            group_counts[g] = c
            group_sizes[g] = rows.size
        values.update(popgen.group_freq_stats(
            group_counts, group_sizes, complete,
            zip(plan.first, plan.last)))

    # ---- write CSV
    out = writers.open_out(args.outFile)
    head = "windowID,scaffold,start,end,mid,sites," if args.addWindowID \
        else "scaffold,start,end,mid,sites,"
    out.write(head + ",".join(stats) + "\n")

    rt = args.roundTo
    for w in range(n_windows):
        is_good = bool(good[w])
        if not (is_good or args.writeFailedWindows):
            continue
        row = []
        if args.addWindowID:
            row.append(str(plan.ids[w]))
        row.append(data.scaffold_names[plan.scaffold_id[w]]
                   if plan.scaffold_id[w] >= 0 else "None")
        row.append(str(int(plan.start[w])))
        row.append(str(int(plan.end[w])))
        row.append(writers.fmt_int_or_nan(mid[w]))
        row.append(str(int(sites[w])))
        for s in stats:
            if not is_good:
                row.append("nan")
            elif s in int_stats:
                row.append(writers.fmt_int_or_nan(values[s][w]))
            elif s.startswith("S_"):
                v = values[s][w]
                row.append(writers.fmt_int_or_nan(v) if v == v else "nan")
            else:
                row.append(writers.fmt_float(values[s][w], rt))
        out.write(",".join(row) + "\n")
    if args.outFile:
        out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
