"""geno -> PLINK .ped/.map/.fam converter.

Mirror of /root/reference/tools/genoToPlink.py: whole scaffolds are read
(nonOverlappingSitesWindows with windSites=inf, genoToPlink.py:37-40),
haplotypes interleaved per site into the PED allele columns
(splitSeq + zip, :50), MAP rows are "scaffold pos 0 pos" (:72).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..io import geno as geno_io
from ..samples import SampleData


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="genoToPlink")
    p.add_argument("-g", "--genoFile", action="store")
    p.add_argument("-f", "--genoFormat", action="store",
                   choices=["haplo", "diplo", "pairs", "alleles", "phased"],
                   default="phased")
    p.add_argument("--prefix", action="store")
    p.add_argument("--makeFAM", action="store_true")
    p.add_argument("--FAMprefix", action="store")
    p.add_argument("-s", "--samples", nargs="+", action="store")
    args = p.parse_args(argv)

    src = args.genoFile if args.genoFile else sys.stdin
    if not args.genoFile:
        assert args.prefix is not None, \
            "Please povide a prefix for the ouput files"
    fmt = "pairs" if args.genoFormat == "alleles" else args.genoFormat
    probe = geno_io.GenoReader(src, geno_format=fmt)
    names = args.samples if args.samples else list(probe.file_ind_names)
    ploidy = 1 if fmt == "haplo" else 2
    sd = SampleData(ind_names=names, ploidy={n: ploidy for n in names})
    reader = geno_io.rebind_reader(probe, sd)
    data = reader.read_all()
    sys.stderr.write(f"{len(data.scaffold_names)} scaffolds read into memory\n")

    alleles = data.alleles                      # [H, S] int8
    model = data.model
    row_of = dict(zip(model.sample_names, model.sample_rows))
    chars = np.array(["A", "C", "G", "T"])
    prefix = args.prefix if args.prefix else args.genoFile.rsplit(".", 1)[0]

    sys.stderr.write("Writing PED file...\n")
    with open(prefix + ".ped", "wt") as out_ped:
        for name in names:
            rows = row_of[name]
            # interleave haplotypes per site: hap1[s], hap2[s], hap1[s+1]...
            block = alleles[rows]               # [ploidy, S]
            inter = block.T.ravel()             # site-major
            seq = np.where(inter >= 0, chars[np.maximum(inter, 0)], "N")
            out_ped.write(" ".join(["0", name, "0 0 0 0 "]))
            out_ped.write(" ".join(seq) + "\n")

    sys.stderr.write("Writing MAP file...\n")
    with open(prefix + ".map", "wt") as out_map:
        for sid, pos in zip(data.scaffold_ids, data.positions):
            scaf = data.scaffold_names[int(sid)]
            out_map.write(f"{scaf} {pos} 0 {pos}\n")

    if args.makeFAM:
        sys.stderr.write("Writing FAM file...\n")
        with open(args.FAMprefix if args.FAMprefix else prefix + ".fam",
                  "wt") as out_fam:
            for name in names:
                out_fam.write(f"0 {name} 0 0 0 0\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
