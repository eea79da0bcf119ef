"""Generate deterministic synthetic .geno fixtures (and population files).

The simulated data intentionally exercises the reference's edge cases:
multiple scaffolds, a site gap large enough to produce empty coordinate
windows, ~7% missing genotypes, occasional whole-missing sites, tri-allelic
sites, and a haploid individual.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
DATA = HERE / "data"


def simulate_geno(path: Path, n_pops=4, inds_per_pop=5, seed=42,
                  scaffolds=(("scaf1", 300_000), ("scaf2", 140_000)),
                  site_density=0.02, missing=0.07, haploid_ind=None,
                  geno_format="phased"):
    rng = np.random.default_rng(seed)
    pops = [f"pop{i+1}" for i in range(n_pops)]
    inds = [f"{p}_ind{j+1}" for p in pops for j in range(inds_per_pop)]
    n_ind = len(inds)

    lines = []
    header = "#CHROM\tPOS\t" + "\t".join(inds)
    lines.append(header)

    pops_rows = []
    for p, ind in zip([p for p in pops for _ in range(inds_per_pop)], inds):
        pops_rows.append(f"{ind}\t{p}")

    for scaf, length in scaffolds:
        n_sites = int(length * site_density)
        pos = np.sort(rng.choice(np.arange(1, length + 1), size=n_sites,
                                 replace=False))
        # carve a gap to force empty coordinate windows
        gap_lo, gap_hi = int(length * 0.55), int(length * 0.75)
        pos = pos[(pos < gap_lo) | (pos > gap_hi)]
        for p_ in pos:
            # ancestral/derived allele frequencies per pop with drift
            anc, der = rng.choice(4, size=2, replace=False)
            base_f = rng.beta(0.4, 0.4)
            gts = []
            for k in range(n_ind):
                popk = k // inds_per_pop
                f = np.clip(base_f + rng.normal(0, 0.18 + 0.1 * popk), 0, 1)
                ploidy = 1 if inds[k] == haploid_ind else 2
                alleles = np.where(rng.random(ploidy) < f, der, anc)
                # occasional third allele
                if rng.random() < 0.01:
                    alleles[0] = rng.integers(0, 4)
                codes = ["ACGT"[a] for a in alleles]
                if rng.random() < missing:
                    codes = ["N"] * ploidy
                if geno_format == "phased":
                    gts.append("|".join(codes))
                elif geno_format == "diplo":
                    pair = "".join(sorted(codes))
                    dip = {"AA": "A", "CC": "C", "GG": "G", "TT": "T",
                           "GT": "K", "AC": "M", "NN": "N", "CG": "S",
                           "AG": "R", "AT": "W", "CT": "Y"}
                    gts.append(dip.get(pair, "N"))
                elif geno_format == "haplo":
                    gts.append(codes[0])
                else:
                    gts.append("".join(codes))
            lines.append(f"{scaf}\t{p_}\t" + "\t".join(gts))

    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as f:
        f.write("\n".join(lines) + "\n")
    (path.parent / (path.name.split(".")[0] + ".pops.txt")).write_text(
        "\n".join(pops_rows) + "\n")
    return inds, pops


def simulate_vcf(path: Path, n_samples=6, seed=19,
                 scaffolds=(("chr1", 100_000), ("chr2", 60_000)),
                 n_sites_per_scaf=400):
    """Synthetic VCF exercising parseVCF edge cases: SNPs, indels,
    multiallelic sites, monomorphic sites (ALT="."), missing genotypes,
    duplicated positions, mixed phasing, per-sample DP/GQ fields."""
    rng = np.random.default_rng(seed)
    samples = [f"s{i+1}" for i in range(n_samples)]
    bases = "ACGT"
    lines = ["##fileformat=VCFv4.2"]
    for scaf, length in scaffolds:
        lines.append(f"##contig=<ID={scaf},length={length}>")
    lines.append('##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">')
    lines.append('##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">')
    lines.append('##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="GQ">')
    lines.append("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" +
                 "\t".join(samples))
    for scaf, length in scaffolds:
        pos = np.sort(rng.choice(np.arange(1, length + 1),
                                 size=n_sites_per_scaf, replace=False))
        for i, p in enumerate(pos):
            ref = bases[rng.integers(0, 4)]
            kind = rng.random()
            if kind < 0.05:          # monomorphic
                alt = ["."]
            elif kind < 0.12:        # indel: insertion or deletion
                if rng.random() < 0.5:
                    ref = ref + "".join(bases[b] for b in rng.integers(0, 4, 2))
                    alt = [ref[0]]
                else:
                    alt = [ref + bases[rng.integers(0, 4)]]
            elif kind < 0.2:         # multiallelic SNP
                others = [b for b in bases if b != ref]
                alt = list(rng.choice(others, size=2, replace=False))
            else:                    # biallelic SNP
                alt = [rng.choice([b for b in bases if b != ref])]
            n_alt = 0 if alt == ["."] else len(alt)
            qual = round(float(rng.uniform(3, 900)), 1)
            cols = [scaf, str(p), ".", ref, ",".join(alt), str(qual),
                    "PASS", ".", "GT:DP:GQ"]
            for _ in samples:
                if rng.random() < 0.06:
                    gt = "./."
                else:
                    a = rng.integers(0, n_alt + 1, 2)
                    sep = "|" if rng.random() < 0.5 else "/"
                    gt = f"{a[0]}{sep}{a[1]}"
                dp = rng.integers(0, 60)
                gq = rng.integers(0, 99)
                cols.append(f"{gt}:{dp}:{gq}")
            lines.append("\t".join(cols))
            # occasional duplicated position (same POS, new alleles)
            if rng.random() < 0.02:
                dup = cols[:]
                dup[4] = rng.choice([b for b in bases if b != ref])
                lines.append("\t".join(dup))
    data = ("\n".join(lines) + "\n").encode()
    if str(path).endswith(".gz"):
        # multi-member gzip (~4 MB/member) — the shape of real-world
        # bgzip'd VCFs: readable by any gzip consumer, and lets the native
        # reader decompress members one-shot (libdeflate) instead of
        # streaming one giant member
        step = 4 << 20
        with open(path, "wb") as f:
            for i in range(0, len(data), step):
                f.write(gzip.compress(data[i:i + step],
                                      compresslevel=4, mtime=0))
    else:
        with open(path, "wb") as f:
            f.write(data)
    return samples


def simulate_ref_fasta(path: Path, seed=51,
                       scaffolds=(("scaf1", 300_000), ("scaf2", 140_000))):
    """Reference fasta (+.fai) covering the simulated scaffolds."""
    rng = np.random.default_rng(seed)
    fai = []
    with gzip.open(path, "wt") if str(path).endswith(".gz") else open(path, "wt") as f:
        offset = 0
        for scaf, length in scaffolds:
            f.write(f">{scaf}\n")
            offset += len(scaf) + 2
            seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, length)])
            for i in range(0, length, 60):
                f.write(seq[i:i + 60] + "\n")
            n_lines = -(-length // 60)
            fai.append(f"{scaf}\t{length}\t{offset}\t60\t61")
            offset += length + n_lines
    Path(str(path) + ".fai").write_text("\n".join(fai) + "\n")


def main():
    DATA.mkdir(exist_ok=True)
    simulate_geno(DATA / "sim1.geno.gz", seed=42)
    simulate_geno(DATA / "sim_hap.geno.gz", seed=7, haploid_ind="pop1_ind1")
    simulate_geno(DATA / "sim_diplo.geno.gz", seed=13, geno_format="diplo")
    # predefined window coordinates for sim1
    wc = []
    for a in range(1, 300_000, 60_000):
        wc.append(f"scaf1\t{a}\t{a + 49_999}\twin_s1_{a}")
    for a in range(10_000, 140_000, 40_000):
        wc.append(f"scaf2\t{a}\t{a + 39_999}\twin_s2_{a}")
    (DATA / "sim1.windCoords.txt").write_text("\n".join(wc) + "\n")
    simulate_vcf(DATA / "sim1.vcf.gz", seed=19)
    simulate_ref_fasta(DATA / "sim_ref.fa")
    print("fixtures written to", DATA)


if __name__ == "__main__":
    main()
