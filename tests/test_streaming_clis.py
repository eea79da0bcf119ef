"""Bounded-memory streaming: every streamed CLI must produce identical
output when forced through many tiny chunks (GGT_CHUNK_BYTES), proving no
whole-genome state survives outside the rolling flush buffer."""

import pytest

from .util import REPO, run_cli

D = REPO / "tests" / "data"

POPS4 = ["-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
         "--popsFile", str(D / "sim1.pops.txt")]

CASES = [
    ("popgen", "genomics_general_tpu.cli.popgen_windows",
     lambda o: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                "-w", "50000", "-s", "25000", "-m", "100", *POPS4,
                "--analysis", "popDist", "popPairDist",
                "--writeFailedWindows", "-o", o + "o.csv"], ["o.csv"]),
    ("sfs", "genomics_general_tpu.cli.sfs",
     lambda o: ["-i", str(D / "sim1.geno.gz"), "--inputType", "genotypes",
                "--genoFormat", "phased", "-p", "pop1", "-p", "pop2",
                "--popsFile", str(D / "sim1.pops.txt"), "--doPairs",
                "--pref", o, "--suff", ".sfs"],
     ["pop1.sfs", "pop2.sfs", "pop1_pop2.sfs"]),
    ("dist_mat", "genomics_general_tpu.cli.dist_mat",
     lambda o: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                "-w", "50000", "-m", "50", "--outFormat", "phylip",
                "-o", o + "o.phy"], ["o.phy"]),
    ("dist_mat_cat", "genomics_general_tpu.cli.dist_mat",
     lambda o: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                "--windType", "cat", "--outFormat", "phylip",
                "--windowDataOutFile", o + "o.data.tsv",
                "-o", o + "o.phy"], ["o.phy", "o.data.tsv"]),
    ("dist_paint", "genomics_general_tpu.cli.dist_paint",
     lambda o: ["-g", str(D / "sim_paint.geno.gz"),
                "-w", "50000", "-s", "25000", "-m", "50",
                "-p", "pop1", "-p", "pop2", "-p", "pop3",
                "--popsFile", str(D / "sim_paint.pops.txt"),
                "--writeFailedWindows", "-o", o + "o.tsv"], ["o.tsv"]),
    ("count_patterns", "genomics_general_tpu.cli.count_genotype_patterns",
     lambda o: ["-i", str(D / "sim1.geno.gz"), "-f", "phased",
                "-s", "pop1_ind1,pop2_ind1,pop3_ind1,pop4_ind1",
                "-o", o + "o.csv"], ["o.csv"]),
    ("eigenstrat", "genomics_general_tpu.cli.geno_to_eigenstrat",
     lambda o: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                "--genoOutFile", o + "o.geno", "--snpOutFile", o + "o.snp",
                "--indOutFile", o + "o.ind"], ["o.geno", "o.snp", "o.ind"]),
    ("plink", "genomics_general_tpu.cli.geno_to_plink",
     lambda o: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                "--prefix", o + "o", "--makeFAM"],
     ["o.ped", "o.map", "o.fam"]),
    ("phyml_nj", "genomics_general_tpu.cli.phyml_sliding_windows",
     lambda o: ["-g", str(D / "sim1.geno.gz"), "--windType", "coordinate",
                "-w", "100000", "-M", "100", "--phyml", "builtin-nj",
                "-p", o + "o"], ["o.data.tsv", "o.trees.gz"]),
    ("raxml_nj", "genomics_general_tpu.cli.raxml_sliding_windows",
     lambda o: ["-g", str(D / "sim1.geno.gz"), "--windType", "coordinate",
                "-w", "100000", "-M", "100", "--raxml", "builtin-nj",
                "-p", o + "o"], ["o.data.tsv", "o.trees.gz"]),
]


@pytest.mark.parametrize("name,module,make_args,out_names",
                         CASES, ids=[c[0] for c in CASES])
def test_small_chunks_output_unchanged(name, module, make_args, out_names,
                                       tmp_path):
    def run(tag, chunk_bytes):
        prefix = str(tmp_path / tag)
        run_cli(module, make_args(prefix),
                env_extra={"GGT_CHUNK_BYTES": str(chunk_bytes)})
        import gzip
        out = {}
        for n in out_names:
            p = tmp_path / (tag + n)
            if n.endswith(".gz"):       # gzip headers embed mtime
                out[n] = gzip.open(p, "rb").read()
            else:
                out[n] = p.read_bytes()
        return out

    big = run("big_", 16 << 20)
    small = run("small_", 30_000)
    for n in out_names:
        assert big[n] == small[n], n
