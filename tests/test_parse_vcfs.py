"""Tests for parse_vcfs (multi-VCF positional merge).

The reference parseVCFs.py requires the external ``tabix`` binary (absent
in this environment), so: the single-file case is differentially tested
against reference-parseVCF goldens (union over one file == parseVCF with
--excludeDuplicates), and the multi-file merge is checked against an
independent in-test oracle built from the per-file goldens.
"""

import gzip
from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"


def _read_geno(path):
    rows = {}
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        for line in f:
            p = line.rstrip("\n").split("\t")
            rows[(p[0], int(p[1]))] = p[2:]
    return header[2:], rows


def test_single_file_union_matches_parse_vcf_dedup(tmp_path):
    ref = str(tmp_path / "ref.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", str(D / "sim1.vcf.gz"), "--excludeDuplicates", "-o", ref])
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcfs",
            ["-i", str(D / "sim1.vcf.gz"), "-M", "union", "-o", out])
    assert_text_equal(ref, out)


def test_two_file_union_oracle(tmp_path):
    a = str(tmp_path / "a.geno")
    b = str(tmp_path / "b.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", str(D / "sim1.vcf.gz"), "--excludeDuplicates", "-o", a])
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", str(D / "sim2.vcf.gz"), "--excludeDuplicates", "-o", b])
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcfs",
            ["-i", str(D / "sim1.vcf.gz"), "-i", str(D / "sim2.vcf.gz"),
             "-M", "union", "-o", out])

    names_a, rows_a = _read_geno(a)
    names_b, rows_b = _read_geno(b)
    miss_a = ["N/N"] * len(names_a)
    miss_b = ["N/N"] * len(names_b)
    keys = sorted(set(rows_a) | set(rows_b),
                  key=lambda k: (["chr1", "chr2"].index(k[0]), k[1]))
    want = ["#CHROM\tPOS\t" + "\t".join(names_a + names_b)]
    for k in keys:
        want.append("\t".join([k[0], str(k[1])] +
                              rows_a.get(k, miss_a) + rows_b.get(k, miss_b)))
    got = Path(out).read_text().rstrip("\n").split("\n")
    assert got == want


def test_two_file_intersect_oracle(tmp_path):
    a = str(tmp_path / "a.geno")
    b = str(tmp_path / "b.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", str(D / "sim1.vcf.gz"), "--excludeDuplicates", "-o", a])
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", str(D / "sim2.vcf.gz"), "--excludeDuplicates", "-o", b])
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcfs",
            ["-i", str(D / "sim1.vcf.gz"), "-i", str(D / "sim2.vcf.gz"),
             "-M", "intersect", "-o", out])
    names_a, rows_a = _read_geno(a)
    names_b, rows_b = _read_geno(b)
    keys = sorted(set(rows_a) & set(rows_b),
                  key=lambda k: (["chr1", "chr2"].index(k[0]), k[1]))
    got = Path(out).read_text().rstrip("\n").split("\n")
    assert len(got) == len(keys) + 1
    for line, k in zip(got[1:], keys):
        p = line.split("\t")
        assert (p[0], int(p[1])) == k
        assert p[2:] == rows_a[k] + rows_b[k]


def _write_adv_vcf(path, rng, chroms, n_sites=800, samples=("s1", "s2")):
    lines = ["##fileformat=VCFv4.2"]
    lines += [f"##contig=<ID={c},length=100000>" for c in chroms]
    lines += ['##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
              + "\t".join(samples)]
    for chrom in chroms:
        pos = 0
        for _ in range(n_sites):
            r = rng.random()
            if r < 0.08 and pos > 10:
                p = pos - rng.randint(1, 9)          # stale
            elif r < 0.16 and pos > 0:
                p = pos                               # duplicate
            else:
                pos += rng.randint(1, 25)
                p = pos
            q = rng.choice(["50", "10", "."])
            gts = "\t".join(rng.choice(["0/1", "1|1", "./.", "0/0"])
                            for _ in samples)
            lines.append(f"{chrom}\t{p}\t.\tA\tG\t{q}\tPASS\t.\tGT\t{gts}")
    Path(path).write_text("\n".join(lines) + "\n")


def test_multi_file_merge_fast_matches_serial(tmp_path):
    """The C multi-file merge (per-file converter threads + k-way positional
    merge) must be byte-identical to the serial Python walk for union and
    intersect, at any -t / chunk size, including files with asymmetric
    scaffold sets (parseVCFs.py:60-87 semantics)."""
    import os
    import random
    import subprocess
    import sys
    rng = random.Random(11)
    _write_adv_vcf(tmp_path / "f1.vcf", rng, ("c1", "c2", "c4"))
    _write_adv_vcf(tmp_path / "f2.vcf", rng, ("c2", "c3", "c4"),
                   samples=("t1",))
    _write_adv_vcf(tmp_path / "f3.vcf", rng, ("c1", "c4"),
                   samples=("u1", "u2", "u3"))
    fai = tmp_path / "g.fai"
    fai.write_text("c1\t100000\nc2\t100000\nc3\t100000\nc4\t15000\n")

    def run(out, method, env, extra):
        e = dict(os.environ)
        e.update(env)
        r = subprocess.run(
            [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcfs",
             "-i", str(tmp_path / "f1.vcf"), "-i", str(tmp_path / "f2.vcf"),
             "-i", str(tmp_path / "f3.vcf"), "-f", str(fai),
             "-M", method, "--minQual", "30", "-o", out, *extra],
            capture_output=True, env=e, cwd=Path(__file__).parent.parent)
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        return open(out, "rb").read()

    for method in ("union", "intersect"):
        base = run(str(tmp_path / "serial.geno"), method,
                   {"GGT_HOST_VCF": "0"}, [])
        assert base.count(b"\n") > (200 if method == "union" else 1)
        for name, env, extra in [
                ("t1", {}, ["-t", "1"]),
                ("t2", {}, ["-t", "2"]),
                ("t4c", {"GGT_VCF_CHUNK": "2048"}, ["-t", "4"])]:
            got = run(str(tmp_path / f"{name}.geno"), method, env, extra)
            assert got == base, (method, name)


def test_parallel_chunks_adversarial_boundaries(tmp_path):
    """Stale (backwards) and duplicate positions plus QUAL drops straddling
    forced-tiny chunk boundaries: -t N with 1-4 KB chunks must match -t 1
    and the Python path exactly (exercises the raw-tail state handoff and
    the writer-side stale-drop repair)."""
    import os
    import random
    import subprocess
    import sys
    rng = random.Random(3)
    lines = ["##fileformat=VCFv4.2",
             "##contig=<ID=c1,length=100000>",
             "##contig=<ID=c2,length=100000>",
             '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2"]
    for chrom in ("c1", "c2"):
        pos = 0
        for _ in range(1500):
            r = rng.random()
            if r < 0.1 and pos > 10:
                p = pos - rng.randint(1, 9)          # stale
            elif r < 0.2 and pos > 0:
                p = pos                               # duplicate
            else:
                pos += rng.randint(1, 20)
                p = pos
            q = rng.choice(["50", "10", "."])
            gt = rng.choice(["0/1", "1|1", "./.", "0/0"])
            lines.append(f"{chrom}\t{p}\t.\tA\tG\t{q}\tPASS\t.\tGT"
                         f"\t{gt}\t0|1")
    vcf = tmp_path / "adv.vcf"
    vcf.write_text("\n".join(lines) + "\n")

    def run(out, env, extra):
        e = dict(os.environ)
        e.update(env)
        r = subprocess.run(
            [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcfs",
             "-i", str(vcf), "--minQual", "30", "-o", out, *extra],
            capture_output=True, env=e,
            cwd=Path(__file__).parent.parent)
        assert r.returncode == 0, r.stderr.decode()[-2000:]
        return open(out, "rb").read()

    base = run(str(tmp_path / "t1.geno"), {}, ["-t", "1"])
    assert base
    for name, env, extra in [
            ("t4", {"GGT_VCF_CHUNK": "4096"}, ["-t", "4"]),
            ("t2", {"GGT_VCF_CHUNK": "1024"}, ["-t", "2"]),
            ("slow", {"GGT_HOST_VCF": "0"}, [])]:
        got = run(str(tmp_path / f"{name}.geno"), env, extra)
        assert got == base, name


def test_five_file_merge_disjoint_scaffolds(tmp_path):
    """5 files with heavily asymmetric scaffold sets (incl. a file with a
    single scaffold and varying sample counts): fast C merge == serial walk
    for union and intersect."""
    import os
    import random
    import subprocess
    import sys
    rng = random.Random(99)
    chrom_sets = [("c1", "c2", "c3"), ("c2", "c4"),
                  ("c1", "c3", "c4", "c5"), ("c5",),
                  ("c1", "c2", "c3", "c4", "c5")]
    files = []
    for i, cs in enumerate(chrom_sets):
        p = tmp_path / f"f{i}.vcf"
        _write_adv_vcf(p, rng, cs, n_sites=300,
                       samples=tuple(f"s{i}_{j}" for j in range(i + 1)))
        files.append(str(p))
    fai = tmp_path / "g.fai"
    fai.write_text("".join(f"c{k}\t100000\n" for k in range(1, 6)))

    def run(method, env_extra, out):
        e = dict(os.environ)
        e.update(env_extra)
        r = subprocess.run(
            [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcfs",
             *sum([["-i", f] for f in files], []),
             "-f", str(fai), "-M", method, "--minQual", "30",
             "-t", "2", "-o", out],
            capture_output=True, env=e, cwd=Path(__file__).parent.parent)
        assert r.returncode == 0, r.stderr.decode()[-1500:]
        return open(out, "rb").read()

    for method in ("union", "intersect"):
        fast = run(method, {}, str(tmp_path / f"fast_{method}.geno"))
        slow = run(method, {"GGT_HOST_VCF": "0"},
                   str(tmp_path / f"slow_{method}.geno"))
        assert fast == slow, method
    assert fast.count(b"\n") >= 1                  # intersect: header only
