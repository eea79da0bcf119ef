"""Native tabix (.tbi) indexing + BGZF virtual-offset region access.

The reference leans on the external ``tabix`` binary for region random
access (parseVCFs.py:27-35, vcfChromTransfer.py:17-26,
extractCDSAlignments.py:12-20); io/tabix.py is the host-side equivalent.
A region query must return exactly the full-scan answer while reading a
small fraction of the file's bytes."""

import random
from pathlib import Path

import pytest

from genomics_general_tpu.io import tabix as T


@pytest.fixture(scope="module")
def vcf_fixture(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tabix")
    rng = random.Random(5)
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\ts2"]
    recs = []
    for chrom in ("c1", "c2", "c3"):
        pos = 0
        for _ in range(40000):
            pos += rng.randint(1, 40)
            ref = rng.choice(["A", "C", "ACGT"])       # some spans > 1
            ln = f"{chrom}\t{pos}\t.\t{ref}\tG\t50\tPASS\t.\tGT\t0/1\t1/1"
            lines.append(ln)
            recs.append((chrom, pos, ref))
    raw = tmp / "x.vcf"
    raw.write_text("\n".join(lines) + "\n")
    bgz = tmp / "x.vcf.bgz"
    T.bgzip_file(str(raw), str(bgz))
    T.build_index(str(bgz), preset="vcf")
    return bgz, recs


def _oracle(recs, chrom, start, end):
    return [(c, p) for c, p, ref in recs
            if c == chrom and p <= end and p + len(ref) - 1 >= start]


@pytest.mark.parametrize("chrom,start,end", [
    ("c1", 1, 500), ("c2", 100_000, 140_000), ("c3", 1, 10_000_000),
    ("c1", 999_999_000, 999_999_999), ("cX", 1, 100),
    ("c2", 1, 1), ("c3", 700_000, 700_500)])
def test_region_matches_full_scan(vcf_fixture, chrom, start, end):
    bgz, recs = vcf_fixture
    got = [(ln.split(b"\t")[0].decode(), int(ln.split(b"\t")[1]))
           for ln in T.region_lines(str(bgz), chrom, start, end)]
    assert got == _oracle(recs, chrom, start, end)


def test_small_region_reads_few_bytes(vcf_fixture):
    bgz, recs = vcf_fixture
    size = Path(bgz).stat().st_size
    rd = T.BGZFReader(str(bgz))
    got = list(T.region_lines(str(bgz), "c2", 200_000, 201_000, reader=rd))
    want = _oracle(recs, "c2", 200_000, 201_000)
    assert len(got) == len(want) and want
    assert rd.bytes_read < 0.05 * size, \
        f"read {rd.bytes_read} of {size} bytes for a 1 kb region"
    rd.close()


def test_geno_preset(tmp_path):
    lines = ["#CHROM\tPOS\ts1\ts2"]
    recs = []
    for chrom in ("sA", "sB"):
        for p in range(10, 50000, 7):
            lines.append(f"{chrom}\t{p}\tA/A\tG|T")
            recs.append((chrom, p))
    raw = tmp_path / "g.geno"
    raw.write_text("\n".join(lines) + "\n")
    bgz = tmp_path / "g.geno.bgz"
    T.bgzip_file(str(raw), str(bgz))
    T.build_index(str(bgz), preset="geno")
    got = [int(ln.split(b"\t")[1])
           for ln in T.region_lines(str(bgz), "sB", 30000, 30100)]
    assert got == [p for c, p in recs if c == "sB" and 30000 <= p <= 30100]
    assert list(T.region_lines(str(bgz), "sA", 60000, 70000)) == []


def test_tabix_index_cli(tmp_path):
    """bgzip + index via the CLI, then a region query through the reader."""
    from .util import run_cli
    lines = ["#CHROM\tPOS\ts1"]
    for p in range(5, 30000, 11):
        lines.append(f"sc\t{p}\tA/A")
    raw = tmp_path / "x.geno"
    raw.write_text("\n".join(lines) + "\n")
    bgz = tmp_path / "x.geno.bgz"
    run_cli("genomics_general_tpu.cli.tabix_index",
            ["bgzip", str(raw), "-o", str(bgz)])
    run_cli("genomics_general_tpu.cli.tabix_index",
            ["index", str(bgz), "--preset", "geno"])
    assert (tmp_path / "x.geno.bgz.tbi").exists()
    got = [int(ln.split(b"\t")[1])
           for ln in T.region_lines(str(bgz), "sc", 1000, 1100)]
    assert got == [p for p in range(5, 30000, 11) if 1000 <= p <= 1100]


def test_region_fuzz(vcf_fixture):
    """200 random regions across sizes/edges vs the full-scan oracle."""
    bgz, recs = vcf_fixture
    rng = random.Random(17)
    idx = T.TabixIndex(str(bgz) + ".tbi")
    rd = T.BGZFReader(str(bgz))
    max_pos = max(p for _, p, _ in recs)
    for _ in range(200):
        chrom = rng.choice(["c1", "c2", "c3", "nope"])
        start = rng.randint(1, max_pos + 1000)
        end = start + rng.choice([0, 1, 50, 1000, 50000, 10**7])
        got = [(ln.split(b"\t")[0].decode(), int(ln.split(b"\t")[1]))
               for ln in T.region_lines(str(bgz), chrom, start, end,
                                        index=idx, reader=rd)]
        assert got == _oracle(recs, chrom, start, end), (chrom, start, end)
    rd.close()
