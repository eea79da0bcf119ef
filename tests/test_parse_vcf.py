"""Differential tests: parse_vcf CLI vs reference parseVCF.py goldens."""

from pathlib import Path

from .util import assert_text_equal, run_cli

D = Path(__file__).parent / "data"
G = Path(__file__).parent / "golden"
VCF = str(D / "sim1.vcf.gz")


def test_vcf_basic(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf", ["-i", VCF, "-o", out])
    assert_text_equal(G / "vcf_basic.geno", out)


def test_vcf_skip_indels_min_qual(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", VCF, "--skipIndels", "--minQual", "30", "-o", out])
    assert_text_equal(G / "vcf_snp_qual.geno", out)


def test_vcf_gtf_filters(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", VCF, "--gtf", "flag=DP", "min=5", "max=50",
             "--gtf", "flag=GQ", "min=30", "gtTypes=Het", "-o", out])
    assert_text_equal(G / "vcf_gtf.geno", out)


def test_vcf_field_extraction(tmp_path):
    out = str(tmp_path / "o.tsv")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", VCF, "--field", "DP", "-o", out])
    assert_text_equal(G / "vcf_field_dp.tsv", out)


def test_vcf_dedup_reftrack_samples(tmp_path):
    out = str(tmp_path / "o.geno")
    run_cli("genomics_general_tpu.cli.parse_vcf",
            ["-i", VCF, "--excludeDuplicates", "--addRefTrack",
             "-s", "s1,s3,s5", "-o", out])
    assert_text_equal(G / "vcf_dedup_ref.geno", out)


def _mkvcf(data_lines, n_samples=2):
    head = ["##fileformat=VCFv4.2",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"s{i}" for i in range(n_samples))]
    return "\n".join(head + data_lines) + "\n"


def _run_both(tmp_path, vcf_text, args=(), env_extra=None):
    """Run the CLI with the C fast path and with GGT_HOST_VCF=0; return
    (fast_bytes, slow_bytes, fast_stderr)."""
    import os
    import subprocess
    import sys
    vcf = tmp_path / "in.vcf"
    vcf.write_text(vcf_text)
    fast, slow = tmp_path / "fast.geno", tmp_path / "slow.geno"
    base = [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcf",
            "-i", str(vcf), *args]
    env = dict(os.environ, **(env_extra or {}))
    r1 = subprocess.run(base + ["-o", str(fast)], capture_output=True,
                        cwd=Path(__file__).parent.parent, env=env)
    assert r1.returncode == 0, r1.stderr.decode()[-2000:]
    r2 = subprocess.run(base + ["-o", str(slow)], capture_output=True,
                        cwd=Path(__file__).parent.parent,
                        env=dict(env, GGT_HOST_VCF="0"))
    assert r2.returncode == 0, r2.stderr.decode()[-2000:]
    return fast.read_bytes(), slow.read_bytes(), r1.stderr.decode()


def test_vcf_leading_zero_pos_not_duplicate(tmp_path):
    """The reference compares duplicate POS as TEXT (parseVCF.py
    parseVcfSites): '0100' after '100' is kept; a second '0100' is dropped."""
    lines = ["chr1\t100\t.\tA\tT\t99\tPASS\t.\tGT\t0/1\t1/1",
             "chr1\t0100\t.\tA\tC\t99\tPASS\t.\tGT\t0/0\t0/1",
             "chr1\t0100\t.\tA\tG\t99\tPASS\t.\tGT\t0/1\t0/1",
             "chr1\t200\t.\tG\tC\t99\tPASS\t.\tGT\t0/0\t1/1"]
    fast, slow, _ = _run_both(tmp_path, _mkvcf(lines),
                              args=["--excludeDuplicates"])
    assert fast == slow
    assert len(fast.decode().strip().split("\n")) == 1 + 3   # header + 3 rows
    # same with forced tiny chunks + threads: the cross-chunk raw-tail carry
    # must preserve the non-canonical POS text
    fast2, slow2, _ = _run_both(tmp_path, _mkvcf(lines),
                                args=["--excludeDuplicates", "-t", "2"],
                                env_extra={"GGT_VCF_CHUNK": "48"})
    assert fast2 == slow == fast2


def test_vcf_huge_line_grows_output_buffer(tmp_path):
    """A single line whose worst-case output exceeds the initial C output
    buffer must grow the buffer, not spin forever (ret -5, consumed 0)."""
    n = 200
    alt = "T" * 3000
    gts = "\t".join(["1/1"] * n)
    lines = [f"chr1\t{p}\t.\tA\t{alt}\t99\tPASS\t.\tGT\t{gts}"
             for p in (100, 200)]
    fast, slow, _ = _run_both(tmp_path, _mkvcf(lines, n_samples=n))
    assert fast == slow
    assert len(fast) > 2 * n * 3000      # both giant rows present


def test_vcf_break_table_overflow_resumes(tmp_path):
    """More than 65536 scaffold runs in one chunk: the C converter returns
    -1 mid-chunk; the driver must flush and resume, not abort."""
    lines = [f"sc{i % 2}\t{i + 1}\t.\tA\tT\t99\tPASS\t.\tGT\t0/1\t1/1"
             for i in range(70000)]
    fast, slow, _ = _run_both(tmp_path, _mkvcf(lines))
    assert fast == slow
    assert len(fast.decode().strip().split("\n")) == 1 + 70000


def test_vcf_fallback_notice(tmp_path):
    """Declining the C fast path must say so on stderr (a silent >10x perf
    cliff costs users real hours)."""
    import subprocess
    import sys
    vcf = tmp_path / "in.vcf"
    vcf.write_text(_mkvcf(
        ["chr1\t100\t.\tA\tT\t99\tPASS\t.\tGT:DP\t0/1:9\t1/1:7"]))
    r = subprocess.run(
        [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcf",
         "-i", str(vcf), "--field", "DP", "-o", str(tmp_path / "o.tsv")],
        capture_output=True, cwd=Path(__file__).parent.parent)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert "C fast path disabled" in r.stderr.decode()


def test_vcf_stdin_fast_path(tmp_path):
    """Piped VCF input: the C fast path reads the header from the first
    buffered chunks and must match the Python pipeline byte for byte."""
    import gzip
    import os
    import subprocess
    import sys
    text = gzip.decompress((Path(__file__).parent / "data"
                            / "sim1.vcf.gz").read_bytes())
    fast, slow = tmp_path / "fast.geno", tmp_path / "slow.geno"
    r = subprocess.run(
        [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcf",
         "-o", str(fast)], input=text, capture_output=True,
        cwd=Path(__file__).parent.parent)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    r = subprocess.run(
        [sys.executable, "-m", "genomics_general_tpu.cli.parse_vcf",
         "-o", str(slow)], input=text, capture_output=True,
        cwd=Path(__file__).parent.parent,
        env=dict(os.environ, GGT_HOST_VCF="0"))
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    assert fast.read_bytes() == slow.read_bytes()
