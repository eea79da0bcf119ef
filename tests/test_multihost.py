"""Multi-host (2 real processes) end-to-end tests on the CPU fabric.

Spawns two OS processes that bring up ``jax.distributed`` (gloo collectives),
shard the input by scaffold ownership (parallel/multihost.py), run the full
popgenWindows pipeline, and gather rows to a host-0 ordered writer.  The
2-process CSV must be byte-identical to the 1-process CSV — the TPU-native
analog of the reference's "N workers produce the same output as 1"
guarantee (sorter thread, /root/reference/popgenWindows.py:108-140).

Note on ownership skew: with sim1's two scaffolds, crc32 assigns BOTH to
rank 1, so every test here also exercises a host that owns zero scaffolds
(rank 0 parses, keeps nothing, and still participates in the gather).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
D = REPO / "tests" / "data"

pytestmark = pytest.mark.multihost


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _base_args(out: str) -> list[str]:
    return ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
            "-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
            "--popsFile", str(D / "sim1.pops.txt"),
            "--writeFailedWindows", "-o", out]


def _clean_env(extra: dict) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env.update({
        "PYTHONPATH": str(REPO),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "GGT_NO_NATIVE_PARSER": os.environ.get("GGT_NO_NATIVE_PARSER", ""),
    })
    env.update(extra)
    return env


def _run_cli_dist(tmp_path, module: str, args_for):
    """Run ``module`` once single-process and once as 2 jax.distributed
    processes; assert byte-identical output.  ``args_for(out_path)`` builds
    the full CLI argument list."""
    single = tmp_path / "single.csv"
    r = subprocess.run(
        [sys.executable, "-m", module, *args_for(str(single))],
        env=_clean_env({}), capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist = tmp_path / "dist.csv"
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", module, *args_for(str(dist))],
            env=_clean_env({
                "GGT_COORDINATOR": f"127.0.0.1:{port}",
                "GGT_NUM_PROCS": "2",
                "GGT_PROC_ID": str(pid),
            }),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    assert dist.read_bytes() == single.read_bytes()


def run_single_vs_two(tmp_path, extra_args: list[str],
                      module: str = "genomics_general_tpu.cli.popgen_windows"):
    _run_cli_dist(tmp_path, module,
                  lambda out: [*_base_args(out), *extra_args])


WINDOW = ["-w", "50000", "-s", "25000", "-m", "100", "--minData", "0.3"]


def test_two_process_csv_equals_one_process(tmp_path):
    run_single_vs_two(tmp_path, [*WINDOW, "--analysis",
                                 "popDist", "popPairDist"])


def test_two_process_popfreq_hapstats(tmp_path):
    """popFreq + hapStats columns (counts kernel + H12 clustering) across
    the 2-process gather."""
    run_single_vs_two(tmp_path, [*WINDOW, "--analysis",
                                 "popFreq", "popDist", "hapStats"])


def test_two_process_abba_windows(tmp_path):
    """ABBA-BABA D/fd/fdM across the 2-process gather (fused device window
    reduction + scaffold-sharded input)."""
    _run_cli_dist(
        tmp_path, "genomics_general_tpu.cli.abba_windows",
        lambda out: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                     "-w", "50000", "-s", "25000", "-m", "50",
                     "--minData", "0.3",
                     "-P1", "pop1", "-P2", "pop2", "-P3", "pop3",
                     "-O", "pop4", "--popsFile", str(D / "sim1.pops.txt"),
                     "--writeFailedWindows", "-o", out])


def test_two_process_abba_jackknife(tmp_path):
    """--jackknife in a sharded run: per-host window ratio components are
    allgathered and host 0 writes the block-jackknife table; must be
    byte-identical to a 1-process run (the CSV is too, as elsewhere)."""
    def args_for(out):
        return ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                "-w", "25000", "-s", "25000", "-m", "20",
                "--minData", "0.3",
                "-P1", "pop1", "-P2", "pop2", "-P3", "pop3",
                "-O", "pop4", "--popsFile", str(D / "sim1.pops.txt"),
                "--jackknife", "60000",
                "--jackknifeFile", out + ".jk.tsv", "-o", out]
    _run_cli_dist(tmp_path, "genomics_general_tpu.cli.abba_windows", args_for)
    single = (tmp_path / "single.csv.jk.tsv").read_bytes()
    dist = (tmp_path / "dist.csv.jk.tsv").read_bytes()
    assert single and single == dist


def test_two_process_four_pop_windows(tmp_path):
    """fourPopWindows full 12-stat panel across the 2-process gather."""
    _run_cli_dist(
        tmp_path, "genomics_general_tpu.cli.four_pop_windows",
        lambda out: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                     "-w", "50000", "-s", "50000", "-m", "50",
                     "--minData", "0.3",
                     "-P1", "pop1", "-P2", "pop2", "-P3", "pop3",
                     "-O", "pop4", "--popsFile", str(D / "sim1.pops.txt"),
                     "-o", out])


def test_two_process_freq(tmp_path):
    """Scaffold-sharded freq (per-site rows, segment-compressed per-host
    buffers): 2-process TSV must be byte-identical to 1-process, in both
    counts mode and derived-target mode."""
    _run_cli_dist(
        tmp_path, "genomics_general_tpu.cli.freq",
        lambda out: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                     "-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
                     "--popsFile", str(D / "sim1.pops.txt"), "-o", out])
    _run_cli_dist(
        tmp_path, "genomics_general_tpu.cli.freq",
        lambda out: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                     "--target", "derived",
                     "-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
                     "--popsFile", str(D / "sim1.pops.txt"), "-o", out])


def test_two_process_filter_genotypes(tmp_path):
    """Scaffold-sharded filterGenotypes: 2-process geno output byte-identical
    to 1-process (siteTest mask stack + per-scaffold row gather)."""
    _run_cli_dist(
        tmp_path, "genomics_general_tpu.cli.filter_genotypes",
        lambda out: ["-i", str(D / "sim1.geno.gz"),
                     "-if", "phased", "-of", "phased",
                     "--minCalls", "15", "--minAlleles", "2",
                     "-o", out])


def test_two_process_dist_mat_windowed(tmp_path):
    """Scaffold-sharded windowed distMat: matrices + window metadata files
    both byte-identical to a 1-process run."""
    def args_for(out):
        return ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                "--windType", "coordinate", "-w", "50000", "-m", "10",
                "--outFormat", "phylip",
                "--windowDataOutFile", out + ".meta",
                "--writeFailedWindows", "-o", out]
    _run_cli_dist(tmp_path, "genomics_general_tpu.cli.dist_mat", args_for)
    single = (tmp_path / "single.csv.meta").read_bytes()
    dist = (tmp_path / "dist.csv.meta").read_bytes()
    assert single and single == dist


def test_two_process_dist_mat_cat(tmp_path):
    """cat mode: per-host [H,H] pair-count accumulators merge with a sum
    collective; the genome-wide matrix matches the 1-process run."""
    _run_cli_dist(
        tmp_path, "genomics_general_tpu.cli.dist_mat",
        lambda out: ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
                     "--windType", "cat", "--outFormat", "phylip",
                     "-o", out])


def test_two_process_dist_paint(tmp_path):
    """Scaffold-sharded ancestry painting: 2-process output byte-identical
    to 1-process (ranksum mode)."""
    _run_cli_dist(
        tmp_path, "genomics_general_tpu.cli.dist_paint",
        lambda out: ["-g", str(D / "sim_paint.geno.gz"),
                     "-w", "50000", "-s", "25000", "-m", "50",
                     "-p", "pop1", "-p", "pop2", "-p", "pop3",
                     "--popsFile", str(D / "sim_paint.pops.txt"),
                     "--writeFailedWindows", "-o", out])


def test_two_process_phyml_nj(tmp_path):
    """Scaffold-sharded sliding-window tree inference (builtin NJ backend):
    data.tsv and trees.gz both match the 1-process run."""
    def run(prefix, extra_env):
        r = subprocess.run(
            [sys.executable, "-m",
             "genomics_general_tpu.cli.phyml_sliding_windows",
             "-g", str(D / "sim1.geno.gz"), "--windType", "coordinate",
             "-w", "50000", "-M", "10", "--phyml", "builtin-nj",
             "-p", prefix],
            env=_clean_env(extra_env), capture_output=True, timeout=600)
        return r

    single = str(tmp_path / "single")
    r = run(single, {})
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist = str(tmp_path / "dist")
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "genomics_general_tpu.cli.phyml_sliding_windows",
         "-g", str(D / "sim1.geno.gz"), "--windType", "coordinate",
         "-w", "50000", "-M", "10", "--phyml", "builtin-nj",
         "-p", dist],
        env=_clean_env({"GGT_COORDINATOR": f"127.0.0.1:{port}",
                        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid)}),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    import gzip as _gzip
    assert Path(single + ".data.tsv").read_bytes() == \
        Path(dist + ".data.tsv").read_bytes()
    with _gzip.open(single + ".trees.gz") as a, \
            _gzip.open(dist + ".trees.gz") as b:
        sa, sb = a.read(), b.read()
    assert sa and sa == sb


def test_two_process_sfs_psum(tmp_path):
    """Scaffold-sharded sfs: per-host dense spectra merged with device
    collectives (sum counts / min first-occurrence keys); 2-process spectra
    must be byte-identical to 1-process (including chain order)."""
    def run(tag, extra_env):
        pref = str(tmp_path / f"{tag}_")
        base = [sys.executable, "-m", "genomics_general_tpu.cli.sfs",
                "-i", str(D / "sim1.geno.gz"), "--inputType", "genotypes",
                "--genoFormat", "phased", "-p", "pop1", "-p", "pop2",
                "--popsFile", str(D / "sim1.pops.txt"), "--doPairs",
                "--pref", pref, "--suff", ".sfs"]
        if not extra_env:
            r = subprocess.run(base, env=_clean_env({}), capture_output=True,
                               timeout=600)
            assert r.returncode == 0, r.stderr.decode()[-2000:]
        else:
            procs = [subprocess.Popen(base, env=_clean_env(e),
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.PIPE)
                     for e in extra_env]
            for p in procs:
                _, err = p.communicate(timeout=600)
                assert p.returncode == 0, err.decode()[-2000:]
        return pref

    single = run("single", None)
    port = _free_port()
    dist = run("dist", [{
        "GGT_COORDINATOR": f"127.0.0.1:{port}",
        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid)} for pid in range(2)])
    for g in ("pop1", "pop2", "pop1_pop2"):
        a = Path(single + g + ".sfs").read_bytes()
        b = Path(dist + g + ".sfs").read_bytes()
        assert a == b, g


def test_two_process_predefined_interleaved_ghost(tmp_path):
    """Predefined window list that (a) interleaves scaffolds — host-0 must
    write rows in exact windCoords file order, not scaffold-grouped — and
    (b) includes scaffolds absent from the data, whose rows must carry their
    true names (not collide across hosts)."""
    wc = tmp_path / "wc.txt"
    rows = [
        ("scaf1", 1, 50000, "a1"),
        ("scaf2", 1, 50000, "b1"),
        ("scaf1", 50001, 100000, "a2"),
        ("ghostA", 1, 40000, "g1"),
        ("scaf2", 50001, 100000, "b2"),
        ("scaf1", 100001, 150000, "a3"),
        ("ghostB", 1, 40000, "g2"),
    ]
    wc.write_text("".join(f"{s}\t{a}\t{b}\t{i}\n" for s, a, b, i in rows))
    run_single_vs_two(tmp_path, [
        "--windType", "predefined", "--windCoords", str(wc), "-m", "50",
        "--addWindowID", "--analysis", "popDist", "popPairDist"])


def test_two_process_raxml_nj(tmp_path):
    """Scaffold-sharded raxml_sliding_windows (builtin NJ backend, -T 2
    worker pool on each host): data.tsv and trees.gz match 1-process."""
    def argv(prefix):
        return [sys.executable, "-m",
                "genomics_general_tpu.cli.raxml_sliding_windows",
                "-g", str(D / "sim1.geno.gz"), "--windType", "coordinate",
                "-w", "50000", "-M", "10", "--raxml", "builtin-nj",
                "-T", "2", "-p", prefix]

    single = str(tmp_path / "single")
    r = subprocess.run(argv(single), env=_clean_env({}),
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist = str(tmp_path / "dist")
    port = _free_port()
    procs = [subprocess.Popen(
        argv(dist),
        env=_clean_env({"GGT_COORDINATOR": f"127.0.0.1:{port}",
                        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid)}),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    import gzip as _gzip
    assert Path(single + ".data.tsv").read_bytes() == \
        Path(dist + ".data.tsv").read_bytes()
    with _gzip.open(single + ".trees.gz") as a, \
            _gzip.open(dist + ".trees.gz") as b:
        sa, sb = a.read(), b.read()
    assert sa and sa == sb


def test_two_process_freq_incremental_gather(tmp_path):
    """Incremental gather (GGT_GATHER_SCAFS=1): host 0 writes scaffold
    groups while hosts still stream.  Output must stay byte-identical to a
    1-process run, and the per-host peak buffered bytes must be below the
    total output size (bounded memory)."""
    argv = lambda out: [  # noqa: E731
        sys.executable, "-m", "genomics_general_tpu.cli.freq",
        "-g", str(D / "sim1.geno.gz"), "-f", "phased",
        "-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
        "--popsFile", str(D / "sim1.pops.txt"), "-o", out]

    single = tmp_path / "single.tsv"
    r = subprocess.run(argv(str(single)), env=_clean_env({}),
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist = tmp_path / "dist.tsv"
    port = _free_port()
    procs = [subprocess.Popen(
        argv(str(dist)),
        env=_clean_env({"GGT_COORDINATOR": f"127.0.0.1:{port}",
                        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid),
                        "GGT_GATHER_SCAFS": "1", "GGT_GATHER_DEBUG": "1"}),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for pid in range(2)]
    peaks = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
        for ln in err.decode().splitlines():
            if "[gather]" in ln:
                peaks.append(int(ln.split()[-2]))
    assert dist.read_bytes() == single.read_bytes()
    # compressed peak must be well under the (uncompressed) output size —
    # with one 2-scaffold input and G=1, each host held at most 1 scaffold
    assert len(peaks) == 2
    assert max(peaks) < single.stat().st_size


def test_two_process_filter_genotypes_incremental_gather(tmp_path):
    """filter_genotypes is a genome-scale per-site output like freq: with
    GGT_GATHER_SCAFS=1 host 0 writes scaffold groups while hosts still
    stream, output stays byte-identical to 1-process, and per-host peak
    buffered bytes stay below the output size."""
    argv = lambda out: [  # noqa: E731
        sys.executable, "-m", "genomics_general_tpu.cli.filter_genotypes",
        "-i", str(D / "sim1.geno.gz"), "--inputGenoFormat", "phased",
        "--outputGenoFormat", "phased", "--minCalls", "12",
        "--minAlleles", "2", "-o", out]

    single = tmp_path / "single.geno"
    r = subprocess.run(argv(str(single)), env=_clean_env({}),
                       capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist = tmp_path / "dist.geno"
    port = _free_port()
    procs = [subprocess.Popen(
        argv(str(dist)),
        env=_clean_env({"GGT_COORDINATOR": f"127.0.0.1:{port}",
                        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid),
                        "GGT_GATHER_SCAFS": "1", "GGT_GATHER_DEBUG": "1"}),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for pid in range(2)]
    peaks = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
        for ln in err.decode().splitlines():
            if "[gather]" in ln:
                peaks.append(int(ln.split()[-2]))
    assert dist.read_bytes() == single.read_bytes()
    assert len(peaks) == 2
    assert max(peaks) < single.stat().st_size


def test_two_process_popgen_indexed_input(tmp_path):
    """With a native .tbi next to a BGZF geno, each host reads ONLY its
    owned scaffolds' blocks (multihost.indexed_input) — output must stay
    byte-identical to the 1-process run over the plain file."""
    from genomics_general_tpu.io import tabix as T
    bgz = tmp_path / "sim1.geno.bgz"
    T.bgzip_file(str(D / "sim1.geno.gz"), str(bgz))
    T.build_index(str(bgz), preset="geno")

    def argv(geno, out):
        return [sys.executable, "-m",
                "genomics_general_tpu.cli.popgen_windows",
                "-g", geno, "-f", "phased",
                "-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
                "--popsFile", str(D / "sim1.pops.txt"),
                "-w", "50000", "-m", "50",
                "--analysis", "popDist", "popPairDist", "-o", out]

    single = tmp_path / "single.csv"
    r = subprocess.run(argv(str(D / "sim1.geno.gz"), str(single)),
                       env=_clean_env({}), capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist = tmp_path / "dist.csv"
    port = _free_port()
    procs = [subprocess.Popen(
        argv(str(bgz), str(dist)),
        env=_clean_env({"GGT_COORDINATOR": f"127.0.0.1:{port}",
                        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid)}),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    assert dist.read_bytes() == single.read_bytes()


def test_two_process_freq_indexed_incremental(tmp_path):
    """Indexed sharded input + incremental gather together: each host reads
    only its owned scaffolds' blocks AND host 0 writes scaffold groups
    while streaming — byte-identical to 1-process over the plain file
    (collective round counts must align even though hosts' streams end at
    different frontiers)."""
    from genomics_general_tpu.io import tabix as T
    bgz = tmp_path / "sim1.geno.bgz"
    T.bgzip_file(str(D / "sim1.geno.gz"), str(bgz))
    T.build_index(str(bgz), preset="geno")

    def argv(geno, out):
        return [sys.executable, "-m", "genomics_general_tpu.cli.freq",
                "-g", geno, "-f", "phased",
                "-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
                "--popsFile", str(D / "sim1.pops.txt"), "-o", out]

    single = tmp_path / "single.tsv"
    r = subprocess.run(argv(str(D / "sim1.geno.gz"), str(single)),
                       env=_clean_env({}), capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist = tmp_path / "dist.tsv"
    port = _free_port()
    procs = [subprocess.Popen(
        argv(str(bgz), str(dist)),
        env=_clean_env({"GGT_COORDINATOR": f"127.0.0.1:{port}",
                        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid),
                        "GGT_GATHER_SCAFS": "1"}),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    assert dist.read_bytes() == single.read_bytes()


def test_two_process_abba_indexed_input(tmp_path):
    from genomics_general_tpu.io import tabix as T
    bgz = tmp_path / "sim1.geno.bgz"
    T.bgzip_file(str(D / "sim1.geno.gz"), str(bgz))
    T.build_index(str(bgz), preset="geno")

    def argv(geno, out):
        return [sys.executable, "-m", "genomics_general_tpu.cli.abba_windows",
                "-g", geno, "-f", "phased",
                "-w", "50000", "-s", "25000", "-m", "50", "--minData", "0.3",
                "-P1", "pop1", "-P2", "pop2", "-P3", "pop3", "-O", "pop4",
                "--popsFile", str(D / "sim1.pops.txt"),
                "--writeFailedWindows", "-o", out]

    single = tmp_path / "single.csv"
    r = subprocess.run(argv(str(D / "sim1.geno.gz"), str(single)),
                       env=_clean_env({}), capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    dist = tmp_path / "dist.csv"
    port = _free_port()
    procs = [subprocess.Popen(
        argv(str(bgz), str(dist)),
        env=_clean_env({"GGT_COORDINATOR": f"127.0.0.1:{port}",
                        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid)}),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    assert dist.read_bytes() == single.read_bytes()


def test_two_process_filter_genotypes_indexed_input(tmp_path):
    """Indexed sharded input for filterGenotypes: the ploidy/first-chunk
    peek is discarded when switching to the host-filtered stream; output
    byte-identical to 1-process over the plain file."""
    from genomics_general_tpu.io import tabix as T
    bgz = tmp_path / "sim1.geno.bgz"
    T.bgzip_file(str(D / "sim1.geno.gz"), str(bgz))
    T.build_index(str(bgz), preset="geno")

    def argv(geno, out):
        return [sys.executable, "-m",
                "genomics_general_tpu.cli.filter_genotypes",
                "-i", geno, "-if", "phased", "-of", "phased",
                "--minCalls", "15", "--minAlleles", "2", "-o", out]

    single = tmp_path / "single.geno"
    r = subprocess.run(argv(str(D / "sim1.geno.gz"), str(single)),
                       env=_clean_env({}), capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    dist = tmp_path / "dist.geno"
    port = _free_port()
    procs = [subprocess.Popen(
        argv(str(bgz), str(dist)),
        env=_clean_env({"GGT_COORDINATOR": f"127.0.0.1:{port}",
                        "GGT_NUM_PROCS": "2", "GGT_PROC_ID": str(pid),
                        "GGT_GATHER_SCAFS": "1"}),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for pid in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
    assert dist.read_bytes() == single.read_bytes()
