#!/usr/bin/env python
"""BASELINE.md measurement sweep: all 5 configs, engine vs reference.

For each BASELINE config this times the engine end-to-end on the real chip
(median of BENCH_RUNS, after one warm-up/compile run) and the corresponding
reference script single-threaded on a subset of the same data (sites/s
extrapolates; the reference pipelines are O(sites) in this regime).

Writes BASELINE_RESULTS.json and prints one JSON line per config.  Run
``python bench.py`` for the headline number the driver records.

Configs (BASELINE.md):
  1. popgen     pi/dxy/Fst, 2 pops, 50 kb coordinate windows
  2. popgen4    4 pops, 250-site windows + indHet (+ a predefined pass)
  3. abba       D/fd/fdM, 100-SNP windows, minData
  4. freqsfs    freq --target derived piped reference-style into sfs
  5. dmat4pop   distMat cat (genome-wide) + fourPopWindows full panel
"""

import datetime
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
CACHE = REPO / ".bench_cache"
SITES = int(os.environ.get("BENCH_ALL_SITES", 2_000_000))
REF_SITES = int(os.environ.get("BENCH_REF_SITES", 40_000))
REF_PATH = os.environ.get("BENCH_REF", "/root/reference")
N_RUNS = int(os.environ.get("BENCH_RUNS", 5))

sys.path.insert(0, str(REPO))


def host_weather() -> float:
    """Quick memcpy probe (MB/s): this box's throughput swings several-fold
    minute to minute, so every result row records the conditions it was
    measured under."""
    import numpy as np
    a = np.ones(64 << 20, dtype=np.uint8)
    t0 = time.perf_counter()
    b = a.copy()
    dt = time.perf_counter() - t0
    del b
    return round(64 / dt, 1)


VCF_SITES = int(os.environ.get("BENCH_VCF_SITES", 300_000))
VCF_REF_SITES = int(os.environ.get("BENCH_VCF_REF_SITES", 8_000))


def _vcf_subset(vcf, sub, n):
    import gzip
    with gzip.open(vcf, "rb") as f:
        lines = []
        data = 0
        for ln in f:
            lines.append(ln)
            if not ln.startswith(b"#"):
                data += 1
                if data >= n:
                    break
    with gzip.open(sub, "wb", compresslevel=4) as f:
        f.writelines(lines)


def ensure_vcf_data():
    """Synthetic VCFs (SNPs/indels/multiallelic/missing/dups, DP+GQ fields)
    for the ingest configs, plus small subsets for the reference
    denominators.  Returns (vcf, sub, vcf2, sub2); the second file drives
    the 2-file parseVCFs merge config."""
    CACHE.mkdir(exist_ok=True)
    vcf = CACHE / f"bench_{VCF_SITES}.vcf.gz"
    sub = CACHE / f"bench_vcfref_{VCF_REF_SITES}.vcf.gz"
    vcf2 = CACHE / f"bench2_{VCF_SITES}.vcf.gz"
    sub2 = CACHE / f"bench2_vcfref_{VCF_REF_SITES}.vcf.gz"
    from tests.gen_fixtures import simulate_vcf
    if not vcf.exists():
        simulate_vcf(vcf, n_samples=20, seed=23,
                     scaffolds=tuple((f"chr{i+1}", 40_000_000)
                                     for i in range(4)),
                     n_sites_per_scaf=VCF_SITES // 4)
    if not vcf2.exists():
        simulate_vcf(vcf2, n_samples=12, seed=29,
                     scaffolds=tuple((f"chr{i+1}", 40_000_000)
                                     for i in range(4)),
                     n_sites_per_scaf=VCF_SITES // 4)
    if not sub.exists():
        _vcf_subset(vcf, sub, VCF_REF_SITES)
    if not sub2.exists():
        _vcf_subset(vcf2, sub2, VCF_REF_SITES)
    return vcf, sub, vcf2, sub2


def ensure_data():
    CACHE.mkdir(exist_ok=True)
    geno = CACHE / f"bench_v3_{SITES}.geno.gz"
    pops = CACHE / "bench.pops.txt"
    sub = CACHE / f"bench_v3_ref_{REF_SITES}.geno.gz"
    wc = CACHE / f"bench_v3_{SITES}.windcoords.txt"
    wc_sub = CACHE / f"bench_v3_ref_{REF_SITES}.windcoords.txt"
    if not geno.exists():
        from genomics_general_tpu.testing import write_geno, write_pops_file
        inds = write_geno(str(geno), n_sites=SITES,
                          scaffold_len=max(10_000_000, SITES * 12),
                          n_scaffolds=4)
        write_pops_file(str(pops), inds)
    if not sub.exists():
        import gzip
        with gzip.open(geno, "rb") as f:
            lines = []
            for i, ln in enumerate(f):
                lines.append(ln)
                if i >= REF_SITES:
                    break
        with gzip.open(sub, "wb", compresslevel=4) as f:
            f.writelines(lines)
    if not wc.exists():
        _write_windcoords(geno, wc)
    if not wc_sub.exists():
        _write_windcoords(sub, wc_sub)
    return geno, pops, sub, wc, wc_sub


def _write_windcoords(geno, path, size=100_000):
    """Non-overlapping windows covering each scaffold's observed span."""
    import gzip
    spans = {}
    order = []
    with gzip.open(geno, "rt") as f:
        f.readline()
        for ln in f:
            s, p, _ = ln.split("\t", 2)
            p = int(p)
            if s not in spans:
                spans[s] = [p, p]
                order.append(s)
            else:
                spans[s][1] = p
    with open(path, "w") as f:
        for s in order:
            a, b = spans[s]
            w = 1
            for start in range(1, b + 1, size):
                f.write(f"{s}\t{start}\t{start + size - 1}\t{s}_w{w}\n")
                w += 1


POPS2 = lambda p: ["-p", "pop1", "-p", "pop2", "--popsFile", str(p)]  # noqa: E731
POPS4 = lambda p: ["-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",  # noqa: E731
                   "--popsFile", str(p)]
ABBA_POPS = lambda p: ["-P1", "pop1", "-P2", "pop2", "-P3", "pop3",  # noqa: E731
                       "-O", "pop4", "--popsFile", str(p)]


def config_cmds(geno, pops, wc, out_dir):
    """Returns {name: [(engine_module, args, ref_script, ref_args), ...]}.

    Each config is a list of pipeline steps; sites/s uses the dataset site
    count over the summed step time.

    parsevcf: VCF->geno ingest.  The denominator is reference parseVCF.py
    single-thread — the identical per-line pipeline that parseVCFs.py exists
    to parallelize (VCF_processing/README.md:31-43); parseVCFs itself needs
    real tabix+bgzip indexes this image lacks.  A speedup of S implies the
    engine also beats a perfectly-scaling reference -T N for any N < S.
    """
    o = lambda n: str(Path(out_dir) / n)  # noqa: E731
    g = str(geno)
    vcf, _vcf_sub, vcf2, _vcf_sub2 = ensure_vcf_data()
    return {
        "parsevcf": [(
            "genomics_general_tpu.cli.parse_vcfs",
            ["-i", str(vcf), "-t", "2", "-o", o("parsevcf.geno")],
            "VCF_processing/parseVCF.py",
            ["-i", "VCFSUB", "-o", o("ref_parsevcf.geno")])],
        # 2-file union merge (the reference parseVCFs.py's whole reason to
        # exist).  Reference parseVCFs needs real tabix indexes this image
        # lacks, so the denominator is THIS repo's serial per-line Python
        # walk (GGT_HOST_VCF=0) — a faithful, bug-fixed implementation of
        # the reference's merge algorithm and a conservative proxy (the
        # reference adds tabix-subprocess overhead on top).
        "parsevcfs2": [(
            "genomics_general_tpu.cli.parse_vcfs",
            ["-i", str(vcf), "-i", str(vcf2), "-M", "union", "-t", "2",
             "-o", o("parsevcfs2.geno")],
            "SELF_SERIAL:parse_vcfs",
            ["-i", "VCFSUB", "-i", "VCFSUB2", "-M", "union",
             "-o", o("ref_parsevcfs2.geno")])],
        "popgen": [(
            "genomics_general_tpu.cli.popgen_windows",
            ["-g", g, "-f", "phased", "-w", "50000", "-m", "100",
             *POPS2(pops), "--analysis", "popDist", "popPairDist",
             "-o", o("popgen.csv")],
            "popgenWindows.py", None)],
        "popgen4": [(
            "genomics_general_tpu.cli.popgen_windows",
            ["-g", g, "-f", "phased", "--windType", "sites", "-w", "250",
             "-m", "100", *POPS4(pops),
             "--analysis", "popDist", "popPairDist", "indHet",
             "-o", o("popgen4.csv")],
            "popgenWindows.py", None), (
            "genomics_general_tpu.cli.popgen_windows",
            ["-g", g, "-f", "phased", "--windType", "predefined",
             "--windCoords", str(wc), "-m", "100", *POPS4(pops),
             "--analysis", "popDist", "-o", o("popgen4b.csv")],
            "popgenWindows.py", None)],
        "abba": [(
            "genomics_general_tpu.cli.abba_windows",
            ["-g", g, "-f", "phased", "--windType", "sites", "-w", "100",
             "-m", "10", "--minData", "0.5", *ABBA_POPS(pops),
             "-o", o("abba.csv")],
            "ABBABABAwindows.py", None)],
        "freqsfs": [(
            "genomics_general_tpu.cli.freq",
            ["-g", g, "-f", "phased", *POPS4(pops),
             "-o", o("freq.tsv")],
            "freq.py",
            ["-g", "SUB", "-f", "phased", *POPS4(pops),
             "-o", o("ref_freq.tsv"), "-t", "1"]), (
            "genomics_general_tpu.cli.sfs",
            ["-i", o("freq.tsv"), "--inputType", "baseCounts",
             "-p", "pop1", "-p", "pop2", "--doPairs",
             "--pref", o("sfs_"), "--suff", ".sfs"],
            "sfs.py",
            ["-i", o("ref_freq.tsv"), "--inputType", "baseCounts",
             "-p", "pop1", "-p", "pop2", "--doPairs",
             "--pref", o("ref_sfs_"), "--suff", ".sfs"])],
        "dmat4pop": [(
            "genomics_general_tpu.cli.dist_mat",
            ["-g", g, "-f", "phased", "--windType", "cat",
             "--outFormat", "phylip", "-o", o("dmat.phy")],
            "distMat.py", None), (
            "genomics_general_tpu.cli.four_pop_windows",
            ["-g", g, "-f", "phased", "-w", "50000", "-m", "50",
             "--minData", "0.3", *ABBA_POPS(pops),
             "-o", o("fourpop.csv")],
            "fourPopWindows.py", None)],
    }


def run_engine_step(module, args, stage_sink=None):
    """Run one engine CLI in-process; optionally capture its StageTimer
    lane split into ``stage_sink`` (a dict)."""
    import importlib
    mod = importlib.import_module(module)
    if stage_sink is None:
        t0 = time.perf_counter()
        mod.main(list(args))
        return time.perf_counter() - t0
    from genomics_general_tpu import engine as _eng
    orig = _eng.StageTimer.report

    def report(self, stream=None, extra=""):
        stage_sink.update(self.split())
    _eng.StageTimer.report = report
    try:
        t0 = time.perf_counter()
        mod.main(list(args) + ["--profile"])
        return time.perf_counter() - t0
    finally:
        _eng.StageTimer.report = orig


_REF_SHIM = None


def _ref_shim() -> str:
    """Wrapper that restores np.NaN (removed in numpy 2; several reference
    scripts crash a worker on it and then hang in their poll shutdown) —
    the same shim tests/gen_golden.sh uses."""
    global _REF_SHIM
    if _REF_SHIM is None:
        CACHE.mkdir(exist_ok=True)
        p = CACHE / "ref_shim.py"
        p.write_text(
            "import os, runpy, sys\n"
            "import numpy\n"
            "numpy.NaN = numpy.nan\n"
            "script = sys.argv.pop(1)\n"
            "sys.argv[0] = script\n"
            "sys.path.insert(0, os.path.dirname(script))\n"
            "runpy.run_path(script, run_name='__main__')\n")
        _REF_SHIM = str(p)
    return _REF_SHIM


def run_ref_step(script, args):
    env = dict(os.environ, PYTHONHASHSEED="0")
    if script.startswith("SELF_SERIAL:"):
        # denominator = this repo's own serial Python implementation of the
        # reference algorithm (used where the reference script cannot run
        # in this image — e.g. parseVCFs needs tabix)
        mod = "genomics_general_tpu.cli." + script.split(":", 1)[1]
        env["GGT_HOST_VCF"] = "0"
        t0 = time.perf_counter()
        try:
            r = subprocess.run([sys.executable, "-m", mod, *args],
                               capture_output=True, env=env, timeout=420,
                               cwd=str(REPO))
        except subprocess.TimeoutExpired:
            return None
        dt = time.perf_counter() - t0
        return dt if r.returncode == 0 else None
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, _ref_shim(), f"{REF_PATH}/{script}", *args],
            capture_output=True, env=env, timeout=420)
    except subprocess.TimeoutExpired:
        # a hung reference run (dead worker + poll shutdown) should not
        # burn the whole sweep
        return None
    dt = time.perf_counter() - t0
    return dt if r.returncode == 0 else None


def swap_input(args, old, new):
    return [a.replace(str(old), str(new)) if isinstance(a, str) else a
            for a in args]


# engine CLI modules that accept --profile (StageTimer lane split)
_PROFILABLE = {"genomics_general_tpu.cli.popgen_windows",
               "genomics_general_tpu.cli.abba_windows",
               "genomics_general_tpu.cli.four_pop_windows",
               "genomics_general_tpu.cli.freq",
               "genomics_general_tpu.cli.sfs",
               "genomics_general_tpu.cli.dist_mat"}

RESULTS_PATH = REPO / "BASELINE_RESULTS.json"


def load_results() -> dict:
    """Existing results file (merged per config, never clobbered: a partial
    re-run of one config must not erase the other configs' rows)."""
    try:
        with open(RESULTS_PATH) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    doc.setdefault("sites", SITES)
    doc.setdefault("ref_sites", REF_SITES)
    doc.setdefault("results", {})
    doc.setdefault("history", [])
    return doc


def main():
    geno, pops, sub, wc, wc_sub = ensure_data()
    vcf_path = ensure_vcf_data()[0]
    out_dir = Path("/tmp/bench_all")
    out_dir.mkdir(exist_ok=True)
    doc = load_results()
    results = doc["results"]
    only = set(sys.argv[1:])
    per_cfg_sites = {"parsevcf": (VCF_SITES, VCF_REF_SITES),
                     "parsevcfs2": (2 * VCF_SITES, 2 * VCF_REF_SITES)}
    for name, steps in config_cmds(geno, pops, wc, out_dir).items():
        if only and name not in only:
            continue
        cfg_sites, cfg_ref_sites = per_cfg_sites.get(name,
                                                     (SITES, REF_SITES))
        weather0 = host_weather()
        # warm-up (compiles), then N_RUNS engine/reference pairs INTERLEAVED
        # so both sides sample the same host-weather distribution (the box's
        # CPU/memory throughput swings several-fold minute to minute).  The
        # warm-up wall is the cold-start record (persistent-cache loads or
        # XLA compiles on an empty cache).
        cold_s = sum(run_engine_step(module, args)
                     for module, args, _, _ in steps)
        times = []
        ref_times = []
        pairs = []
        stage_splits = None
        thread_flag = {"freq.py": ["-t", "1"], "sfs.py": []}
        have_ref = Path(REF_PATH).exists()
        for _ in range(N_RUNS):
            dt = 0.0
            splits = []
            for module, args, _, _ in steps:
                sink = {} if module in _PROFILABLE else None
                dt += run_engine_step(module, args, stage_sink=sink)
                splits.append(sink)
            times.append(dt)
            if stage_splits is None or dt <= min(times):
                stage_splits = splits        # split of the fastest run
            if not have_ref:
                continue
            dt = 0.0
            ok = True
            for module, args, script, ref_args in steps:
                if ref_args is None:
                    rargs = swap_input(args, geno, sub)
                    rargs = swap_input(rargs, wc, wc_sub)
                    rargs += thread_flag.get(script, ["-T", "1"])
                else:
                    rargs = swap_input(ref_args, "VCFSUB2",
                                       ensure_vcf_data()[3])
                    rargs = swap_input(rargs, "VCFSUB",
                                       ensure_vcf_data()[1])
                    rargs = swap_input(rargs, "SUB", sub)
                d = run_ref_step(script, rargs)
                if d is None:
                    ok = False
                    have_ref = False     # hung/failed once: stop retrying
                    break
                dt += d
            if ok:
                ref_times.append(dt)
                pairs.append((times[-1], dt))
        eng_dt = statistics.median(times)
        eng_sps = cfg_sites / eng_dt
        ref_sps = None
        if ref_times:
            ref_sps = cfg_ref_sites / statistics.median(ref_times)

        row = {
            "config": name,
            "sites": cfg_sites,
            "ref_sites": cfg_ref_sites,
            "engine_sites_per_s": round(eng_sps, 1),
            "engine_runs_s": [round(t, 3) for t in times],
            "ref_sites_per_s": round(ref_sps, 1) if ref_sps else None,
            "ref_runs_s": [round(t, 3) for t in ref_times],
            "speedup": round(eng_sps / ref_sps, 2) if ref_sps else None,
            "speedup_paired": round(statistics.median(
                [(cfg_sites / e) / (cfg_ref_sites / r) for e, r in pairs]), 2)
                if pairs else None,
            "cold_first_run_s": round(cold_s, 3),
            "stages": stage_splits,
            "memcpy_mb_s": [weather0, host_weather()],
            "timestamp": datetime.datetime.now(datetime.timezone.utc)
                         .strftime("%Y-%m-%dT%H:%M:%SZ"),
        }
        if name == "parsevcf":
            # -t scaling curve + the irreducible gz-decompress stage, so the
            # committed number is defended by a breakdown, not a footnote
            module0, args0 = steps[0][0], steps[0][1]
            curve = {}
            for tflag in ("1", "2"):
                a = list(args0)
                a[a.index("-t") + 1] = tflag
                curve[f"t{tflag}_s"] = round(run_engine_step(module0, a), 3)
            from genomics_general_tpu.io import vcf_fast as _vf
            t0 = time.perf_counter()
            n_bytes = sum(len(c) for c in _vf.text_chunks(str(vcf_path)))
            curve["gz_decompress_s"] = round(time.perf_counter() - t0, 3)
            curve["decompressed_mb"] = round(n_bytes / 1e6, 1)
            row["t_curve"] = curve

        if name in results and results[name].get("speedup") is not None:
            prev = dict(results[name])
            prev.pop("stages", None)
            doc["history"].append(prev)
        results[name] = row
        print(json.dumps(row), flush=True)

        with open(RESULTS_PATH, "w") as f:      # checkpoint after EVERY config
            json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
