#!/usr/bin/env python
"""Benchmark: popgenWindows pi/dxy/Fst sweep, engine vs reference.

Prints ONE JSON line:
  {"metric": "popgen_sites_per_s_per_chip", "value": N, "unit": "sites/s",
   "vs_baseline": paired_ratio_median, "vs_baseline_of_medians": ...,
   "stages": {...}, "engine_runs_s": [...], "ref_runs_s": [...],
   "pair_ratios": [...], "cold_runs_s": [...]}

Method
------
* data: deterministic synthetic phased .geno.gz (20 diploid individuals,
  4 pops, BENCH_SITES sites across 4 scaffolds), cached in .bench_cache/.
* engine: end-to-end pipeline (gz text parse -> window plan -> biallelic
  wire upload -> MXU pair counts -> on-device f64 block finalize -> CSV)
  via the library CLI entry; two warm-up runs (jit compile — their walls
  are recorded as ``cold_runs_s``, the first one in a fresh process is the
  cold-start cost incl. persistent-cache loads), then N_RUNS (default 9)
  timed runs interleaved with reference runs.
* baseline: the reference popgenWindows.py -T 1 on a subset of the same
  data (sites/s extrapolates; the reference is O(sites) in this regime).
* statistic: this host's throughput swings several-fold minute to minute,
  so each iteration runs BOTH sides back to back (order alternating every
  iteration to cancel adjacency bias) and ``vs_baseline`` is the MEDIAN OF
  THE PER-ITERATION RATIOS engine_sps_i / ref_sps_i — the paired estimator
  the interleave exists to enable.  The ratio-of-medians is also reported
  for continuity with earlier rounds.
* stages: lane-grouped stage split (StageTimer.split) from the fastest
  timed engine run.  Stages on different pipeline threads overlap, so the
  split reports per-lane busy/idle against wall time (idle >= 0 by
  construction); the bottleneck lane is the one with busy ~= wall.

Config matches BASELINE.json config #1: pi/dxy/Fst, 2 pops, 50 kb coordinate
windows, phased geno.gz.
"""

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
CACHE = REPO / ".bench_cache"
BENCH_SITES = int(os.environ.get("BENCH_SITES", 2_000_000))
REF_SITES = int(os.environ.get("BENCH_REF_SITES", 40_000))
REF_PATH = os.environ.get("BENCH_REF", "/root/reference")
N_RUNS = int(os.environ.get("BENCH_RUNS", 9))

sys.path.insert(0, str(REPO))


def ensure_data():
    CACHE.mkdir(exist_ok=True)
    geno = CACHE / f"bench_v3_{BENCH_SITES}.geno.gz"
    pops = CACHE / "bench.pops.txt"
    sub = CACHE / f"bench_v3_ref_{REF_SITES}.geno.gz"
    if not geno.exists():
        from genomics_general_tpu.testing import write_geno, write_pops_file
        inds = write_geno(str(geno), n_sites=BENCH_SITES,
                          scaffold_len=max(10_000_000, BENCH_SITES * 12),
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
    return geno, pops, sub


ARGS = lambda g, p, o: [  # noqa: E731
    "-g", str(g), "-f", "phased", "-w", "50000", "-m", "100",
    "-p", "pop1", "-p", "pop2", "--popsFile", str(p),
    "--analysis", "popDist", "popPairDist", "-o", str(o)]


def run_engine(geno, pops, out, profile=False):
    from genomics_general_tpu.cli.popgen_windows import main
    extra = ["--profile"] if profile else []
    t0 = time.perf_counter()
    main(ARGS(geno, pops, out) + extra)
    return time.perf_counter() - t0


def run_reference(sub, pops, out):
    env = dict(os.environ, PYTHONHASHSEED="0")
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, f"{REF_PATH}/popgenWindows.py",
                        *ARGS(sub, pops, out), "-T", "1"],
                       capture_output=True, env=env)
    dt = time.perf_counter() - t0
    if r.returncode != 0:
        return None
    return dt


def _timed_engine_run(stages_out):
    """One timed engine run with the StageTimer split captured."""
    from genomics_general_tpu import engine as _eng
    rec = {}
    orig_report = _eng.StageTimer.report

    def report(self, stream=None, extra=""):
        # lane-grouped split: stages on different threads overlap, so
        # per-lane busy/idle (non-negative by construction) replaces the
        # old flat sum whose residual could go negative
        rec.update(self.split())
    _eng.StageTimer.report = report
    try:
        geno, pops, _ = _timed_engine_run.data
        dt = run_engine(geno, pops, "/tmp/bench_engine.csv", profile=True)
    finally:
        _eng.StageTimer.report = orig_report
    stages_out.append((dt, dict(rec)))
    return dt


def main():
    geno, pops, sub = ensure_data()
    _timed_engine_run.data = (geno, pops, sub)

    # two warm-up runs (jit compile + page cache); their walls are the
    # cold-start record — the first run of a fresh process pays persistent-
    # cache loads (or full XLA compiles on an empty cache)
    cold_runs = [run_engine(geno, pops, "/tmp/bench_engine_warm.csv"),
                 run_engine(geno, pops, "/tmp/bench_engine_warm.csv")]

    have_ref = Path(REF_PATH).exists()
    times = []
    ref_times = []
    pairs = []            # (engine_dt, ref_dt) per iteration
    staged: list = []
    for i in range(N_RUNS):
        # alternate order every iteration so neither side systematically
        # runs in the other's CPU-burst shadow
        if i % 2 == 0:
            dt = _timed_engine_run(staged)
            ref_dt = run_reference(sub, pops, "/tmp/bench_ref.csv") \
                if have_ref else None
        else:
            ref_dt = run_reference(sub, pops, "/tmp/bench_ref.csv") \
                if have_ref else None
            dt = _timed_engine_run(staged)
        times.append(dt)
        if ref_dt:
            ref_times.append(ref_dt)
            pairs.append((dt, ref_dt))

    dt = statistics.median(times)
    engine_sps = BENCH_SITES / dt
    stages = min(staged, key=lambda x: x[0])[1] if staged else None

    ref_sps = None
    vs_pairs = None
    vs_medians = None
    ratios = []
    if ref_times:
        ref_sps = REF_SITES / statistics.median(ref_times)
        vs_medians = engine_sps / ref_sps
        ratios = [(BENCH_SITES / e) / (REF_SITES / r) for e, r in pairs]
        vs_pairs = statistics.median(ratios)

    print(json.dumps({
        "metric": "popgen_sites_per_s_per_chip",
        "value": round(engine_sps, 1),
        "unit": "sites/s",
        "vs_baseline": round(vs_pairs, 2) if vs_pairs else None,
        "vs_baseline_of_medians": round(vs_medians, 2) if vs_medians else None,
        "stages": stages,
        "engine_runs_s": [round(t, 3) for t in times],
        "ref_runs_s": [round(t, 3) for t in ref_times],
        "pair_ratios": [round(r, 1) for r in ratios],
        "cold_runs_s": [round(t, 3) for t in cold_runs],
    }))
    sys.stderr.write(
        f"engine: {engine_sps:,.0f} sites/s ({BENCH_SITES} sites, median of "
        f"{N_RUNS}); reference 1-thread: {ref_sps:,.0f} sites/s; paired "
        f"ratio median {vs_pairs:.1f}x\n" if ref_sps
        else f"engine: {engine_sps:,.0f} sites/s; reference unavailable\n")


if __name__ == "__main__":
    main()
