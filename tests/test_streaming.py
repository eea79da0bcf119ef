"""Streaming engine: incremental planner == batch planner, bounded buffers.

The IncrementalPlanner must emit exactly the windows the batch planners emit
(same order, same coordinate limits, same site spans) for every window type,
chunking pattern, and scaffold layout — and the rolling buffer must stay
bounded (O(flush), not O(genome))."""

import io

import numpy as np
import pytest

from genomics_general_tpu import engine
from genomics_general_tpu import windows as W
from genomics_general_tpu.io import geno as geno_io
from genomics_general_tpu.samples import SampleData


def synth_sites(n_scaf=3, sites_per=400, seed=0, max_gap=400):
    rng = np.random.default_rng(seed)
    sids, pos = [], []
    for s in range(n_scaf):
        n = sites_per + int(rng.integers(-sites_per // 3, sites_per // 3))
        p = np.cumsum(rng.integers(1, max_gap, size=n))
        sids.append(np.full(n, s, dtype=np.int32))
        pos.append(p.astype(np.int64))
    return np.concatenate(sids), np.concatenate(pos)


def run_incremental(wind, sids, pos, chunk_sites, scaffold_names=None):
    names = scaffold_names or [f"scaf{i}" for i in range(int(sids.max()) + 1)]
    planner = W.IncrementalPlanner(wind, names)
    buf_s = np.empty(0, np.int32)
    buf_p = np.empty(0, np.int64)
    out = []          # rows (sid, start, end, n_sites, first_pos, last_pos)
    max_buf = 0
    n = pos.shape[0]
    for c0 in range(0, n, chunk_sites):
        c1 = min(c0 + chunk_sites, n)
        buf_s = np.concatenate([buf_s, sids[c0:c1]])
        buf_p = np.concatenate([buf_p, pos[c0:c1]])
        piece, keep = planner.plan(buf_s, buf_p, final=False)
        out.extend(collect(piece, buf_p))
        max_buf = max(max_buf, buf_p.size)
        buf_s, buf_p = buf_s[keep:], buf_p[keep:]
    piece, keep = planner.plan(buf_s, buf_p, final=True)
    out.extend(collect(piece, buf_p))
    return out, max_buf


def collect(piece, positions):
    rows = []
    for w in range(piece.n_windows):
        f, l = int(piece.first[w]), int(piece.last[w])
        rows.append((int(piece.scaffold_id[w]), int(piece.start[w]),
                     int(piece.end[w]), l - f,
                     int(positions[f]) if l > f else -1,
                     int(positions[l - 1]) if l > f else -1))
    return rows


def batch_rows(plan, positions):
    return collect(plan, positions)


@pytest.mark.parametrize("chunk_sites", [1, 7, 50, 333, 10_000])
@pytest.mark.parametrize("wsize,step", [(5000, 5000), (5000, 2000), (2000, 5000)])
def test_coordinate_equivalence(chunk_sites, wsize, step):
    sids, pos = synth_sites()
    wind = {"windType": "coordinate", "windSize": wsize, "stepSize": step,
            "minSites": 1}
    inc, _ = run_incremental(wind, sids, pos, chunk_sites)
    ref = batch_rows(W.plan_coordinate_windows(sids, pos, wsize, step), pos)
    assert inc == ref


@pytest.mark.parametrize("chunk_sites", [1, 13, 100, 10_000])
@pytest.mark.parametrize("wsites,overlap,maxd,mins", [
    (50, 0, np.inf, None), (50, 10, np.inf, None), (50, 0, 5000, 25),
    (50, 25, 2000, 10), (64, 0, np.inf, 64)])
def test_sites_equivalence(chunk_sites, wsites, overlap, maxd, mins):
    sids, pos = synth_sites(seed=3)
    wind = {"windType": "sites", "windSize": wsites, "overlap": overlap,
            "maxDist": maxd, "minSites": mins or wsites}
    inc, _ = run_incremental(wind, sids, pos, chunk_sites)
    ref = batch_rows(
        W.plan_sites_windows(sids, pos, wsites, overlap, maxd, mins), pos)
    assert inc == ref


@pytest.mark.parametrize("chunk_sites", [1, 17, 10_000])
def test_predefined_equivalence(chunk_sites):
    sids, pos = synth_sites(seed=5)
    names = ["scaf0", "scaf1", "scaf2"]
    # rows sorted by (scaffold appearance, start); include an absent scaffold
    # and out-of-range rows
    rows = []
    for s in range(3):
        p = pos[sids == s]
        for a in range(100, int(p[-1]) + 5000, 7000):
            rows.append((names[s], a, a + 4999, f"w{s}_{a}"))
    rows.insert(4, ("ghost", 1, 1000, "ghost1"))
    wind = {"windType": "predefined", "windCoords": rows, "minSites": 1}
    inc, _ = run_incremental(wind, sids, pos, chunk_sites, names)
    ref = batch_rows(
        W.plan_predefined_windows(sids, pos, names, rows), pos)
    assert inc == ref


def test_buffer_stays_bounded():
    sids, pos = synth_sites(n_scaf=1, sites_per=50_000, seed=1, max_gap=50)
    wind = {"windType": "coordinate", "windSize": 5000, "stepSize": 5000,
            "minSites": 1}
    _, max_buf = run_incremental(wind, sids, pos, chunk_sites=1000)
    # one window is ~100 sites at this density; the buffer must hold only
    # the open window + one chunk, never a large fraction of the input
    assert max_buf < 5000, max_buf


def geno_text(n_sites=2000, n_ind=4, seed=0):
    rng = np.random.default_rng(seed)
    names = [f"ind{i}" for i in range(n_ind)]
    lines = ["#CHROM\tPOS\t" + "\t".join(names)]
    pos = 0
    scaf = 1
    bases = "ACGT"
    for i in range(n_sites):
        pos += int(rng.integers(1, 200))
        if i and i % 700 == 0:
            scaf += 1
            pos = int(rng.integers(1, 100))
        gts = []
        for _ in range(n_ind):
            if rng.random() < 0.05:
                gts.append("N/N")
            else:
                gts.append(f"{bases[rng.integers(0, 4)]}/{bases[rng.integers(0, 4)]}")
        lines.append(f"scaf{scaf}\t{pos}\t" + "\t".join(gts))
    return "\n".join(lines) + "\n", names


@pytest.mark.parametrize("chunk_bytes", [256, 4096, 1 << 20])
def test_stream_windows_matches_read_all(chunk_bytes):
    text, names = geno_text()
    sd = SampleData(ind_names=list(names))
    reader = geno_io.GenoReader(io.BytesIO(text.encode()), sample_data=sd,
                                geno_format="phased", chunk_bytes=chunk_bytes)
    wind = {"windType": "coordinate", "windSize": 5000, "stepSize": 5000,
            "minSites": 1}
    got = []
    max_buf = 0
    for batch in engine.stream_windows(reader, wind, min_flush_windows=8):
        max_buf = max(max_buf, batch.positions.size)
        plan = batch.plan
        for w in range(plan.n_windows):
            f, l = int(plan.first[w]), int(plan.last[w])
            got.append((batch.scaffold_names[plan.scaffold_id[w]],
                        int(plan.start[w]), int(plan.end[w]), l - f,
                        batch.alleles[:, f:l].tobytes(),
                        batch.positions[f:l].tobytes()))

    reader2 = geno_io.GenoReader(io.BytesIO(text.encode()), sample_data=sd,
                                 geno_format="phased")
    data = reader2.read_all()
    plan = W.plan_coordinate_windows(data.scaffold_ids, data.positions,
                                     5000, 5000)
    ref = []
    for w in range(plan.n_windows):
        f, l = int(plan.first[w]), int(plan.last[w])
        ref.append((data.scaffold_names[plan.scaffold_id[w]],
                    int(plan.start[w]), int(plan.end[w]), l - f,
                    data.alleles[:, f:l].tobytes(),
                    data.positions[f:l].tobytes()))
    assert got == ref
    if chunk_bytes <= 4096:
        assert max_buf < data.positions.size // 2
