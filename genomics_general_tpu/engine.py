"""Streaming window engine: chunked parse -> incremental plan -> flush.

Replaces the ``read_all()`` + whole-genome device upload pattern with the
reference's O(window) streaming model (/root/reference/genomics.py:1971-2223
generators; freq.py:23-27 fileSlicer), re-designed for a TPU pipeline:

* a **prefetch thread** runs the chunked parser so host parsing overlaps
  device compute (the TPU analog of the reference's producer process,
  popgenWindows.py:386-421),
* an :class:`~genomics_general_tpu.windows.IncrementalPlanner` turns parsed
  sites into *certainly complete* windows as soon as the read frontier
  passes them,
* a rolling site buffer (host, and optionally a device mirror) holds only
  the sites still needed by pending/future windows — peak memory is
  O(flush batch), not O(genome),
* batches are yielded in window order, so output ordering is deterministic
  by construction (no sorter thread needed),
* per-batch progress counters and a resume cursor hang off the same loop.

Every CLI that processes windows drives this one generator; the per-batch
device compute (pair counts, allele counts) stays CLI-specific.
"""

from __future__ import annotations

import json
import os
import queue
import sys
import threading
import time
from dataclasses import dataclass

import numpy as np

from . import windows as W


# --------------------------------------------------------------- prefetch

def _prefetched(iterable, depth: int = 2):
    """Run ``iterable`` in a daemon thread, yielding items from a bounded
    queue — parse of chunk k+1 overlaps compute on chunk k."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in iterable:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # noqa: BLE001 - re-raised on main thread
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


# --------------------------------------------------------------- progress

class Progress:
    """Periodic stderr counters, the analog of the reference's ``checkStats``
    thread (popgenWindows.py:161-164) without the thread: counters print at
    most every ``interval`` seconds from the flush loop."""

    def __init__(self, verbose: bool = False, interval: float = 10.0,
                 stream=None):
        self.verbose = verbose
        self.interval = interval
        self.stream = stream or sys.stderr
        self.sites = 0
        self.windows = 0
        self.rows = 0
        self.t0 = time.perf_counter()
        self._last = self.t0

    def update(self, sites: int = 0, windows: int = 0, rows: int = 0):
        self.sites += sites
        self.windows += windows
        self.rows += rows
        now = time.perf_counter()
        if self.verbose and now - self._last >= self.interval:
            self._last = now
            self._line(now)

    def _line(self, now: float):
        dt = max(now - self.t0, 1e-9)
        self.stream.write(
            f"[progress] sites: {self.sites:,} | windows: {self.windows:,} | "
            f"rows written: {self.rows:,} | {self.sites / dt:,.0f} sites/s\n")

    def close(self):
        if self.verbose:
            self._line(time.perf_counter())


class StageTimer:
    """Accumulating per-stage wall-clock timers, grouped into pipeline
    *lanes* (threads): the parse prefetch thread, the dispatch thread
    (pack + h2d + async kernel launch), and the collect/finalize thread
    (blocking device fetch + f64 math + writes).

    Stages on different lanes run concurrently, so their sum is NOT wall
    time; within one lane stages are disjoint, so per-lane busy time is
    bounded by wall and the per-lane idle residual is non-negative by
    construction.  The bottleneck lane is the one with busy ~= wall.
    Note "d2h" is the collect thread's *blocking wait* on device results —
    with async dispatch it includes device compute time, not just the
    transfer.  Enabled by ``--profile``; reported on stderr."""

    LANES = {"parse": "parse",
             "h2d": "dispatch", "kernel": "dispatch",
             "d2h": "collect", "finalize": "collect", "write": "collect"}

    def __init__(self, enabled: bool = False):
        self.enabled = enabled
        self.t: dict[str, float] = {}
        self.t0 = time.perf_counter()

    class _Ctx:
        def __init__(self, timer, name):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.t0 = time.perf_counter()

        def __exit__(self, *exc):
            self.timer.t[self.name] = (self.timer.t.get(self.name, 0.0)
                                       + time.perf_counter() - self.t0)

    def stage(self, name: str):
        return self._Ctx(self, name)

    def split(self, wall: float | None = None) -> dict:
        """Structured stage/lane split for benchmark artifacts.

        Returns ``{"wall": w, "stages": {...}, "lanes": {lane: {"busy": b,
        "idle": w - b}}}``; idle is clamped at 0 only against clock jitter
        (each lane's stages are serial on one thread, so busy <= wall up to
        timer resolution)."""
        wall = wall if wall is not None else time.perf_counter() - self.t0
        lanes: dict[str, float] = {}
        for name, v in self.t.items():
            lane = self.LANES.get(name, name)
            lanes[lane] = lanes.get(lane, 0.0) + v
        return {
            "wall": round(wall, 4),
            "stages": {k: round(v, 4) for k, v in self.t.items()},
            "lanes": {lane: {"busy": round(b, 4),
                             "idle": round(max(wall - b, 0.0), 4)}
                      for lane, b in lanes.items()},
        }

    def report(self, stream=None, extra: str = ""):
        if not self.enabled or not self.t:
            return
        stream = stream or sys.stderr
        sp = self.split()
        wall = sp["wall"]
        lane_parts = " | ".join(
            f"{lane}: {d['busy']:.3f}s busy ({100 * d['busy'] / wall:.0f}%)"
            for lane, d in sorted(sp["lanes"].items(),
                                  key=lambda kv: -kv[1]["busy"]))
        stage_parts = " ".join(f"{k}={v:.3f}s"
                               for k, v in sorted(self.t.items(),
                                                  key=lambda kv: -kv[1]))
        stream.write(f"[profile] wall {wall:.3f}s | {lane_parts} | "
                     f"[{stage_parts}]{extra}\n")


# ----------------------------------------------------------------- cursor

class Cursor:
    """Per-(output, config) resume cursor: windows processed + byte offset.

    SURVEY §5 checkpoint/resume: the reference restarts from scratch (users
    split jobs by scaffold); here a kill-and-resume continues at the last
    flushed batch and produces byte-identical output.  Plain-text outputs
    only (a gzip stream cannot be truncated to a flush boundary and remain
    well-formed)."""

    def __init__(self, out_path: str, config_key: str):
        self.path = out_path + ".cursor"
        self.config_key = config_key

    def load(self) -> dict | None:
        try:
            with open(self.path) as f:
                st = json.load(f)
        except (OSError, ValueError):
            return None
        if st.get("config") != self.config_key:
            return None
        return st

    def save(self, windows_done: int, bytes_done: int):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"config": self.config_key, "windows_done": windows_done,
                       "bytes_done": bytes_done}, f)
        os.replace(tmp, self.path)

    def clear(self):
        try:
            os.remove(self.path)
        except OSError:
            pass


# ------------------------------------------------------------------ batches

class _SiteBuffer:
    """Rolling (alleles, positions, scaffold_ids) buffer with amortized
    growth.

    Appending a chunk copies only the chunk (doubling capacity when needed)
    instead of re-concatenating the whole buffer per chunk — on genome-scale
    streams the old ``np.concatenate`` pattern rewrote tens of MB for every
    16 MB parsed.  ``trim`` is a logical offset; the storage is compacted on
    the next growth.  Consumers get *copies* of the active span (see
    ``stream_windows.make_batch``), so compaction can never invalidate an
    in-flight batch."""

    def __init__(self, H: int, cap: int = 1 << 18):
        self.H = H
        self.alleles = np.empty((H, cap), dtype=np.int8)
        self.pos = np.empty(cap, dtype=np.int64)
        self.sids = np.empty(cap, dtype=np.int32)
        self.start = 0
        self.end = 0
        # absolute (monotone, stream-global) site index of ``start``:
        # snapshots taken on the producer thread may interleave arbitrarily
        # with trims on the consumer thread, so consumers address sites by
        # absolute index and map into a snapshot via its own abs base
        self.abs_start = 0
        # append runs on the parse/prefetch thread (the chunk copy is the
        # main thread's single biggest untimed cost on bandwidth-starved
        # hosts); trim runs on the consumer thread.  The lock serializes
        # compaction against trim; consumers never touch start/end directly
        # — they work from the snapshots append returns
        self._lock = threading.Lock()

    @property
    def n(self) -> int:
        return self.end - self.start

    def append(self, a: np.ndarray, p: np.ndarray, s: np.ndarray):
        """Append a chunk; returns a snapshot (alleles, pos, sids, start,
        end, abs_start) that is immutable for consumers: later appends only
        write past ``end``, and compaction allocates fresh arrays (old
        snapshots keep the old storage alive with unchanged contents).
        Absolute site A lives at array column start + (A - abs_start)."""
        m = p.shape[0]
        with self._lock:
            cap = self.pos.shape[0]
            if self.end + m > cap:
                # compact (and grow if the active span + chunk still won't
                # fit).  abs_start is unchanged: the same logical sites move
                # to columns [0, n).
                n = self.n
                new_cap = cap
                while new_cap < n + m:
                    new_cap *= 2
                na = np.empty((self.H, new_cap), dtype=np.int8)
                np_ = np.empty(new_cap, dtype=np.int64)
                ns = np.empty(new_cap, dtype=np.int32)
                na[:, :n] = self.alleles[:, self.start:self.end]
                np_[:n] = self.pos[self.start:self.end]
                ns[:n] = self.sids[self.start:self.end]
                self.alleles, self.pos, self.sids = na, np_, ns
                self.start, self.end = 0, n
            self.alleles[:, self.end:self.end + m] = a
            self.pos[self.end:self.end + m] = p
            self.sids[self.end:self.end + m] = s
            self.end += m
            return (self.alleles, self.pos, self.sids, self.start, self.end,
                    self.abs_start)

    def snapshot(self):
        with self._lock:
            return (self.alleles, self.pos, self.sids, self.start, self.end,
                    self.abs_start)

    def trim(self, k: int):
        with self._lock:
            self.start += k
            self.abs_start += k


@dataclass
class StreamBatch:
    """One flush of completed windows over the current rolling buffer.

    ``plan.first/last`` index the *buffer* arrays below (not the genome).
    Device upload is the consumer's job (kernels/transfer.upload_span packs
    ``alleles[:, :needed_end]`` once per flush) — a rolling device mirror
    would re-copy the whole buffer on every chunk append and trim."""

    plan: W.WindowPlan
    alleles: np.ndarray            # int8 [H, B]
    positions: np.ndarray          # int64 [B]
    scaffold_ids: np.ndarray       # int32 [B]
    scaffold_names: list[str]      # live reader list (grows as scaffolds appear)
    window_offset: int             # windows emitted before this batch
    needed_end: int = 0            # buffer sites referenced by this batch


def _concat_plans(pieces: list[W.WindowPlan], wind_type: str) -> W.WindowPlan:
    if len(pieces) == 1:
        return pieces[0]
    plan = W.WindowPlan(
        np.concatenate([p.scaffold_id for p in pieces]),
        np.concatenate([p.start for p in pieces]),
        np.concatenate([p.end for p in pieces]),
        np.concatenate([p.first for p in pieces]),
        np.concatenate([p.last for p in pieces]),
        wind_type)
    plan.ids = [i for p in pieces for i in p.ids]
    return plan


def stream_windows(reader, wind: dict, include=None, exclude=None,
                   min_flush_windows: int | None = None,
                   max_buffer_sites: int = 4 << 20,
                   progress: Progress | None = None,
                   timer: StageTimer | None = None,
                   prefetch_depth: int = 2,
                   scaffold_pred=None,
                   max_flush_windows: int | None = None):
    """Yield :class:`StreamBatch` objects in window order.

    Parameters
    ----------
    reader : io.geno.GenoReader (positioned after the header)
    wind : resolved window params (cli.common.resolve_window_args)
    min_flush_windows : batch flushes when this many windows are complete
        (or at EOF / when the buffer exceeds ``max_buffer_sites``).  The
        first flushes use smaller thresholds (1/4, then 1/2) so device
        upload+compute starts while the host is still parsing — the warmup
        ramp of the pipeline.
    scaffold_pred : optional callable(name) -> bool; scaffolds it rejects
        are dropped (multi-host input sharding — each host keeps only the
        scaffolds it owns, parallel/multihost.py).
    max_flush_windows : hard cap on windows per emitted batch; oversized
        pending plans are SPLIT into consecutive batches over the same
        buffer snapshot.  CLIs whose finalize materializes per-window
        [H, H] matrices set this from a W*H^2 memory budget so large
        cohorts never blow up host RAM (SURVEY §7 "O(N^2) distance kernel
        memory").
    """
    timer = timer or StageTimer(False)
    if min_flush_windows is None:
        min_flush_windows = int(os.environ.get("GGT_FLUSH_WINDOWS", 1024))
    if max_flush_windows is not None:
        min_flush_windows = min(min_flush_windows, max_flush_windows)
    # site-budget flush trigger: a flush also fires once the planned span
    # reaches this many sites, whatever the window count.  Per-flush wire
    # bytes scale with sites (not windows), and on the high-RTT device link
    # ~256k-site flushes (~2-3 MB wire) pipeline upload/compute/fetch far
    # better than window-count-sized ones for big coordinate windows
    # (measured: 0.42 s vs 0.70 s for the 50 kb popgen sweep)
    flush_sites = int(os.environ.get("GGT_FLUSH_SITES", 1 << 18))
    flush_schedule = [max(1, min_flush_windows // 4),
                      max(1, min_flush_windows // 2)]
    flush_count = 0
    planner = W.IncrementalPlanner(wind, reader.scaffold_names)
    inc = set(include) if include is not None else None
    exc = set(exclude) if exclude is not None else None

    H = reader.model.n_rows
    buf = _SiteBuffer(H)
    window_offset = 0
    pending: list[W.WindowPlan] = []
    pending_windows = 0

    def filter_chunk(chunk):
        if inc is None and exc is None and scaffold_pred is None:
            return chunk.alleles, chunk.positions, chunk.scaffold_ids
        names = reader.scaffold_names
        keep = np.ones(chunk.positions.shape[0], dtype=bool)
        sid_ok = np.array([(inc is None or n in inc)
                           and (exc is None or n not in exc)
                           and (scaffold_pred is None or scaffold_pred(n))
                           for n in names])
        keep &= sid_ok[chunk.scaffold_ids]
        if keep.all():
            return chunk.alleles, chunk.positions, chunk.scaffold_ids
        return (chunk.alleles[:, keep], chunk.positions[keep],
                chunk.scaffold_ids[keep])

    def chunks():
        """Producer side (prefetch thread): parse, filter AND append into
        the rolling buffer — the chunk copy is pure memory bandwidth and
        used to serialize with dispatch on the main thread.  Yields the
        post-append buffer snapshot."""
        with timer.stage("parse"):
            it = iter(reader.iter_chunks())
        while True:
            with timer.stage("parse"):
                try:
                    c = next(it)
                except StopIteration:
                    return
                a, p, s = filter_chunk(c)
                if p.size == 0:
                    continue
                snap = buf.append(a, p, s)
            yield snap, p.shape[0]

    chunk_iter = _prefetched(chunks(), depth=prefetch_depth) \
        if prefetch_depth else chunks()

    # absolute-coordinate planning state: ``consumed_abs`` is the absolute
    # index of the first site still needed by future windows, ``base_abs``
    # the absolute index the current pending plan pieces are rebased against
    # (== the buffer's abs_start after the last trim)
    consumed_abs = 0
    base_abs = 0

    def _slice_plan(plan: W.WindowPlan, a: int, b: int) -> W.WindowPlan:
        sub = W.WindowPlan(plan.scaffold_id[a:b], plan.start[a:b],
                           plan.end[a:b], plan.first[a:b], plan.last[a:b],
                           plan.wind_type)
        sub.ids = plan.ids[a:b]
        return sub

    def make_batches(snap):
        """Yield the pending plan as one batch, or several of at most
        ``max_flush_windows`` windows each (same buffer snapshot)."""
        nonlocal pending, pending_windows
        full = (_concat_plans(pending, planner.wt) if pending
                else W.IncrementalPlanner._empty(planner.wt))
        pending = []
        pending_windows = 0
        if max_flush_windows is None or \
                full.n_windows <= max_flush_windows:
            yield make_batch(snap, full)
            return
        for a in range(0, full.n_windows, max_flush_windows):
            yield make_batch(
                snap, _slice_plan(full, a, a + max_flush_windows))

    def make_batch(snap, plan) -> StreamBatch:
        nonlocal window_offset
        # pieces are in absolute coordinates; rebase to the batch view,
        # which starts at base_abs
        plan.first -= base_abs
        plan.last -= base_abs
        needed = int(plan.last.max()) if plan.n_windows else 0
        # views of the snapshot's active span, not copies: appends only
        # write past the snapshot end and compaction allocates fresh arrays,
        # so in-flight batches in the caller's dispatch/finalize overlap
        # stay coherent.  Absolute site A = snapshot column
        # start + (A - snap_abs); the snapshot always contains
        # [base_abs, base_abs + needed) because trims never pass
        # consumed_abs and pieces only reference planned sites.
        sa, sp, ss, s0, _, sabs = snap
        off = s0 + (base_abs - sabs)
        batch = StreamBatch(plan=plan, alleles=sa[:, off:off + needed],
                            positions=sp[off:off + needed],
                            scaffold_ids=ss[off:off + needed],
                            scaffold_names=reader.scaffold_names,
                            window_offset=window_offset, needed_end=needed)
        if progress:
            progress.update(windows=plan.n_windows)
        window_offset += plan.n_windows
        return batch

    def trim():
        nonlocal base_abs
        if consumed_abs > base_abs:
            buf.trim(consumed_abs - base_abs)
            base_abs = consumed_abs

    def plan_step(snap, final: bool):
        nonlocal pending, pending_windows, consumed_abs
        _, sp, ss, s0, s1, sabs = snap
        off = s0 + (consumed_abs - sabs)
        piece, keep = planner.plan(ss[off:s1], sp[off:s1], final)
        if piece.n_windows:
            piece.first += consumed_abs
            piece.last += consumed_abs
            pending.append(piece)
            pending_windows += piece.n_windows
        consumed_abs += int(keep)

    snap = buf.snapshot()
    for snap, n_new in chunk_iter:
        if progress:
            progress.update(sites=n_new)
        # plan over the new sites; flush when enough windows are ready
        plan_step(snap, final=False)
        threshold = flush_schedule[flush_count] \
            if flush_count < len(flush_schedule) else min_flush_windows
        abs_end = snap[5] + (snap[4] - snap[3])
        if (pending_windows >= threshold
                or (pending_windows and abs_end - base_abs >= flush_sites)
                or snap[4] - snap[3] > max_buffer_sites):
            flush_count += 1
            yield from make_batches(snap)
            trim()

    # EOF: finalize trailing windows (and, for predefined plans, rows for
    # scaffolds absent from the data)
    plan_step(snap, final=True)
    if pending_windows or window_offset == 0:
        yield from make_batches(snap)


def run_pipeline(batches, dispatch, finalize, skip=None, depth: int | None = None):
    """Three-stage CLI driver: parse/plan (prefetch thread inside
    ``stream_windows``) -> dispatch (this thread: pack + device upload +
    kernel launch) -> finalize (ONE consumer thread: blocking result fetch,
    float64 math, ordered writes).

    Moving finalize off the dispatch thread lets batch k's device-result
    wait overlap batch k+1's parse AND dispatch — with only two pipeline
    slots the dispatch thread used to sit blocked in ``collect`` while the
    prefetch queue filled up.  A single consumer preserves output order;
    the bounded queue (``depth``) provides backpressure so device results
    never pile up unfetched.

    ``dispatch(batch) -> args`` and ``finalize(*args)``; batches with
    ``skip(batch)`` true are dropped.  Exceptions from either side
    propagate.
    """
    if depth is None:
        # 6 in-flight flushes measured best on the high-latency device link
        # (interleaved A/B vs 3 and 10): enough slack to ride out tunnel
        # hiccups without piling device buffers up
        depth = int(os.environ.get("GGT_PIPE_DEPTH", 6))
    q: queue.Queue = queue.Queue(maxsize=depth)
    errors: list[BaseException] = []

    def worker():
        while True:
            item = q.get()
            if item is None:
                return
            if not errors:
                try:
                    finalize(*item)
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        for batch in batches:
            if errors:
                break
            if skip is not None and skip(batch):
                continue
            q.put(dispatch(batch))
    finally:
        q.put(None)
        t.join()
    if errors:
        raise errors[0]
