"""Window planning: turn (scaffold_ids, positions) into a static window plan.

The reference streams a geno file through four generator functions that
maintain one mutable ``GenoWindow`` (/root/reference/genomics.py:1971-2223).
Because the engine holds sites as sorted dense arrays, every window is a
*contiguous span* ``[first, last)`` of the global site axis, so the whole
schedule is a small static table — which is exactly what a jit-compiled,
sharded TPU pipeline wants (fixed shapes, no data-dependent control flow).

Semantics replicated exactly:

* ``coordinate`` (slidingCoordWindows, genomics.py:1971-2028): per scaffold,
  windows ``[1+k*step, windSize+k*step]``; window k emitted for every
  k = 0..K with K the first window whose end >= the scaffold's last site
  position (empty intermediate windows ARE emitted; trailing ones are not);
  sites with pos < limits[0] are dropped (step > size gaps, :1991).
* ``sites`` (slidingSitesWindows, :2032-2108): windows of ``windSites`` sites
  with ``overlap`` retained, optional ``maxDist`` span cap, emitted when
  ``seqLen >= minSites``; on shortfall the leftmost site is trimmed and
  reading continues (:2090-2091); a sub-minSites remainder at a scaffold edge
  is dropped.
* ``predefined`` (predefinedCoordWindows, :2112-2171): one window per
  coordinates row (even if empty), sites within [start, end] of the matching
  scaffold.  Rows must be sorted by (scaffold first-appearance, start).
* ``cat`` / ``nonoverlapping`` (:2176-2223, distMat.py:316-319): whole file /
  fixed site blocks per scaffold.

Window IDs are 1-based sequential in emission order (genomics.py:2011, 2017).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class WindowPlan:
    """Static window table.

    All arrays have length n_windows.  ``first``/``last`` index the global
    site axis (half-open span).  ``start``/``end`` are the printed coordinate
    limits (for coordinate/predefined windows) or are derived from the span's
    first/last site positions (sites windows; popgenWindows.py:39).
    """

    scaffold_id: np.ndarray     # int32
    start: np.ndarray           # int64 (printed window start)
    end: np.ndarray             # int64 (printed window end)
    first: np.ndarray           # int64 site-span start (inclusive)
    last: np.ndarray            # int64 site-span end (exclusive)
    wind_type: str
    ids: list = field(default_factory=list)   # window IDs (ints or strings)

    @property
    def n_windows(self) -> int:
        return self.scaffold_id.shape[0]

    @property
    def n_sites(self) -> np.ndarray:
        return self.last - self.first

    def mid(self, positions: np.ndarray) -> np.ndarray:
        """Window midpoints: int(round(mean(positions))) with Python banker's
        rounding (GenoWindow.midPos, genomics.py:1795-1797); NaN if empty."""
        out = np.full(self.n_windows, np.nan)
        for i in range(self.n_windows):
            f, l = self.first[i], self.last[i]
            if l > f:
                out[i] = float(round(float(positions[f:l].sum()) / (l - f)))
        return out


def _scaffold_spans(scaffold_ids: np.ndarray):
    """Yield (scaf_id, span_start, span_end) for consecutive runs."""
    n = scaffold_ids.shape[0]
    if n == 0:
        return []
    change = np.flatnonzero(scaffold_ids[1:] != scaffold_ids[:-1]) + 1
    bounds = np.concatenate([[0], change, [n]])
    return [(int(scaffold_ids[bounds[k]]), int(bounds[k]), int(bounds[k + 1]))
            for k in range(bounds.size - 1)]


def filter_scaffolds(scaffold_ids: np.ndarray, scaffold_names: list[str],
                     include=None, exclude=None) -> np.ndarray:
    """Boolean keep-mask over sites for --include/--exclude scaffold lists."""
    keep = np.ones(scaffold_ids.shape[0], dtype=bool)
    if include is not None:
        inc = set(include)
        ok = np.array([name in inc for name in scaffold_names])
        keep &= ok[scaffold_ids]
    if exclude is not None:
        exc = set(exclude)
        ok = np.array([name not in exc for name in scaffold_names])
        keep &= ok[scaffold_ids]
    return keep


def plan_coordinate_windows(scaffold_ids: np.ndarray, positions: np.ndarray,
                            wind_size: int, step_size: int) -> WindowPlan:
    scafs, starts, ends, firsts, lasts = [], [], [], [], []
    for sid, s0, s1 in _scaffold_spans(scaffold_ids):
        pos = positions[s0:s1]
        p_last = int(pos[-1])
        K = max(0, -(-(p_last - wind_size) // step_size))  # ceil
        k = np.arange(K + 1, dtype=np.int64)
        w_start = 1 + k * step_size
        w_end = wind_size + k * step_size
        # span of sites in [w_start, w_end]
        f = np.searchsorted(pos, w_start, side="left") + s0
        l = np.searchsorted(pos, w_end, side="right") + s0
        scafs.append(np.full(K + 1, sid, dtype=np.int32))
        starts.append(w_start)
        ends.append(w_end)
        firsts.append(f)
        lasts.append(l)
    if not scafs:
        z = np.empty(0, np.int64)
        return WindowPlan(np.empty(0, np.int32), z, z, z, z, "coordinate", [])
    plan = WindowPlan(np.concatenate(scafs), np.concatenate(starts),
                      np.concatenate(ends), np.concatenate(firsts),
                      np.concatenate(lasts), "coordinate")
    plan.ids = list(range(1, plan.n_windows + 1))
    return plan


def plan_sites_windows(scaffold_ids: np.ndarray, positions: np.ndarray,
                       wind_sites: int, overlap: int = 0,
                       max_dist: float = np.inf,
                       min_sites: int | None = None) -> WindowPlan:
    if not min_sites:
        min_sites = wind_sites  # genomics.py:2034
    scafs, firsts, lasts = [], [], []
    for sid, s0, s1 in _scaffold_spans(scaffold_ids):
        pos = positions[s0:s1]
        m = s1 - s0
        i = 0
        while i < m:
            # extend j while seqLen < windSites and pos - firstPos <= maxDist
            if np.isinf(max_dist):
                j = min(i + wind_sites, m)
            else:
                j_cap = int(np.searchsorted(pos, pos[i] + max_dist, side="right"))
                j = min(i + wind_sites, j_cap)
            full = (j - i) == wind_sites
            at_end = j == m
            if full or at_end:
                if (j - i) >= min_sites:
                    scafs.append(sid)
                    firsts.append(s0 + i)
                    lasts.append(s0 + j)
                    if at_end:
                        break
                    i = j - overlap  # trim(leave=overlap), genomics.py:2072
                else:
                    if at_end:
                        break
                    i += 1           # trim(remove=1), genomics.py:2091
            else:
                # window capped by maxDist before filling
                if (j - i) >= min_sites:
                    scafs.append(sid)
                    firsts.append(s0 + i)
                    lasts.append(s0 + j)
                    i = j - overlap
                else:
                    i += 1
    firsts = np.array(firsts, dtype=np.int64)
    lasts = np.array(lasts, dtype=np.int64)
    scafs = np.array(scafs, dtype=np.int32)
    start = positions[firsts] if firsts.size else np.empty(0, np.int64)
    end = positions[lasts - 1] if lasts.size else np.empty(0, np.int64)
    plan = WindowPlan(scafs, np.asarray(start, np.int64), np.asarray(end, np.int64),
                      firsts, lasts, "sites")
    plan.ids = list(range(1, plan.n_windows + 1))
    return plan


def plan_predefined_windows(scaffold_ids: np.ndarray, positions: np.ndarray,
                            scaffold_names: list[str],
                            wind_coords: list) -> WindowPlan:
    """wind_coords: list of (scaffold, start, end[, ID]) rows, in file order."""
    name_to_id = {n: i for i, n in enumerate(scaffold_names)}
    spans = {sid: (s0, s1) for sid, s0, s1 in _scaffold_spans(scaffold_ids)}
    n = len(wind_coords)
    scafs = np.empty(n, dtype=np.int32)
    starts = np.empty(n, dtype=np.int64)
    ends = np.empty(n, dtype=np.int64)
    firsts = np.empty(n, dtype=np.int64)
    lasts = np.empty(n, dtype=np.int64)
    ids = []
    for i, row in enumerate(wind_coords):
        scaf, a, b = row[0], int(row[1]), int(row[2])
        ids.append(row[3] if len(row) > 3 else "NA")
        sid = name_to_id.get(scaf, -1)
        scafs[i] = sid
        starts[i] = a
        ends[i] = b
        if sid in spans:
            s0, s1 = spans[sid]
            pos = positions[s0:s1]
            firsts[i] = s0 + np.searchsorted(pos, a, side="left")
            lasts[i] = s0 + np.searchsorted(pos, b, side="right")
        else:
            firsts[i] = lasts[i] = 0
    return WindowPlan(scafs, starts, ends, firsts, lasts, "predefined", ids)


def plan_cat_window(scaffold_ids: np.ndarray, positions: np.ndarray) -> WindowPlan:
    n = positions.shape[0]
    sid = scaffold_ids[0] if n else 0
    plan = WindowPlan(np.array([sid], np.int32),
                      np.array([positions[0] if n else 0], np.int64),
                      np.array([positions[-1] if n else 0], np.int64),
                      np.array([0], np.int64), np.array([n], np.int64), "cat")
    plan.ids = [1]
    return plan


def plan_nonoverlapping_sites_windows(scaffold_ids: np.ndarray,
                                      positions: np.ndarray,
                                      wind_sites: float) -> WindowPlan:
    """Consecutive blocks of windSites sites per scaffold (genomics.py:2176-2223);
    windSites=inf reads whole scaffolds (tools genoToPlink usage)."""
    scafs, firsts, lasts = [], [], []
    for sid, s0, s1 in _scaffold_spans(scaffold_ids):
        i = s0
        step = (s1 - s0) if np.isinf(wind_sites) else int(wind_sites)
        while i < s1:
            j = min(i + step, s1)
            scafs.append(sid)
            firsts.append(i)
            lasts.append(j)
            i = j
    firsts = np.array(firsts, dtype=np.int64)
    lasts = np.array(lasts, dtype=np.int64)
    start = positions[firsts] if firsts.size else np.empty(0, np.int64)
    end = positions[lasts - 1] if lasts.size else np.empty(0, np.int64)
    plan = WindowPlan(np.array(scafs, np.int32), np.asarray(start, np.int64),
                      np.asarray(end, np.int64), firsts, lasts, "nonoverlapping")
    plan.ids = list(range(1, plan.n_windows + 1))
    return plan
