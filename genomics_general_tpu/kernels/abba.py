"""ABBA-BABA / f4-family window reduction on device.

The host path (stats/abbababa.py) needs per-site per-pop base counts on the
host — an O(sites) device->host fetch (80 MB per 2M sites on a ~20 MB/s
link).  This kernel moves the whole window reduction on device and fetches
only [W, n_channels] float64 sums (~100 KB), preserving the reference
semantics (/root/reference/genomics.py:1647-1695, 1585-1643):

* counts via one MXU matmul (exact integers in f32),
* freqs / per-(site,allele) f4-family terms in float64 — division and the
  term formulas are correctly-rounded IEEE ops evaluated in the reference's
  expression order, so every term is bit-identical to numpy's,
* site gate (biallelic across the union + per-pop minData) and allele
  selection (polarize / fixed / minor via stable argsort, matching
  np.argsort's insertion-sort tie behavior on 4 elements) as masks,
* per-window sums over gathered spans (lax.map chunks).  Only the summation
  *tree* differs from numpy's pairwise order — a <=1 ulp effect far below
  the 4-decimal CSV rounding; the differential golden tests gate this.

Host finalize (stats in cli/abba_windows.py) divides the fetched sums —
float64 division is exact, so D/fd/fdM/... equal the reference's values.

Requires jax_enable_x64 (the CLIs enable it; float64 on TPU is software-
emulated but IEEE for the elementwise/reduce ops used here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import transfer

# fetched channels, classic panel (ABBABABAwindows) and full panel (fourPop)
CLASSIC_CHANNELS = ("good", "used", "num_f4", "den_D", "den_fd", "den_fdm",
                    "ABBA", "BABA")
FULL_CHANNELS = CLASSIC_CHANNELS + (
    "num_f4c", "den_fhom_old", "den_fhom_new", "den_fd_new", "den_fdm_new",
    "den_fdh", "den_fdh2", "den_fh", "ABAA", "BAAA")


def _np_argsort2_lut() -> np.ndarray:
    """LUT replicating ``np.argsort(freqs)[:, 2]`` (the reference's minor-
    allele pick, genomics.py:1677) for every weak ordering of 4 values.

    numpy's small-array introsort is NOT stable on ties (e.g.
    np.argsort([.5,.5,0,0]) == [3,2,1,0]), and the reference's minor-allele
    choice inherits that tie order, so a plain stable device argsort picks
    different alleles on tied sites.  Key = base-3 code of the 6 pairwise
    comparisons (<,==,>); value = the index numpy returns at position 2.
    Validated against np.argsort on 200k tie-heavy rows."""
    import itertools
    lut = np.full(729, 0, np.int8)
    pairs = list(itertools.combinations(range(4), 2))
    for r in itertools.product(range(4), repeat=4):
        v = np.array(r, float)
        c = 0
        for k, (i, j) in enumerate(pairs):
            t = 0 if v[i] < v[j] else (1 if v[i] == v[j] else 2)
            c += t * 3 ** k
        lut[c] = np.argsort(v)[2]
    return lut


_ARGSORT2_LUT = _np_argsort2_lut()
_PAIRS_4 = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _np_minor_allele(union_freqs: jnp.ndarray) -> jnp.ndarray:
    """Device replica of np.argsort(union_freqs, axis=1)[:, 2] including
    numpy's tie order (rows containing NaN are garbage — callers mask them
    via the biallelic gate, which excludes all-missing sites)."""
    code = jnp.zeros(union_freqs.shape[0], dtype=jnp.int32)
    p3k = 1
    for (i, j) in _PAIRS_4:
        a, b = union_freqs[:, i], union_freqs[:, j]
        trit = jnp.where(a < b, 0, jnp.where(a == b, 1, 2))
        code = code + trit * p3k
        p3k *= 3
    return jnp.asarray(_ARGSORT2_LUT)[code]


def _f4(p1, p2, p3, p4):
    return (1 - p1) * p2 * p3 * (1 - p4) - p1 * (1 - p2) * p3 * (1 - p4)


def _f4c(p1, p2, p3, p4):
    return _f4(p1, p2, p3, p4) + _f4(1 - p1, 1 - p2, 1 - p3, 1 - p4)


def _site_terms(freqs, union_freqs, nonmiss, n_pops, min_data, mode, full):
    """Per-(site, allele) term channels, masked by site gate + allele
    selection.  freqs: [S, 4pops, 4alleles] f64; union_freqs: [S, 4] f64;
    nonmiss: [S, 5] f64 called-haplotype counts (4 pops + union)."""
    S = freqs.shape[0]
    p1, p2, p3, p4 = (freqs[:, k, :] for k in range(4))

    # site gate: biallelic across the union + per-pop minData
    # (genomics.py:1655-1660)
    union_counts_pos = union_freqs > 0
    biallelic = union_counts_pos.sum(axis=1) == 2
    enough = jnp.ones(S, dtype=bool)
    for k in range(4):
        enough &= (nonmiss[:, k] / n_pops[k]) >= min_data
    good = biallelic & enough                               # [S]

    # allele selection (genomics.py:1672-1677)
    if mode == "polarize":
        sel = union_counts_pos & (p4 == 0)
    elif mode == "fixed":
        sel = (union_counts_pos & (p4 == 0)
               & ((p1 == 0) | (p1 == 1))
               & ((p2 == 0) | (p2 == 1))
               & ((p3 == 0) | (p3 == 1)))
    else:                                                   # minor allele
        sel = jax.nn.one_hot(_np_minor_allele(union_freqs), 4, dtype=bool)
    sel = sel & good[:, None]                               # [S, 4]

    def masked(term):
        return jnp.where(sel, term, 0.0)

    abba = (1 - p1) * p2 * p3 * (1 - p4)
    baba = p1 * (1 - p2) * p3 * (1 - p4)
    num_f4 = _f4(p1, p2, p3, p4)
    pd = p2 * (p2 > p3) + p3 * (p3 >= p2)
    den_fd = _f4(p1, pd, pd, p4)
    a = p3 > p1
    b = p3 > p2
    x = p1 > p2
    y = ~x
    pdm1 = p3 * (x & a) + p1 * (~(x & a))
    pdm2 = p3 * (y & b) + p2 * (~(y & b))
    pdm3 = -p3 * (x & a) + p3 * (y & b) - p1 * (x & ~a) + p2 * (y & ~b)
    den_fdm = _f4(pdm1, pdm2, pdm3, p4)

    chans = [
        jnp.where(good, 1.0, 0.0)[:, None] * jnp.ones((1, 4)) / 4.0,  # good
        jnp.where(sel, 1.0, 0.0),                                      # used
        masked(num_f4), masked(abba + baba), masked(den_fd),
        masked(den_fdm), masked(abba), masked(baba)]
    if full:
        num_f4c = _f4c(p1, p2, p3, p4)
        t11 = _f4c(p1, p3, p3, p4)
        t12 = _f4c(p4, p2, p3, p4)
        t21 = _f4c(p3, p2, p3, p4)
        t22 = _f4c(p1, p4, p3, p4)
        den_fdh = jnp.maximum(jnp.maximum(t11, t12), jnp.maximum(t21, t22))
        t31 = _f4c(p1, p2, p2, p4)
        t32 = _f4c(p1, p2, p3, p1)
        t41 = _f4c(p1, p2, p1, p4)
        t42 = _f4c(p1, p2, p3, p2)
        den_fdh2 = jnp.maximum(den_fdh,
                               jnp.maximum(jnp.maximum(t31, t32),
                                           jnp.maximum(t41, t42)))
        t1 = jnp.abs(p1 - p2)
        t2 = jnp.abs(p3 - p4)
        den_fh = (t1 * (t1 > t2) + t2 * (t2 >= t1)) ** 2
        abaa = (1 - p1) * p2 * (1 - p3) * (1 - p4)
        baaa = p1 * (1 - p2) * (1 - p3) * (1 - p4)
        den_fdm_new = _f4c(pdm1, pdm2, pdm3, p4)
        chans += [masked(num_f4c), masked(_f4(p1, p3, p3, p4)),
                  masked(_f4c(p1, p3, p3, p4)), masked(_f4c(p1, pd, pd, p4)),
                  masked(den_fdm_new), masked(den_fdh), masked(den_fdh2),
                  masked(den_fh), masked(abaa), masked(baaa)]
    # [S, K]: sum over the allele axis here; the (site, allele) sum order
    # differs from numpy's flattened pairwise sum by <=1 ulp regardless
    return jnp.stack([c.sum(axis=1) for c in chans], axis=1)


@functools.partial(jax.jit, static_argnames=("sp", "h", "wp", "s_max",
                                             "chunk", "mode", "full"))
def fused_abba_flush(buf, pop_mask, n_pops, min_data,
                     sp: int, h: int, wp: int, s_max: int, chunk: int,
                     mode: str, full: bool):
    """One-transfer flush kernel: wire buffer in, [wp, K] float64 sums out."""
    from .counts import site_pop_counts
    alleles, fi, ns = transfer.unpack_flush_buffer(buf, sp, h, wp)
    counts = site_pop_counts(alleles, pop_mask).astype(jnp.float64)  # [sp,5,4]
    nonmiss = counts.sum(axis=2)                                     # [sp,5]
    with np.errstate(invalid="ignore"):
        freqs = counts / nonmiss[:, :, None]       # NaN rows where nonmiss==0
    site_terms = _site_terms(freqs[:, :4, :], freqs[:, 4, :],
                             nonmiss, n_pops, min_data, mode, full)  # [sp,K]

    def one(args):
        f, n = args
        offs = jnp.arange(s_max, dtype=jnp.int32)
        idx = f[:, None] + offs[None, :]
        valid = offs[None, :] < n[:, None]
        idx = jnp.where(valid, idx, 0)
        t = site_terms[idx]                        # [chunk, s_max, K]
        t = jnp.where(valid[:, :, None], t, 0.0)
        return t.sum(axis=1)                       # [chunk, K]

    n_ch = wp // chunk
    out = jax.lax.map(one, (fi.reshape(n_ch, chunk), ns.reshape(n_ch, chunk)))
    return out.reshape(wp, -1)


@functools.lru_cache(maxsize=8)
def _sharded_fused_abba_flush(mesh):
    """Data-parallel variant: window batch sharded over the mesh's ``data``
    axis, site terms replicated (SURVEY §2.10 DP)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, static_argnames=("sp", "h", "wp", "s_max",
                                                 "chunk", "mode", "full"),
                       out_shardings=batch)
    def fn(buf, pop_mask, n_pops, min_data, sp, h, wp, s_max, chunk,
           mode, full):
        from .counts import site_pop_counts
        alleles, fi, ns = transfer.unpack_flush_buffer(buf, sp, h, wp)
        fi = jax.lax.with_sharding_constraint(fi, batch)
        ns = jax.lax.with_sharding_constraint(ns, batch)
        counts = site_pop_counts(alleles, pop_mask).astype(jnp.float64)
        nonmiss = counts.sum(axis=2)
        freqs = counts / nonmiss[:, :, None]
        site_terms = _site_terms(freqs[:, :4, :], freqs[:, 4, :],
                                 nonmiss, n_pops, min_data, mode, full)

        def one(args):
            f, n = args
            offs = jnp.arange(s_max, dtype=jnp.int32)
            idx = f[:, None] + offs[None, :]
            valid = offs[None, :] < n[:, None]
            idx = jnp.where(valid, idx, 0)
            t = site_terms[idx]
            t = jnp.where(valid[:, :, None], t, 0.0)
            return t.sum(axis=1)

        n_ch = wp // chunk
        out = jax.lax.map(one, (fi.reshape(n_ch, chunk),
                                ns.reshape(n_ch, chunk)))
        return out.reshape(wp, -1)

    return fn


class AbbaSumsHandle:
    def __init__(self, W: int, channels: tuple, pending):
        self.W, self.channels, self.pending = W, channels, pending

    def collect(self) -> np.ndarray:
        """[W, K] float64 window sums."""
        if self.pending is None:
            return np.zeros((0, len(self.channels)))
        return np.asarray(self.pending)[:self.W]


def host_window_abba_sums(alleles: np.ndarray, first: np.ndarray,
                          n_sites: np.ndarray, membership: np.ndarray,
                          n_pops, min_data: float, mode: str,
                          full: bool) -> np.ndarray:
    """Host executor for the fused ABBA window reduction: same [W, K]
    float64 sums as :func:`fused_abba_flush`, computed with C per-site pop
    counts + numpy float64 terms on gate-compacted sites — zero device
    transfers (the device wire is O(sites * haplotypes) and dominates on a
    degraded link; host cost is O(sites * pop_sizes) count increments).

    ``membership``: uint8 [H] bitmask (bits 0-3 = P1..P4, bit 4 = union).
    Formula expressions mirror :func:`_site_terms` literally — float64
    elementwise ops are correctly rounded, so per-site terms are identical;
    only the per-window summation tree can differ by ulps (sequential numpy
    sums here, which for windows under numpy's 128-element pairwise block
    ARE np.sum's order)."""
    import os

    from ..io import native
    S = alleles.shape[1]
    W = first.shape[0]
    K = len(FULL_CHANNELS) if full else len(CLASSIC_CHANNELS)
    counts = None
    if os.environ.get("GGT_NO_NATIVE_PARSER") != "1":
        counts = native.site_pop_counts_host_native(alleles, membership)
    if counts is None:
        counts = np.zeros((S, 5, 4), np.int32)
        for p in range(5):
            sub = alleles[np.flatnonzero(membership & (1 << p))]
            for c in range(4):
                counts[:, p, c] = (sub == c).sum(axis=0)
    # gate on the integer counts; only gated sites convert to float64
    # (the full [S, 5, 4] f64 conversion was ~40 MB of traffic per flush)
    nonmiss_i = counts.sum(axis=2, dtype=np.int32)    # [S, 5]
    biallelic = (counts[:, 4, :] > 0).sum(axis=1) == 2
    enough = np.ones(S, dtype=bool)
    n_pops = np.asarray(n_pops, dtype=np.float64)
    for k in range(4):
        enough &= (nonmiss_i[:, k] / n_pops[k]) >= min_data
    good = biallelic & enough
    g = np.flatnonzero(good)
    # selection on [Sg, 4], then FLATTEN to the selected (site, allele)
    # pair list: every term below runs on 1-D [E] arrays (typically ~1
    # pair/site), which cuts the elementwise-temporary traffic ~4x vs
    # computing all 4 allele columns and masking — this stage is memory-
    # bandwidth-bound on the host
    terms = np.zeros((0, K - 2), np.float64)
    si = np.zeros(0, np.int64)
    if g.size:
        cg = counts[g].astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            freqs = cg / nonmiss_i[g].astype(np.float64)[:, :, None]
        ucp = cg[:, 4, :] > 0
        P1, P2, P3, P4 = (freqs[:, k, :] for k in range(4))
        if mode == "polarize":
            sel = ucp & (P4 == 0)
        elif mode == "fixed":
            sel = (ucp & (P4 == 0)
                   & ((P1 == 0) | (P1 == 1))
                   & ((P2 == 0) | (P2 == 1))
                   & ((P3 == 0) | (P3 == 1)))
        else:                                         # minor allele
            mi = np.argsort(freqs[:, 4, :], axis=1)[:, 2]
            sel = np.zeros((g.size, 4), dtype=bool)
            sel[np.arange(g.size), mi] = True
        si, ai = np.nonzero(sel)                      # sorted by site
        p1 = P1[si, ai]
        p2 = P2[si, ai]
        p3 = P3[si, ai]
        p4 = P4[si, ai]
        with np.errstate(invalid="ignore"):
            q1, q2, q3, q4 = 1 - p1, 1 - p2, 1 - p3, 1 - p4
            abba = q1 * p2 * p3 * q4
            baba = p1 * q2 * p3 * q4
            num_f4 = abba - baba                      # == _f4(p1,p2,p3,p4)
            pd = p2 * (p2 > p3) + p3 * (p3 >= p2)
            den_fd = _f4(p1, pd, pd, p4)
            a = p3 > p1
            b = p3 > p2
            x = p1 > p2
            y = ~x
            pdm1 = p3 * (x & a) + p1 * (~(x & a))
            pdm2 = p3 * (y & b) + p2 * (~(y & b))
            pdm3 = -p3 * (x & a) + p3 * (y & b) - p1 * (x & ~a) \
                + p2 * (y & ~b)
            den_fdm = _f4(pdm1, pdm2, pdm3, p4)
            chans = [num_f4, abba + baba, den_fd, den_fdm, abba, baba]
            if full:
                num_f4c = _f4c(p1, p2, p3, p4)
                t11 = _f4c(p1, p3, p3, p4)
                t12 = _f4c(p4, p2, p3, p4)
                t21 = _f4c(p3, p2, p3, p4)
                t22 = _f4c(p1, p4, p3, p4)
                den_fdh = np.maximum(np.maximum(t11, t12),
                                     np.maximum(t21, t22))
                t31 = _f4c(p1, p2, p2, p4)
                t32 = _f4c(p1, p2, p3, p1)
                t41 = _f4c(p1, p2, p1, p4)
                t42 = _f4c(p1, p2, p3, p2)
                den_fdh2 = np.maximum(den_fdh,
                                      np.maximum(np.maximum(t31, t32),
                                                 np.maximum(t41, t42)))
                t1 = np.abs(p1 - p2)
                t2 = np.abs(p3 - p4)
                den_fh = (t1 * (t1 > t2) + t2 * (t2 >= t1)) ** 2
                abaa = q1 * p2 * q3 * q4
                baaa = p1 * q2 * q3 * q4
                den_fdm_new = _f4c(pdm1, pdm2, pdm3, p4)
                chans += [num_f4c, _f4(p1, p3, p3, p4),
                          _f4c(p1, p3, p3, p4), _f4c(p1, pd, pd, p4),
                          den_fdm_new, den_fdh, den_fdh2, den_fh,
                          abaa, baaa]
            terms = np.stack(chans, axis=1)           # [E, K-2]

    out = np.zeros((W, K), np.float64)
    last = first + n_sites
    e0 = np.searchsorted(g, first)                    # gated sites / window
    e1 = np.searchsorted(g, last)
    pair_site = g[si]                                 # [E] global site index
    ee0 = np.searchsorted(pair_site, first)
    ee1 = np.searchsorted(pair_site, last)
    out[:, 0] = e1 - e0                               # "good"
    out[:, 1] = ee1 - ee0                             # "used"
    for w in range(W):
        if ee1[w] > ee0[w]:
            out[w, 2:] = terms[ee0[w]:ee1[w]].sum(axis=0)
    return out


def window_abba_sums_dispatch(alleles: np.ndarray, first: np.ndarray,
                              n_sites: np.ndarray, pop_mask: np.ndarray,
                              n_pops, min_data: float, mode: str,
                              full: bool, mesh=None) -> AbbaSumsHandle:
    """Dispatch the fused ABBA window reduction for one flush (host span).

    One H2D transfer (packed planes + window metadata) and one D2H transfer
    ([W, K] float64) per flush.  With a ``mesh`` the window batch is sharded
    data-parallel over its devices."""
    channels = FULL_CHANNELS if full else CLASSIC_CHANNELS
    W = first.shape[0]
    H = alleles.shape[0]
    if W == 0 or H == 0:
        return AbbaSumsHandle(W, channels, None)
    if mesh is None and isinstance(alleles, np.ndarray):
        from .pairdist import _exec_choice
        if _exec_choice(H) == "host":
            membership = ((pop_mask[:4] > 0).astype(np.uint8)
                          * (1 << np.arange(4, dtype=np.uint8))[:, None]
                          ).sum(axis=0).astype(np.uint8)
            membership |= (pop_mask[4] > 0).astype(np.uint8) << 4
            return AbbaSumsHandle(W, channels, host_window_abba_sums(
                alleles, first, n_sites, membership, n_pops, min_data,
                mode, full))
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    wp = max(8, n_dev)
    while wp < W:
        wp *= 2
    buf, Sp = transfer.pack_flush_buffer(alleles, first, n_sites, wp)
    s_need = max(int(n_sites.max()), 1)
    s_max = 1024
    while s_max < s_need:
        s_max *= 2
    s_max = min(s_max, Sp)
    # chunk must DIVIDE wp (the kernel reshapes [wp] -> [wp//chunk, chunk]);
    # wp is n_dev * 2^k, so for non-power-of-two device counts step down
    # until it divides (e.g. n_dev=12, wp=192 -> chunk 64, not 128)
    chunk = min(wp, 128)
    while chunk > 1 and wp % chunk:
        chunk //= 2
    while chunk > 8 and chunk * s_max > (1 << 24):
        chunk //= 2
    fn = _sharded_fused_abba_flush(mesh) if mesh is not None \
        else fused_abba_flush
    out = fn(jax.device_put(buf), jnp.asarray(pop_mask),
             jnp.asarray(np.asarray(n_pops, np.float64)),
             jnp.float64(min_data),
             Sp, H, wp, int(s_max), chunk, mode, full)
    return AbbaSumsHandle(W, channels, out)


def finalize_window_stats(sums: np.ndarray, channels: tuple,
                          full: bool) -> list[dict]:
    """Reference window stats from the fetched sums (float64 divisions are
    exact, so ratios equal the reference's ratio-of-sums).  Returns one dict
    per window, matching stats/abbababa.py window_four_pop_panel keys."""
    from ..stats.abbababa import ABBABABA_STATS, FOURPOP_STATS
    idx = {c: k for k, c in enumerate(channels)}
    out = []
    stats_names = FOURPOP_STATS if full else ABBABABA_STATS
    with np.errstate(invalid="ignore", divide="ignore"):
        for w in range(sums.shape[0]):
            s = sums[w]
            if s[idx["good"]] < 0.5:       # no gated sites: reference NaN row
                out.append(dict(zip(stats_names,
                                    [np.nan] * (len(stats_names) - 1) + [0])))
                continue
            used = int(round(s[idx["used"]]))
            num = s[idx["num_f4"]]
            vals = {
                "D": num * 1.0 / s[idx["den_D"]],
                "fd": num * 1.0 / s[idx["den_fd"]],
                "fdM": num * 1.0 / s[idx["den_fdm"]],
                "fdm": num * 1.0 / s[idx["den_fdm"]],
                "ABBA": s[idx["ABBA"]],
                "BABA": s[idx["BABA"]],
                "sitesUsed": used,
            }
            if full:
                numc = s[idx["num_f4c"]]
                vals.update({
                    "fhom": num * 1.0 / s[idx["den_fhom_old"]],
                    "fhom'": numc * 1.0 / s[idx["den_fhom_new"]],
                    "fd'": numc * 1.0 / s[idx["den_fd_new"]],
                    "fdm'": numc * 1.0 / s[idx["den_fdm_new"]],
                    "fdh": numc * 1.0 / s[idx["den_fdh"]],
                    "fdh2": numc * 1.0 / s[idx["den_fdh2"]],
                    "fh": numc * 1.0 / s[idx["den_fh"]],
                    "ABAA": s[idx["ABAA"]],
                    "BAAA": s[idx["BAAA"]],
                })
            out.append({k: vals[k] for k in stats_names})
    return out
