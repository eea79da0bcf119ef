"""Host->device upload of allele matrices (bit-packed by default).

The allele matrix is int8 [H, S] with values in {-1, 0, 1, 2, 3}.  Two upload
strategies:

* **packed** (default): two bit-planes, 2.67x fewer wire bytes, unpacked on
  device with shift/compare ops:

    - ``codes``: 2-bit allele codes, 4 sites/byte  (uint8 [H, ceil(S/4)])
    - ``miss`` : 1-bit missing mask, 8 sites/byte  (uint8 [H, ceil(S/8)])

  The target host reaches the device through a tunnel measured at only
  ~60-75 MB/s H2D with ~24 ms round-trip latency, so wire bytes dominate the
  upload cost and packing wins decisively (host packing is a few numpy passes
  at GB/s).
* **raw** (opt-out via ``GGT_PACKED_TRANSFER=0``): one ``jax.device_put`` of
  the int8 matrix.  Only faster on links above a few hundred MB/s.

All kernels keep operating on the plain int8 [H, S] device array either way.

``upload_span`` additionally pads the site axis to a power-of-two bucket so
downstream jitted kernels see a small closed set of shapes (no steady-state
recompilation as streaming flush spans vary).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np


def pack_alleles(alleles: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
    """Pack int8 [H, S] (values -1..3) into (codes, miss, S) planes."""
    H, S = alleles.shape
    # contract: only {-1, 0..3} survive the 2-bit pack; anything else (e.g. a
    # stray parser poison value) would silently alias to a valid allele
    assert alleles.min(initial=0) >= -1 and alleles.max(initial=-1) <= 3, \
        "pack_alleles requires codes in {-1, 0..3}"
    s4 = -(-S // 4) * 4
    codes = np.ascontiguousarray(alleles).view(np.uint8) & 3
    if s4 != S:
        codes = np.concatenate(
            [codes, np.zeros((H, s4 - S), np.uint8)], axis=1)
    c = codes.reshape(H, s4 // 4, 4)
    packed_codes = (c[:, :, 0] | (c[:, :, 1] << 2) |
                    (c[:, :, 2] << 4) | (c[:, :, 3] << 6))
    miss = np.packbits(alleles < 0, axis=1, bitorder="little")
    return np.ascontiguousarray(packed_codes), miss, S


@functools.partial(jax.jit, static_argnames=("s",))
def _unpack(codes: jnp.ndarray, miss: jnp.ndarray, s: int) -> jnp.ndarray:
    H = codes.shape[0]
    shifts2 = jnp.arange(4, dtype=jnp.uint8) * 2
    c = (codes[:, :, None] >> shifts2[None, None, :]) & 3       # [H, S/4, 4]
    c = c.reshape(H, -1)[:, :s].astype(jnp.int8)
    shifts1 = jnp.arange(8, dtype=jnp.uint8)
    m = (miss[:, :, None] >> shifts1[None, None, :]) & 1        # [H, S/8, 8]
    m = m.reshape(H, -1)[:, :s]
    return jnp.where(m == 1, jnp.int8(-1), c)


def _packed_enabled() -> bool:
    return os.environ.get("GGT_PACKED_TRANSFER", "1") != "0"


def device_alleles(alleles: np.ndarray, sharding=None) -> jnp.ndarray:
    """Upload an int8 [H, S] allele matrix and return the int8 device array.

    Bit-packed by default (see module docstring); set
    ``GGT_PACKED_TRANSFER=0`` to ship the raw int8 matrix instead.
    ``sharding`` optionally places the array (e.g. replicated over a mesh).
    """
    H, S = alleles.shape
    if S == 0 or H == 0 or not _packed_enabled():
        return jax.device_put(alleles, sharding)
    codes, miss, s = pack_alleles(alleles)
    out = _unpack(jax.device_put(codes), jax.device_put(miss), s)
    return jax.device_put(out, sharding) if sharding is not None else out


def _bucket_sites(S: int, min_bucket: int = 1 << 16) -> int:
    """Round S up to a small closed set of site-axis lengths so jitted
    consumers do not recompile per flush: powers of two up to ``min_bucket``,
    then 8 steps per octave (pad-upload waste <= 12.5% — pad bytes ride the
    slow wire too — while compile count stays bounded at 8 per size octave,
    amortized by the persistent compilation cache)."""
    b = min_bucket
    while b < S:
        b <<= 1
    if b <= min_bucket:
        return b
    step = b >> 3
    return -(-S // step) * step


def pack_span(alleles: np.ndarray, min_bucket: int = 1 << 16) -> tuple[np.ndarray, int]:
    """Pack a host int8 [H, S] span into ONE flat uint8 wire buffer
    ``[codes H x Sp/4 | miss H x Sp/8]`` with the site axis padded to a
    power-of-two bucket Sp (pad sites = missing).

    One buffer => one ``device_put`` => one wire transfer: the target link
    has ~13-25 ms fixed cost per transfer, so transfer *count* matters as
    much as bytes.  Returns (buffer, Sp).
    """
    H, S = alleles.shape
    Sp = _bucket_sites(max(S, 1), min_bucket)
    codes, miss, _ = pack_alleles(alleles)
    c4, m8 = Sp // 4, Sp // 8
    buf = np.empty(H * (c4 + m8), dtype=np.uint8)
    cview = buf[:H * c4].reshape(H, c4)
    mview = buf[H * c4:].reshape(H, m8)
    cview[:, :codes.shape[1]] = codes
    cview[:, codes.shape[1]:] = 0
    mview[:, :miss.shape[1]] = miss
    mview[:, miss.shape[1]:] = 0xFF          # pad sites are missing
    # real sites S..8*ceil(S/8) inside the last miss byte: mark missing too
    rem = S % 8
    if rem and m8 > S // 8:
        mview[:, S // 8] |= (0xFF << rem) & 0xFF
    return buf, Sp


@functools.partial(jax.jit, static_argnames=("sp", "h"))
def unpack_span(buf: jnp.ndarray, sp: int, h: int) -> jnp.ndarray:
    """Device-side inverse of :func:`pack_span`: int8 [h, sp]."""
    c4, m8 = sp // 4, sp // 8
    codes = buf[:h * c4].reshape(h, c4)
    miss = buf[h * c4:h * (c4 + m8)].reshape(h, m8)
    return _unpack(codes, miss, sp)


@functools.lru_cache(maxsize=8)
def _unpack_span_sharded(mesh):
    """unpack_span variant whose output is replicated over a mesh."""
    from jax.sharding import NamedSharding, PartitionSpec
    repl = NamedSharding(mesh, PartitionSpec())

    @functools.partial(jax.jit, static_argnames=("sp", "h"),
                       out_shardings=repl)
    def fn(buf, sp, h):
        c4, m8 = sp // 4, sp // 8
        codes = buf[:h * c4].reshape(h, c4)
        miss = buf[h * c4:h * (c4 + m8)].reshape(h, m8)
        return _unpack(codes, miss, sp)

    return fn


def pack_flush_buffer(alleles: np.ndarray, first: np.ndarray,
                      n_sites: np.ndarray, wp: int,
                      min_bucket: int = 1 << 16):
    """One wire buffer for a whole flush: packed allele planes + window
    metadata ``[planes | first int32[wp] | n_sites int32[wp]]``.
    Returns (buffer uint8 [.], Sp)."""
    span_buf, Sp = pack_span(alleles, min_bucket)
    W = first.shape[0]
    meta = np.zeros(2 * wp, np.int32)
    meta[:W] = first
    meta[wp:wp + W] = n_sites
    return np.concatenate([span_buf, meta.view(np.uint8)]), Sp


def unpack_flush_buffer(buf: jnp.ndarray, sp: int, h: int, wp: int):
    """Device-side inverse of :func:`pack_flush_buffer`:
    (alleles int8 [h, sp], first int32 [wp], n_sites int32 [wp])."""
    base = h * (sp // 4 + sp // 8)
    alleles = unpack_span(buf[:base], sp, h)
    meta = buf[base:base + 8 * wp].reshape(2 * wp, 4)
    meta = jax.lax.bitcast_convert_type(meta, jnp.int32)
    return alleles, meta[:wp], meta[wp:]


_POPCOUNT = np.array([bin(i).count("1") for i in range(16)], dtype=np.uint8)
_LOWBIT = np.array([0, 0, 1, 0, 2, 0, 1, 0, 3, 0, 1, 0, 2, 0, 1, 0],
                   dtype=np.uint8)          # index of lowest set bit (0 for 0)
_HIGHBIT = np.array([0, 0, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3, 3],
                    dtype=np.uint8)         # index of highest set bit


def _pack_pair_planes_numpy(alleles: np.ndarray, called_out: np.ndarray,
                            alt_out: np.ndarray, sp8: int):
    """Numpy fallback for the C ``pack_pair_planes`` (same contract)."""
    H, S = alleles.shape
    seen = np.zeros(S, dtype=np.uint8)
    for c in range(4):
        seen |= (alleles == c).any(axis=0).astype(np.uint8) << c
    is_ex = _POPCOUNT[seen] > 2
    ex_idx = np.flatnonzero(is_ex).astype(np.int32)
    refalt = (_LOWBIT[seen] | (_HIGHBIT[seen] << 2)).astype(np.uint8)
    refalt[is_ex] = 0
    called = (alleles >= 0) & ~is_ex[None, :]
    altbit = called & (alleles == (refalt >> 2)[None, :])
    cb = np.packbits(called, axis=1, bitorder="little")
    ab = np.packbits(altbit, axis=1, bitorder="little")
    called_out[:, :cb.shape[1]] = cb
    called_out[:, cb.shape[1]:] = 0
    alt_out[:, :ab.shape[1]] = ab
    alt_out[:, ab.shape[1]:] = 0
    return refalt, ex_idx


def pack_pair_wire(alleles: np.ndarray, first: np.ndarray,
                   n_sites: np.ndarray, wp: int, ep_min: int = 4096,
                   min_bucket: int = 1 << 16):
    """Wire format v2 for the pairwise kernel: ONE uint8 flush buffer

        [called bits H x Sp/8 | alt bits H x Sp/8 |
         first int32[wp] | n_sites int32[wp] |
         ex_w int32[ep] | ex_codes int8[ep, H]]

    ``called``/``alt`` are 1-bit planes (2 bits/site/haplotype vs the 3 of
    :func:`pack_span`) valid for sites with <= 2 distinct called alleles;
    multi-allelic *exception* sites are cleared from the planes and shipped
    as explicit (window, codes) patch entries — one per (window, site) pair
    for overlapping windows.  Returns (buffer, Sp, ep); ep == 0 when the
    flush has no exceptions (pad entries carry ex_w == wp and are dropped by
    the kernel's one-hot scatter).
    """
    H, S = alleles.shape
    Sp = _bucket_sites(max(S, 1), min_bucket)
    sp8 = Sp // 8
    W = first.shape[0]
    planes = np.empty(2 * H * sp8, dtype=np.uint8)
    called_out = planes[:H * sp8].reshape(H, sp8)
    alt_out = planes[H * sp8:].reshape(H, sp8)

    res = None
    if os.environ.get("GGT_NO_NATIVE_PARSER") != "1":
        from ..io import native
        res = native.pack_pair_planes_native(alleles, called_out, alt_out, sp8)
    if res is None:
        res = _pack_pair_planes_numpy(alleles, called_out, alt_out, sp8)
    refalt, ex_idx = res

    meta = np.zeros(2 * wp, np.int32)
    meta[:W] = first
    meta[wp:wp + W] = n_sites

    ep, ex_buf = _exception_buf(alleles, ex_idx, first, n_sites, wp, ep_min)
    buf = np.concatenate([planes, meta.view(np.uint8), ex_buf])
    return buf, Sp, ep


def map_exception_windows(ex_idx: np.ndarray, first: np.ndarray,
                          n_sites: np.ndarray):
    """Map exception site indices to the windows containing them (possibly
    several for overlapping windows).  Returns (pairs_w int32, pairs_s)."""
    W = first.shape[0]
    if not (ex_idx.size and W):
        return np.empty(0, np.int32), np.empty(0, np.int64)
    last = first + n_sites
    if np.all(np.diff(first) >= 0) and np.all(np.diff(last) >= 0):
        lo = np.searchsorted(last, ex_idx, side="right")
        hi = np.searchsorted(first, ex_idx, side="right")
        reps = np.maximum(hi - lo, 0)
        pairs_s = np.repeat(ex_idx, reps)
        pairs_w = np.concatenate(
            [np.arange(l, h, dtype=np.int32)
             for l, h in zip(lo, hi) if h > l]) \
            if reps.sum() else np.empty(0, np.int32)
    else:  # unsorted plans (rare): exact O(E*W) containment
        inw = (ex_idx[:, None] >= first[None, :]) \
            & (ex_idx[:, None] < last[None, :])
        e_i, w_i = np.nonzero(inw)
        pairs_s = ex_idx[e_i]
        pairs_w = w_i.astype(np.int32)
    return pairs_w, pairs_s


def _exception_buf(alleles: np.ndarray, ex_idx: np.ndarray,
                   first: np.ndarray, n_sites: np.ndarray, wp: int,
                   ep_min: int) -> tuple[int, np.ndarray]:
    """Build the exception-patch wire section: map exception sites to the
    windows containing them (possibly several for overlapping windows;
    entries get the window's *batch* index) and pack
    ``[ex_w int32[ep] | ex_codes int8[ep, H]]``.  Returns (ep, buffer);
    ep == 0 -> empty buffer."""
    H = alleles.shape[0]
    W = first.shape[0]
    pairs_w, pairs_s = map_exception_windows(ex_idx, first, n_sites)
    E = pairs_w.size
    if E == 0:
        return 0, np.empty(0, dtype=np.uint8)
    ep = ep_min
    while ep < E:
        ep <<= 1
    ex_w = np.full(ep, wp, dtype=np.int32)      # pad -> out of range
    ex_w[:E] = pairs_w
    ex_codes = np.full((ep, H), -1, dtype=np.int8)
    ex_codes[:E] = alleles[:, pairs_s].T
    return ep, np.concatenate([ex_w.view(np.uint8),
                               ex_codes.reshape(-1).view(np.uint8)])


@functools.partial(jax.jit, static_argnames=("sp", "h", "wp", "ep"))
def unpack_pair_wire(buf: jnp.ndarray, sp: int, h: int, wp: int, ep: int):
    """Device-side inverse of :func:`pack_pair_wire`.

    Returns (code2 int8 [h, sp] with bit0 = called, bit1 = alt;
             first int32 [wp], n_sites int32 [wp],
             ex_w int32 [ep], ex_codes int8 [ep, h])."""
    sp8 = sp // 8
    shifts = jnp.arange(8, dtype=jnp.uint8)
    c_bits = buf[:h * sp8].reshape(h, sp8)
    a_bits = buf[h * sp8:2 * h * sp8].reshape(h, sp8)
    c = ((c_bits[:, :, None] >> shifts) & 1).reshape(h, sp)
    a = ((a_bits[:, :, None] >> shifts) & 1).reshape(h, sp)
    code2 = (c | (a << 1)).astype(jnp.int8)
    base = 2 * h * sp8
    meta = jax.lax.bitcast_convert_type(
        buf[base:base + 8 * wp].reshape(2 * wp, 4), jnp.int32)
    first, n_sites = meta[:wp], meta[wp:]
    if ep:
        ex0 = base + 8 * wp
        ex_w = jax.lax.bitcast_convert_type(
            buf[ex0:ex0 + 4 * ep].reshape(ep, 4), jnp.int32)
        ex_codes = jax.lax.bitcast_convert_type(
            buf[ex0 + 4 * ep:ex0 + 4 * ep + ep * h], jnp.int8).reshape(ep, h)
    else:
        ex_w = jnp.zeros((0,), jnp.int32)
        ex_codes = jnp.zeros((0, h), jnp.int8)
    return code2, first, n_sites, ex_w, ex_codes


def _classify_pair_sites_numpy(alleles: np.ndarray):
    """Numpy fallback for the C ``classify_pair_sites`` (same contract)."""
    H, S = alleles.shape
    seen = np.zeros(S, dtype=np.uint8)
    for c in range(4):
        seen |= (alleles == c).any(axis=0).astype(np.uint8) << c
    pc = _POPCOUNT[seen]
    anymiss = (alleles < 0).any(axis=0)
    cls = np.where(pc > 2, 5,
                   np.where(pc == 0, 0,
                            np.where(pc == 1, np.where(anymiss, 2, 1),
                                     np.where(anymiss, 4, 3)))).astype(np.uint8)
    refalt = (_LOWBIT[seen] | (_HIGHBIT[seen] << 2)).astype(np.uint8)
    refalt[pc > 2] = 0
    ex_idx = np.flatnonzero(pc > 2).astype(np.int32)
    nA = int((cls == 1).sum())
    nB = int((cls == 2).sum())
    nC = int((cls == 3).sum())
    nD = int((cls == 4).sum())
    counts = np.array([nA, nB, nC, nD, nA + nC], dtype=np.int64)
    return cls, refalt, ex_idx, counts


def pack_pair_wire_v3(alleles: np.ndarray, first: np.ndarray,
                      n_sites: np.ndarray, wp: int, ep_min: int = 4096,
                      min_bucket: int = 1 << 13):
    """Wire format v3 for the pairwise kernel: class-partitioned planes.

    Most sites carry no pairwise information worth shipping: a monomorphic
    fully-called site adds 1 to every pair's shared count (a per-window
    COUNT suffices); a monomorphic site with missing calls only needs the
    1-bit called plane; a clean biallelic site only needs the 1-bit alt
    plane (called is implied all-ones); only biallelic sites with missing
    calls need both planes.  On real cohorts (overwhelmingly monomorphic)
    this cuts upload bytes ~10x vs :func:`pack_pair_wire`; the resulting
    mismatch/shared integers are IDENTICAL, so downstream output is
    byte-identical.  ONE uint8 flush buffer:

        [calledB H x SpB/8 | altC H x SpC/8 | calledD H x SpD/8 |
         altD H x SpD/8 |
         firstB,nB,firstC,nC,firstD,nD,nconst int32[7*wp] |
         ex_w int32[ep] | ex_codes int8[ep, H]]

    where nconst[w] = number of constant-shared sites (clean mono + clean
    biallelic) in window w.  Compaction preserves site order, so each
    window's class-k sites form a contiguous range [firstk, firstk + nk).
    Returns (buffer, SpB, SpC, SpD, ep, (nBmax, nCmax, nDmax))."""
    H, S = alleles.shape
    W = first.shape[0]
    res = None
    if os.environ.get("GGT_NO_NATIVE_PARSER") != "1":
        from ..io import native
        res = native.classify_pair_sites_native(alleles)
    if res is None:
        res = _classify_pair_sites_numpy(alleles)
    cls, refalt, ex_idx, counts = res
    nB, nC, nD = int(counts[1]), int(counts[2]), int(counts[3])
    SpB = _bucket_sites(max(nB, 1), min_bucket)
    SpC = _bucket_sites(max(nC, 1), min_bucket)
    SpD = _bucket_sites(max(nD, 1), min_bucket)
    b8, c8, d8 = SpB // 8, SpC // 8, SpD // 8
    planes = np.empty(H * (b8 + c8 + 2 * d8), dtype=np.uint8)
    calledB = planes[:H * b8].reshape(H, b8)
    altC = planes[H * b8:H * (b8 + c8)].reshape(H, c8)
    calledD = planes[H * (b8 + c8):H * (b8 + c8 + d8)].reshape(H, d8)
    altD = planes[H * (b8 + c8 + d8):].reshape(H, d8)

    from ..io import native as _native
    if os.environ.get("GGT_NO_NATIVE_PARSER") == "1" or \
            not _native.emit_class_planes_native(
                alleles, cls, refalt, calledB, b8, altC, c8,
                calledD, altD, d8):
        # numpy fallback: fancy-select per class then packbits
        al = np.ascontiguousarray(alleles)
        for sel_cls, outs in ((2, (calledB,)), (3, (altC,)),
                              (4, (calledD, altD))):
            idx = np.flatnonzero(cls == sel_cls)
            sub = al[:, idx]
            if sel_cls == 2:
                bits = [(sub >= 0)]
            elif sel_cls == 3:
                bits = [sub == (refalt[idx] >> 2)[None, :]]
            else:
                called = sub >= 0
                bits = [called,
                        called & (sub == (refalt[idx] >> 2)[None, :])]
            for o, b in zip(outs, bits):
                pb = np.packbits(b, axis=1, bitorder="little")
                o[:, :pb.shape[1]] = pb
                o[:, pb.shape[1]:] = 0

    # per-window class ranges via exclusive prefix sums over the class
    # vector (compaction preserves order -> contiguous ranges)
    last = first + n_sites
    meta = np.zeros(7 * wp, np.int32)
    nmax = []
    cums = None
    if os.environ.get("GGT_NO_NATIVE_PARSER") != "1":
        cums = _native.class_prefix_sums_native(cls)
    if cums is None:
        cums = np.empty((4, S + 1), dtype=np.int64)
        cums[:, 0] = 0
        for k, code in enumerate((2, 3, 4)):
            cums[k, 1:] = np.cumsum(cls == code)
        cums[3, 1:] = np.cumsum((cls == 1) | (cls == 3))
    for k in range(3):
        fk = cums[k][first]
        nk = cums[k][last] - fk
        meta[2 * k * wp:2 * k * wp + W] = fk
        meta[(2 * k + 1) * wp:(2 * k + 1) * wp + W] = nk
        nmax.append(int(nk.max()) if W else 0)
    meta[6 * wp:6 * wp + W] = cums[3][last] - cums[3][first]

    ep, ex_buf = _exception_buf(alleles, ex_idx, first, n_sites, wp, ep_min)
    buf = np.concatenate([planes, meta.view(np.uint8), ex_buf])
    return buf, SpB, SpC, SpD, ep, tuple(nmax)


@functools.partial(jax.jit, static_argnames=("spb", "spc", "spd", "h", "wp",
                                             "ep"))
def unpack_pair_wire_v3(buf: jnp.ndarray, spb: int, spc: int, spd: int,
                        h: int, wp: int, ep: int):
    """Device-side inverse of :func:`pack_pair_wire_v3`.

    Returns (cB int8 [h, spb], aC int8 [h, spc], cD int8 [h, spd],
    aD int8 [h, spd], firstB, nB, firstC, nC, firstD, nD, nconst
    int32 [wp] each, ex_w int32 [ep], ex_codes int8 [ep, h])."""
    shifts = jnp.arange(8, dtype=jnp.uint8)

    def bits(off, sp8):
        p = buf[off:off + h * sp8].reshape(h, sp8)
        return ((p[:, :, None] >> shifts) & 1).reshape(h, 8 * sp8) \
            .astype(jnp.int8)

    b8, c8, d8 = spb // 8, spc // 8, spd // 8
    cB = bits(0, b8)
    aC = bits(h * b8, c8)
    cD = bits(h * (b8 + c8), d8)
    aD = bits(h * (b8 + c8 + d8), d8)
    base = h * (b8 + c8 + 2 * d8)
    meta = jax.lax.bitcast_convert_type(
        buf[base:base + 28 * wp].reshape(7 * wp, 4), jnp.int32)
    m = [meta[k * wp:(k + 1) * wp] for k in range(7)]
    if ep:
        ex0 = base + 28 * wp
        ex_w = jax.lax.bitcast_convert_type(
            buf[ex0:ex0 + 4 * ep].reshape(ep, 4), jnp.int32)
        ex_codes = jax.lax.bitcast_convert_type(
            buf[ex0 + 4 * ep:ex0 + 4 * ep + ep * h], jnp.int8).reshape(ep, h)
    else:
        ex_w = jnp.zeros((0,), jnp.int32)
        ex_codes = jnp.zeros((0, h), jnp.int8)
    return (cB, aC, cD, aD, m[0], m[1], m[2], m[3], m[4], m[5], m[6],
            ex_w, ex_codes)


def upload_span(alleles: np.ndarray, mesh=None,
                min_bucket: int = 1 << 16) -> jnp.ndarray:
    """Upload a host int8 [H, S] span, padded on the site axis to a
    power-of-two bucket (padding = missing).  Returns an int8 device array of
    shape [H, S_padded]; with ``mesh`` the array is replicated over it.

    The pad sites are encoded missing (-1) so any kernel that ignores
    uncalled sites is unaffected even if it reads them.  Packed mode ships
    one combined bit-plane buffer (a single wire transfer).
    """
    H, S = alleles.shape
    Sp = _bucket_sites(max(S, 1), min_bucket)
    if not _packed_enabled():
        if Sp != S:
            pad = np.full((H, Sp - S), -1, dtype=np.int8)
            alleles = np.concatenate([alleles, pad], axis=1)
        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec())
        return jax.device_put(np.ascontiguousarray(alleles), sharding)
    buf, Sp = pack_span(alleles, min_bucket)
    unpack = _unpack_span_sharded(mesh) if mesh is not None else unpack_span
    return unpack(jax.device_put(buf), Sp, H)
