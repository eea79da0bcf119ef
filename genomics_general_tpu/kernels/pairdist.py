"""Pairwise masked-Hamming counting on the MXU.

The reference's hottest loop is the O(N^2 * L) per-window distance matrix
(``Alignment.distMatrix`` / ``pairDist`` / ``numHamming``,
/root/reference/genomics.py:903-916, 1219-1221): for haplotypes i, j

    shared(i,j) = #sites where both are called
    dist(i,j)   = #mismatches / shared(i,j)          (nan when shared == 0)

We compute the two integer count matrices with batched matmuls over 0/1
one-hot factors (f32 accumulation => exact integers):

    match(i,j)  = sum_s sum_a onehot[i,s,a] * onehot[j,s,a]
    shared(i,j) = sum_s called[i,s] * called[j,s]
    mismatch    = shared - match

The float64 division and all block/nan reductions happen on host
(stats/popgen.py) to stay bit-identical with the reference.

Transfer discipline (the target link runs at ~60 MB/s up / ~20 MB/s down
with ~24 ms round-trips, so wire bytes dominate):

* host input spans are uploaded bit-packed and padded to power-of-two site
  buckets (kernels/transfer.upload_span) — one upload per flush batch, no
  rolling device mirror;
* results come back as the **upper triangle only, uint16** — both matrices
  are symmetric and bounded by the window length, a 3.8x reduction vs full
  int32 matrices; the host mirrors the triangle back into [W, H, H];
* all device calls for a batch are dispatched before any result is fetched,
  and the dispatch/collect split lets CLIs overlap batch k's host finalize
  with batch k+1's upload + compute.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import transfer


@jax.jit
def pairwise_counts(window_alleles: jnp.ndarray,
                    valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched pairwise mismatch/shared counts.

    Parameters
    ----------
    window_alleles : int8 [B, H, S] (padded window batch)
    valid : bool [B, S] validity of each padded site slot

    Returns (mismatch int32 [B, H, H], shared int32 [B, H, H]).
    """
    v = valid[:, None, :]                                        # [B,1,S]
    called = ((window_alleles >= 0) & v).astype(jnp.bfloat16)     # [B,H,S]
    shared = jnp.einsum("bhs,bgs->bhg", called, called,
                        preferred_element_type=jnp.float32)
    codes = jnp.arange(4, dtype=jnp.int8)
    onehot = ((window_alleles[..., None] == codes) & v[..., None])
    onehot = onehot.astype(jnp.bfloat16)                          # [B,H,S,4]
    B, H, S, _ = onehot.shape
    flat = onehot.reshape(B, H, S * 4)
    match = jnp.einsum("bhx,bgx->bhg", flat, flat,
                       preferred_element_type=jnp.float32)
    mismatch = shared - match
    return mismatch.astype(jnp.int32), shared.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("s_max",))
def gather_window_batch(alleles: jnp.ndarray, first: jnp.ndarray,
                        n_sites: jnp.ndarray, s_max: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather B contiguous spans from alleles [H, S] into [B, H, s_max].

    first : int32 [B] span starts; n_sites : int32 [B] span lengths.
    Padded slots gather site 0 but are masked by the returned valid [B, s_max].
    """
    offs = jnp.arange(s_max, dtype=jnp.int32)
    idx = first[:, None] + offs[None, :]
    valid = offs[None, :] < n_sites[:, None]
    idx = jnp.where(valid, idx, 0)
    wa = alleles[:, idx]                   # [H, B, s_max]
    return wa.transpose(1, 0, 2), valid


def long_span_pair_counts(alleles_dev, first: int, last: int,
                          block: int = 1 << 18):
    """Pairwise counts over one very long span (e.g. distMat --windType cat):
    stream site blocks through the batched kernel and accumulate on host.
    Avoids the reference's materialize-the-genome RAM cliff (README.md:214)."""
    if isinstance(alleles_dev, np.ndarray) \
            and _exec_choice(alleles_dev.shape[0]) == "host" \
            and _host_available():
        span = np.ascontiguousarray(alleles_dev[:, first:last])
        m, s = _host_flush_counts(span, np.array([0], np.int64),
                                  np.array([last - first], np.int64))
        return m[0].astype(np.int64), s[0].astype(np.int64)
    if isinstance(alleles_dev, np.ndarray):
        alleles_dev = transfer.device_alleles(alleles_dev)
    H = alleles_dev.shape[0]
    mism = np.zeros((H, H), dtype=np.int64)
    shar = np.zeros((H, H), dtype=np.int64)
    for b0 in range(first, last, block):
        b1 = min(b0 + block, last)
        wa = alleles_dev[:, b0:b1][None]
        valid = jnp.ones((1, b1 - b0), dtype=bool)
        m, s = pairwise_counts(wa, valid)
        mism += np.asarray(m[0], dtype=np.int64)
        shar += np.asarray(s[0], dtype=np.int64)
    return mism, shar


class CatPairAccumulator:
    """Streaming genome-wide pair-count accumulator (distMat --windType cat).

    The reference materializes the whole input for cat mode
    (distMat.py:316-319; README.md:214 RAM warning); this feeds fixed-size
    site blocks to the device as they stream in and keeps only the [H, H]
    int64 accumulators on host — O(block) memory, one compiled shape for the
    steady state plus a few pow2 buckets for the tail.  Pads with missing
    (-1), which contributes nothing to called/shared/match, so no validity
    mask is needed.  One block stays in flight so device compute overlaps
    the next chunk's parse."""

    def __init__(self, H: int, block: int = 1 << 18):
        self.H, self.block = H, block
        self.buf = np.empty((H, block), dtype=np.int8)
        self.fill = 0
        self.mism = np.zeros((H, H), dtype=np.int64)
        self.shar = np.zeros((H, H), dtype=np.int64)
        self._pending = None

    def _launch(self, arr: np.ndarray):
        self._collect()
        S = arr.shape[1]
        if _exec_choice(self.H) == "host" and _host_available():
            m, s = _host_flush_counts(arr, np.array([0], np.int64),
                                      np.array([S], np.int64))
            self.mism += m[0].astype(np.int64)
            self.shar += s[0].astype(np.int64)
            return
        sp = 1 << 10
        while sp < S:
            sp <<= 1
        if sp != S:
            pad = np.full((self.H, sp - S), -1, dtype=np.int8)
            arr = np.concatenate([arr, pad], axis=1)
        self._pending = pairwise_counts(
            jax.device_put(arr[None]), jnp.ones((1, sp), dtype=bool))

    def _collect(self):
        if self._pending is not None:
            m, s = self._pending
            self.mism += np.asarray(m[0], dtype=np.int64)
            self.shar += np.asarray(s[0], dtype=np.int64)
            self._pending = None

    def add(self, a: np.ndarray):
        """Append int8 [H, n] sites; dispatches full blocks."""
        n = a.shape[1]
        off = 0
        while n - off > 0:
            take = min(self.block - self.fill, n - off)
            self.buf[:, self.fill:self.fill + take] = a[:, off:off + take]
            self.fill += take
            off += take
            if self.fill == self.block:
                self._launch(self.buf.copy())
                self.fill = 0

    def finish(self):
        """Flush the tail and return (mismatch, shared) int64 [H, H]."""
        if self.fill:
            self._launch(self.buf[:, :self.fill].copy())
            self.fill = 0
        self._collect()
        return self.mism, self.shar


def _tri_pack(m, s, s_max):
    # Upper-triangle-only fetch: both matrices are symmetric, so ship
    # H(H+1)/2 entries each instead of H^2, as uint16 when counts fit
    # (they do for bucketed window batches; cat-mode long spans go through
    # long_span_pair_counts).  One packed array per batch: the device->host
    # link has high fixed latency, so one fetch beats four.
    H = m.shape[1]
    iu, ju = np.triu_indices(H)            # trace-time constants
    out = jnp.concatenate([m[:, iu, ju], s[:, iu, ju]], axis=1)  # [B, 2T]
    return out.astype(jnp.uint16) if s_max < (1 << 16) else out


def _tri_unpack(host: np.ndarray, b: int, H: int):
    T = H * (H + 1) // 2
    iu, ju = np.triu_indices(H)
    mt = host[:b, :T].astype(np.int32)
    st = host[:b, T:].astype(np.int32)
    mism = np.empty((b, H, H), dtype=np.int32)
    shar = np.empty((b, H, H), dtype=np.int32)
    mism[:, iu, ju] = mt
    mism[:, ju, iu] = mt
    shar[:, iu, ju] = st
    shar[:, ju, iu] = st
    return mism, shar


@functools.partial(jax.jit, static_argnames=("s_max",))
def _gathered_pair_counts(alleles: jnp.ndarray, first: jnp.ndarray,
                          n_sites: jnp.ndarray, s_max: int):
    wa, valid = gather_window_batch(alleles, first, n_sites, s_max)
    m, s = pairwise_counts(wa, valid)
    return _tri_pack(m, s, s_max)


def _next_pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b <<= 1
    return b


@functools.partial(jax.jit, static_argnames=("s_max",))
def gather_window_code2(code2: jnp.ndarray, first: jnp.ndarray,
                        n_sites: jnp.ndarray, s_max: int):
    """Gather B spans of the combined called/alt plane (int8, bit0 = called,
    bit1 = alt) into bf16 factors (c [B,H,s_max], ca [B,H,s_max])."""
    offs = jnp.arange(s_max, dtype=jnp.int32)
    idx = first[:, None] + offs[None, :]
    valid = offs[None, :] < n_sites[:, None]
    idx = jnp.where(valid, idx, 0)
    w = code2[:, idx].transpose(1, 0, 2)              # [B, H, s_max]
    v = valid[:, None, :]
    c = ((w & 1) * v).astype(jnp.bfloat16)
    ca = ((w >> 1) * v).astype(jnp.bfloat16)
    return c, ca


def _pair_counts_v2(c: jnp.ndarray, ca: jnp.ndarray):
    """Mismatch/shared from biallelic bit factors.

    With a = is-alt and c = called (alt bits only ever set on called sites),
    per-site mismatch is c_i c_j (a_i XOR a_j) = c_i c_j (a_i + a_j
    - 2 a_i a_j), so summed over sites:

        shared   = c  . c^T
        mismatch = ca . c^T + (ca . c^T)^T - 2 ca . ca^T

    Three [H, S] matmuls — no one-hot [B,H,S,4] blow-up (the generic
    4-state path in :func:`pairwise_counts` needs it; biallelic sites are
    the overwhelming majority, exceptions are patched in separately)."""
    G1 = jnp.einsum("bhs,bgs->bhg", c, c,
                    preferred_element_type=jnp.float32)
    G2 = jnp.einsum("bhs,bgs->bhg", ca, ca,
                    preferred_element_type=jnp.float32)
    G3 = jnp.einsum("bhs,bgs->bhg", ca, c,
                    preferred_element_type=jnp.float32)
    mismatch = G3 + G3.transpose(0, 2, 1) - 2.0 * G2
    return mismatch.astype(jnp.int32), G1.astype(jnp.int32)


def _exception_patch(m, s, ex_w, ex_codes, wp):
    """Add the multi-allelic exception sites' pair contributions.

    ex_w [E] gives each entry's window index (== wp for padding, dropped by
    the one-hot), ex_codes [E, H] the raw allele codes at that site."""
    called = (ex_codes >= 0)
    eq = (ex_codes[:, :, None] == ex_codes[:, None, :])
    both = called[:, :, None] & called[:, None, :]
    s_e = jnp.where(both, 1, 0).astype(jnp.int32)         # [E, H, H]
    m_e = jnp.where(both & ~eq, 1, 0).astype(jnp.int32)
    E, H, _ = s_e.shape
    # segment-sum over the window axis (padding entries have ex_w == wp and
    # land in the dropped overflow segment).  A [E, wp] one-hot matmul blows
    # up memory when a dataset is heavily multi-allelic (E ~ all sites).
    s_add = jax.ops.segment_sum(s_e.reshape(E, H * H), ex_w,
                                num_segments=wp + 1)[:wp]
    m_add = jax.ops.segment_sum(m_e.reshape(E, H * H), ex_w,
                                num_segments=wp + 1)[:wp]
    m = m + m_add.reshape(wp, H, H)
    s = s + s_add.reshape(wp, H, H)
    return m, s


@functools.partial(jax.jit, static_argnames=(
    "sp", "h", "wp", "s_max", "chunk", "ep", "mode"))
def _fused_flush_pair_v2(buf: jnp.ndarray, pop_mask: jnp.ndarray,
                         min_sites: jnp.ndarray, sp: int, h: int, wp: int,
                         s_max: int, chunk: int, ep: int, mode: str,
                         het_rows: jnp.ndarray | None = None):
    """Wire-v2 single-transfer flush kernel.

    ``buf`` is the :func:`~genomics_general_tpu.kernels.transfer.pack_pair_wire`
    buffer.  mode:

    * ``"tri"``    -> packed upper-triangle counts [wp, 2T] (uint16/int32),
      the drop-in replacement for :func:`_fused_flush_pair_counts`;
    * ``"blocks"`` -> per-window per-pop-block float64 (sum of pair
      distances, count of valid pairs) [wp, 2, P, P] — the device-side
      equivalent of stats/popgen.group_dist_stats' nanmean numerators /
      denominators (genomics.py:956-995): valid pairs are off-diagonal with
      shared >= max(min_sites, 1) (the reference's 0/0 -> NaN and
      ``apply_min_sites`` NaNs), the float64 division happens here, and the
      minData gate + means + Fst assembly stay on host in exact numpy f64.
      Requires tracing under ``jax.enable_x64()``.
    """
    from . import transfer
    code2, fi, ns, ex_w, ex_codes = transfer.unpack_pair_wire(
        buf, sp, h, wp, ep)

    def one(args):
        f, n = args
        c, ca = gather_window_code2(code2, f, n, s_max)
        return _pair_counts_v2(c, ca)

    n_ch = wp // chunk
    m, s = jax.lax.map(one, (fi.reshape(n_ch, chunk),
                             ns.reshape(n_ch, chunk)))
    m = m.reshape(wp, h, h)
    s = s.reshape(wp, h, h)
    if ep:
        m, s = _exception_patch(m, s, ex_w, ex_codes, wp)
    return _modes_tail(m, s, mode, pop_mask, min_sites, het_rows, wp, h,
                       s_max < (1 << 16))


def _modes_tail(m, s, mode: str, pop_mask, min_sites, het_rows, wp: int,
                h: int, u16: bool):
    """Shared output stage of the fused flush kernels (wire v2 and v3)."""
    if mode == "tri":
        H = m.shape[1]
        iu, ju = np.triu_indices(H)            # trace-time constants
        out = jnp.concatenate([m[:, iu, ju], s[:, iu, ju]], axis=1)
        return out.astype(jnp.uint16) if u16 else out

    # blocks: float64 nanmean numerators/denominators per pop-pair block
    ms = jnp.maximum(min_sites.astype(jnp.int32), 1)
    offdiag = ~jnp.eye(h, dtype=bool)
    valid = (s >= ms) & offdiag[None, :, :]
    d0 = jnp.where(valid, m.astype(jnp.float64) / s.astype(jnp.float64), 0.0)
    vf = valid.astype(jnp.float64)
    pm = pop_mask.astype(jnp.float64)
    sums = jnp.einsum("whg,ph,qg->wpq", d0, pm, pm)
    cnts = jnp.einsum("whg,ph,qg->wpq", vf, pm, pm)
    blocks = jnp.stack([sums, cnts], axis=1)              # [wp, 2, P, P]
    if mode == "blocks_het":
        # raw (mismatch, shared) for each individual's own haplotype pair —
        # the host needs the untouched shared count to replicate sampleHet's
        # bitwise-guard quirk (genomics.py:924).  Packed into ONE output
        # array with the blocks: the tunnel's per-transfer latency (~25-50
        # ms RTT) dominates these small payloads, so one fetch beats two
        # (het counts are < 2^53, exact in f64)
        r1, r2 = het_rows[0], het_rows[1]
        het = jnp.stack([m[:, r1, r2], s[:, r1, r2]], axis=-1)  # [wp, I, 2]
        P = pop_mask.shape[0]
        return jnp.concatenate(
            [blocks.reshape(wp, 2 * P * P),
             het.astype(jnp.float64).reshape(wp, -1)], axis=1)
    return blocks


@functools.partial(jax.jit, static_argnames=("s_max",))
def _gather_bits(plane: jnp.ndarray, first: jnp.ndarray,
                 n_sites: jnp.ndarray, s_max: int) -> jnp.ndarray:
    """Gather B spans of a 0/1 int8 class plane into bf16 [B, H, s_max]
    factors (padded slots zeroed)."""
    offs = jnp.arange(s_max, dtype=jnp.int32)
    idx = first[:, None] + offs[None, :]
    valid = offs[None, :] < n_sites[:, None]
    idx = jnp.where(valid, idx, 0)
    w = plane[:, idx].transpose(1, 0, 2)              # [B, H, s_max]
    return (w * valid[:, None, :]).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=(
    "spb", "spc", "spd", "h", "wp", "sb", "sc", "sd", "chunk", "ep", "mode",
    "u16"))
def _fused_flush_pair_v3(buf: jnp.ndarray, pop_mask: jnp.ndarray,
                         min_sites: jnp.ndarray, spb: int, spc: int,
                         spd: int, h: int, wp: int, sb: int, sc: int,
                         sd: int, chunk: int, ep: int, mode: str, u16: bool,
                         het_rows: jnp.ndarray | None = None):
    """Wire-v3 single-transfer flush kernel (class-partitioned planes).

    Same modes and outputs as :func:`_fused_flush_pair_v2`; the wire is
    :func:`~genomics_general_tpu.kernels.transfer.pack_pair_wire_v3`.  The
    per-window mismatch/shared integers are built from the class pieces:

        shared   = nconst + cB.cB^T + cD.cD^T
        mismatch = (rC_i + rC_j - 2 aC.aC^T) + (aD.cD^T + (aD.cD^T)^T
                   - 2 aD.aD^T)

    where nconst counts clean-mono + clean-biallelic sites (every pair
    shares them), cB is the called plane of mono-with-missing sites, aC the
    alt plane of clean biallelic sites (all-called, so mismatch reduces to
    the rank-1-corrected Gram form), and cD/aD the two planes of
    biallelic-with-missing sites.  All Gram matrices accumulate 0/1 bf16
    factors in f32 — exact integers."""
    from . import transfer
    (cB, aC, cD, aD, fB, nB, fC, nC, fD, nD, nconst, ex_w,
     ex_codes) = transfer.unpack_pair_wire_v3(buf, spb, spc, spd, h, wp, ep)

    def one(args):
        fb, nb, fc, nc, fd, nd, ncst = args
        b = _gather_bits(cB, fb, nb, sb)
        GB = jnp.einsum("bhs,bgs->bhg", b, b,
                        preferred_element_type=jnp.float32)
        a = _gather_bits(aC, fc, nc, sc)
        G2C = jnp.einsum("bhs,bgs->bhg", a, a,
                         preferred_element_type=jnp.float32)
        rC = jnp.sum(a, axis=2, dtype=jnp.float32)        # [B, H]
        dc = _gather_bits(cD, fd, nd, sd)
        da = _gather_bits(aD, fd, nd, sd)
        G1D = jnp.einsum("bhs,bgs->bhg", dc, dc,
                         preferred_element_type=jnp.float32)
        G2D = jnp.einsum("bhs,bgs->bhg", da, da,
                         preferred_element_type=jnp.float32)
        G3D = jnp.einsum("bhs,bgs->bhg", da, dc,
                         preferred_element_type=jnp.float32)
        m = (rC[:, :, None] + rC[:, None, :] - 2.0 * G2C) \
            + (G3D + G3D.transpose(0, 2, 1) - 2.0 * G2D)
        s = ncst[:, None, None].astype(jnp.float32) + GB + G1D
        return m.astype(jnp.int32), s.astype(jnp.int32)

    n_ch = wp // chunk
    m, s = jax.lax.map(one, (fB.reshape(n_ch, chunk), nB.reshape(n_ch, chunk),
                             fC.reshape(n_ch, chunk), nC.reshape(n_ch, chunk),
                             fD.reshape(n_ch, chunk), nD.reshape(n_ch, chunk),
                             nconst.reshape(n_ch, chunk)))
    m = m.reshape(wp, h, h)
    s = s.reshape(wp, h, h)
    if ep:
        m, s = _exception_patch(m, s, ex_w, ex_codes, wp)
    return _modes_tail(m, s, mode, pop_mask, min_sites, het_rows, wp, h, u16)


def _v3_flush_args(alleles: np.ndarray, first: np.ndarray,
                   n_sites: np.ndarray):
    """Host-side prep for the wire-v3 fused kernels: classify + pack the
    flush buffer and choose the static shape parameters.  Returns None when
    v3 is disabled (GGT_WIRE=2) — callers fall back to wire v2."""
    import os
    if os.environ.get("GGT_WIRE") == "2":
        return None
    W = first.shape[0]
    H = alleles.shape[0]
    wp = _next_pow2(W, 8)
    buf, SpB, SpC, SpD, ep, (nbm, ncm, ndm) = transfer.pack_pair_wire_v3(
        alleles, first, n_sites, wp)
    sb = min(_next_pow2(max(nbm, 1), 128), SpB)
    sc = min(_next_pow2(max(ncm, 1), 128), SpC)
    sd = min(_next_pow2(max(ndm, 1), 128), SpD)
    s_need = max(int(n_sites.max()), 1)
    chunk = min(wp, 128)
    while chunk > 8 and chunk * H * max(sb, sc, sd) > (1 << 26):
        chunk //= 2
    u16 = s_need < (1 << 16)
    return buf, SpB, SpC, SpD, H, wp, sb, sc, sd, chunk, ep, u16


# ------------------------------------------------------- host executor

def _exec_choice(H: int) -> str:
    """'host' | 'tpu': place the pairwise flush where it runs fastest.

    A flush does O(W * s * H^2) pair-site work.  The host executor (C
    word-parallel AND/XOR/popcount over the v2 bit planes) runs it at
    ~1-2 G pair-site/s with ZERO transfer; the device path pays the wire
    (O(s * H) bits over a link whose throughput varies) to light up the
    MXU, which only pays off once the H^2 term dominates.  Measured on the
    target: at H = 20 the host does a 290k-site flush in ~2 ms vs ~6 ms
    device compute plus the upload; at H >= a few hundred the device wins
    outright.  GGT_EXEC forces 'host' or 'tpu'; GGT_EXEC_HMAX moves the
    auto crossover (default 96)."""
    mode = os.environ.get("GGT_EXEC", "auto")
    if mode in ("host", "tpu"):
        return mode
    return "host" if H <= int(os.environ.get("GGT_EXEC_HMAX", 96)) else "tpu"


def _host_available() -> bool:
    from ..io import native
    lib = native.get_lib()
    return lib is not None and hasattr(lib, "pairwise_window_counts")


def _host_flush_counts(alleles: np.ndarray, first: np.ndarray,
                       n_sites: np.ndarray):
    """Host executor: (mismatch, shared) int32 [W, H, H] for one flush —
    identical integers to the device kernels (same planes, same exception
    patching).  Returns None when the native library is unavailable."""
    from ..io import native
    H, S = alleles.shape
    sp8 = ((max(S, 1) + 63) // 64) * 8
    planes = np.empty((2, H, sp8), dtype=np.uint8)
    res = None
    if os.environ.get("GGT_NO_NATIVE_PARSER") != "1":
        res = native.pack_pair_planes_native(alleles, planes[0], planes[1],
                                             sp8)
    if res is None:
        res = transfer._pack_pair_planes_numpy(alleles, planes[0], planes[1],
                                               sp8)
    refalt, ex_idx = res
    ms = native.pairwise_window_counts_native(planes[0], planes[1], sp8,
                                              first, n_sites)
    if ms is None:
        return None
    m, s = ms
    if ex_idx.size:
        pairs_w, pairs_s = transfer.map_exception_windows(
            ex_idx, first, n_sites)
        if pairs_w.size:
            codes = alleles[:, pairs_s].T                  # [E, H]
            called = codes >= 0
            both = called[:, :, None] & called[:, None, :]
            eq = codes[:, :, None] == codes[:, None, :]
            np.add.at(m, pairs_w, (both & ~eq).astype(np.int32))
            np.add.at(s, pairs_w, both.astype(np.int32))
    return m, s


def _blocks_from_counts(m: np.ndarray, s: np.ndarray, pop_mask: np.ndarray,
                        min_sites: int):
    """Numpy mirror of the device blocks tail (:func:`_modes_tail`):
    float64 nanmean numerators/denominators per pop-pair block."""
    ms = max(int(min_sites or 0), 1)
    h = m.shape[1]
    offdiag = ~np.eye(h, dtype=bool)
    valid = (s >= ms) & offdiag[None, :, :]
    d0 = np.zeros(m.shape, dtype=np.float64)
    np.divide(m, s, out=d0, where=valid)
    pm = pop_mask.astype(np.float64)
    sums = np.einsum("whg,ph,qg->wpq", d0, pm, pm)
    cnts = np.einsum("whg,ph,qg->wpq", valid.astype(np.float64), pm, pm)
    return sums, cnts


class _ReadyHandle:
    """Lazy handle for the host executor: the flush computes at collect()
    time on the single consumer thread, so at most one batch's [W, H, H]
    matrices are materialized however deep the pipeline is (the device
    path's in-flight payloads live on the device)."""

    def __init__(self, thunk):
        self._thunk = thunk

    def collect(self):
        return self._thunk()


@functools.partial(jax.jit,
                   static_argnames=("sp", "h", "wp", "s_max", "chunk"))
def _fused_flush_pair_counts(buf: jnp.ndarray, sp: int, h: int, wp: int,
                             s_max: int, chunk: int):
    """One-transfer flush kernel: ``buf`` is the single uint8 wire buffer
    ``[packed allele planes | first int32[wp] | n_sites int32[wp]]``.
    Unpacks the span, then maps gather+pairwise+tri-pack over window chunks
    (``lax.map`` keeps the one-hot intermediate bounded).  Returns
    [wp, 2T] packed counts — fetched as ONE transfer."""
    alleles, fi, ns = transfer.unpack_flush_buffer(buf, sp, h, wp)

    def one(args):
        f, n = args
        wa, valid = gather_window_batch(alleles, f, n, s_max)
        m, s = pairwise_counts(wa, valid)
        return _tri_pack(m, s, s_max)

    n_ch = wp // chunk
    out = jax.lax.map(one, (fi.reshape(n_ch, chunk),
                            ns.reshape(n_ch, chunk)))
    return out.reshape(wp, out.shape[-1])


def _v2_flush_args(alleles: np.ndarray, first: np.ndarray,
                   n_sites: np.ndarray):
    """Shared host-side prep for the wire-v2 fused kernels: pack the flush
    buffer and choose the static shape parameters."""
    W = first.shape[0]
    H = alleles.shape[0]
    s_need = max(int(n_sites.max()), 1)
    wp = _next_pow2(W, 8)
    buf, Sp, ep = transfer.pack_pair_wire(alleles, first, n_sites, wp)
    # bucket floor 256 (not 1024): gather + einsum compute scale with
    # s_max, and 100-250-site windows (sites-window ABBA/popgen sweeps)
    # were paying 4-10x padding waste; the floor bounds jit variants
    s_max = min(_next_pow2(s_need, 256), Sp)
    # chunk the window axis so the [chunk, H, s_max] gather stays small:
    # measured on the target TPU, chunks at/above 256 windows fall off a
    # fusion cliff (0.9s vs 0.06s per 512-window flush at chunk 128)
    chunk = min(wp, 128)
    while chunk > 8 and chunk * H * s_max > (1 << 26):
        chunk //= 2
    return buf, Sp, H, wp, s_max, chunk, ep


_NO_POPS = np.zeros((1, 1), dtype=np.float64)


@functools.lru_cache(maxsize=64)
def _dev_const(key: bytes, shape: tuple, dtype: str):
    """Per-run device constants (pop/ind masks, min_sites, het_rows): upload
    once instead of per flush — each re-upload costs a tunnel round trip."""
    arr = np.frombuffer(key, dtype=np.dtype(dtype)).reshape(shape)
    return jax.device_put(arr)


def _dev_mask_f64(mask: np.ndarray):
    m = np.ascontiguousarray(mask, dtype=np.float64)
    with jax.enable_x64():
        return _dev_const(m.tobytes(), m.shape, "float64")


def _dev_i32(value) -> jnp.ndarray:
    v = np.ascontiguousarray(value, dtype=np.int32)
    return _dev_const(v.tobytes(), v.shape, "int32")


def _start_fetch(arr):
    """Kick off the device->host copy as soon as the producing computation
    finishes, so the transfer overlaps the pipeline instead of starting at
    the (one batch later) blocking collect()."""
    try:
        arr.copy_to_host_async()
    except (AttributeError, RuntimeError):
        pass


def _dispatch_fused(alleles: np.ndarray, first: np.ndarray,
                    n_sites: np.ndarray) -> "PairCountsHandle":
    """Host-span fast path: exactly one H2D transfer and one D2H transfer per
    flush batch (the link's per-transfer fixed cost is ~13-25 ms).  Ships the
    class-partitioned wire v3 (transfer.pack_pair_wire_v3; ~2-10x fewer
    bytes than v2 depending on monomorphic fraction); GGT_WIRE=2 falls back
    to the 2-bit v2 format."""
    W = first.shape[0]
    H = alleles.shape[0]
    handle = PairCountsHandle(W, H, [])
    if W == 0:
        return handle
    if _exec_choice(H) == "host" and _host_available():
        return _ReadyHandle(
            lambda: _host_flush_counts(alleles, first, n_sites))
    v3 = _v3_flush_args(alleles, first, n_sites)
    if v3 is not None:
        buf, SpB, SpC, SpD, H, wp, sb, sc, sd, chunk, ep, u16 = v3
        out = _fused_flush_pair_v3(jax.device_put(buf), _dev_mask_f64(_NO_POPS),
                                   _dev_i32(0), SpB, SpC, SpD, H, wp,
                                   sb, sc, sd, chunk, ep, "tri", u16)
    else:
        buf, Sp, H, wp, s_max, chunk, ep = _v2_flush_args(
            alleles, first, n_sites)
        out = _fused_flush_pair_v2(jax.device_put(buf), _dev_mask_f64(_NO_POPS),
                                   _dev_i32(0), Sp, H, wp, s_max, chunk, ep,
                                   "tri")
    _start_fetch(out)
    handle.pending.append((np.arange(W), W, out))
    return handle


class PairBlockStatsHandle:
    """In-flight per-window pop-block distance sums (wire-v2 ``blocks`` mode).

    ``collect()`` returns float64 (sums [W, P, P], counts [W, P, P]):
    sums[w, x, y] = sum over valid (i in pop x, j in pop y) of
    mismatch/shared; counts = number of valid pairs.  Valid = off-diagonal
    and shared >= max(min_sites, 1) — exactly the non-NaN entries of the
    reference's per-window distance matrix after ``apply_min_sites``
    (stats/popgen.DistStatsContext)."""

    def __init__(self, W: int, P: int, pending: list):
        self.W, self.P, self.pending = W, P, pending

    def collect(self):
        sums = np.empty((self.W, self.P, self.P), dtype=np.float64)
        cnts = np.empty((self.W, self.P, self.P), dtype=np.float64)
        for sel, b, out in self.pending:
            host = np.asarray(out)
            sums[sel] = host[:b, 0]
            cnts[sel] = host[:b, 1]
        self.pending = []
        return sums, cnts


def window_pair_block_stats_dispatch(alleles: np.ndarray, first: np.ndarray,
                                     n_sites: np.ndarray,
                                     pop_mask: np.ndarray,
                                     min_sites: int) -> PairBlockStatsHandle:
    """Dispatch the fully-fused popDist/popPairDist path: pair counts AND the
    float64 per-pop-block reductions happen on device; only [W, 2, P, P]
    floats come back over the slow link (vs [W, H, H] count matrices).

    ``pop_mask``: float [P, H] 0/1 row membership per population (np.unique
    group order).  The host finalize (stats/popgen.group_dist_stats_from_
    blocks) reproduces the reference's nanmean_min/Fst arithmetic exactly.
    """
    W = first.shape[0]
    P = pop_mask.shape[0]
    handle = PairBlockStatsHandle(W, P, [])
    if W == 0:
        return handle
    if _exec_choice(alleles.shape[0]) == "host" and _host_available():
        return _ReadyHandle(
            lambda: _blocks_from_counts(
                *_host_flush_counts(alleles, first, n_sites),
                pop_mask, min_sites))
    v3 = _v3_flush_args(alleles, first, n_sites)
    if v3 is not None:
        buf, SpB, SpC, SpD, H, wp, sb, sc, sd, chunk, ep, u16 = v3
        with jax.enable_x64():
            out = _fused_flush_pair_v3(
                jax.device_put(buf), _dev_mask_f64(pop_mask),
                _dev_i32(min_sites or 0), SpB, SpC, SpD, H, wp,
                sb, sc, sd, chunk, ep, "blocks", u16)
    else:
        buf, Sp, H, wp, s_max, chunk, ep = _v2_flush_args(
            alleles, first, n_sites)
        with jax.enable_x64():
            out = _fused_flush_pair_v2(
                jax.device_put(buf), _dev_mask_f64(pop_mask),
                _dev_i32(min_sites or 0), Sp, H, wp, s_max, chunk, ep,
                "blocks")
    _start_fetch(out)
    handle.pending.append((np.arange(W), W, out))
    return handle


class PairBlocksHetHandle:
    """In-flight packed (blocks | het) results of the ``blocks_het`` fused
    mode (one [wp, 2*P*P + 2*I] f64 array per flush; the copy-to-host was
    started asynchronously at dispatch).

    ``collect()`` -> (sums f64 [W, P, P], cnts f64 [W, P, P],
    het_m int32 [W, I], het_s int32 [W, I]); P is the mask's block count
    (populations, or individuals for the indPairDist path — pop blocks are
    exact aggregations of individual blocks)."""

    def __init__(self, W: int, P: int, pending: list):
        self.W, self.P, self.pending = W, P, pending

    def collect(self):
        host = np.asarray(self.pending[0])[:self.W]
        self.pending = []
        P = self.P
        blocks = host[:, :2 * P * P].reshape(self.W, 2, P, P)
        het = host[:, 2 * P * P:].reshape(self.W, -1, 2)
        return (blocks[:, 0], blocks[:, 1],
                het[..., 0].astype(np.int64), het[..., 1].astype(np.int64))


def window_pair_ind_blocks_dispatch(alleles: np.ndarray, first: np.ndarray,
                                    n_sites: np.ndarray,
                                    ind_mask: np.ndarray,
                                    het_rows: np.ndarray,
                                    min_sites: int) -> PairBlocksHetHandle:
    """Fused popDist/popPairDist/indPairDist/indHet path: per-INDIVIDUAL
    block sums/counts plus each individual's own-pair raw (mismatch, shared)
    come back in one transfer.  Pop-level blocks are derived on host by
    summing individual blocks (exact — sums are additive), so this one
    kernel serves the whole distance-stat family without ever fetching
    [W, H, H] matrices.

    ``ind_mask``: float [I, H] row membership per individual;
    ``het_rows``: int32 [2, I] the two haplotype rows of each individual
    (any pair for non-diploids — the host overwrites their het with NaN).
    """
    W = first.shape[0]
    handle = PairBlocksHetHandle(W, ind_mask.shape[0], [])
    if W == 0:
        return handle
    if _exec_choice(alleles.shape[0]) == "host" and _host_available():
        def _thunk():
            m, s = _host_flush_counts(alleles, first, n_sites)
            sums, cnts = _blocks_from_counts(m, s, ind_mask, min_sites)
            r1, r2 = het_rows[0], het_rows[1]
            return (sums, cnts, m[:, r1, r2].astype(np.int64),
                    s[:, r1, r2].astype(np.int64))
        return _ReadyHandle(_thunk)
    v3 = _v3_flush_args(alleles, first, n_sites)
    if v3 is not None:
        buf, SpB, SpC, SpD, H, wp, sb, sc, sd, chunk, ep, u16 = v3
        with jax.enable_x64():
            out = _fused_flush_pair_v3(
                jax.device_put(buf), _dev_mask_f64(ind_mask),
                _dev_i32(min_sites or 0), SpB, SpC, SpD, H, wp,
                sb, sc, sd, chunk, ep, "blocks_het", u16,
                het_rows=_dev_i32(het_rows))
    else:
        buf, Sp, H, wp, s_max, chunk, ep = _v2_flush_args(
            alleles, first, n_sites)
        with jax.enable_x64():
            out = _fused_flush_pair_v2(
                jax.device_put(buf), _dev_mask_f64(ind_mask),
                _dev_i32(min_sites or 0), Sp, H, wp, s_max, chunk, ep,
                "blocks_het", het_rows=_dev_i32(het_rows))
    _start_fetch(out)
    handle.pending.append(out)
    return handle


@functools.lru_cache(maxsize=8)
def _sharded_gathered_pair_counts(mesh):
    """Data-parallel variant: the window-batch axis is sharded over the
    mesh's ``data`` axis; the allele matrix is replicated (SURVEY §2.10 DP).
    XLA partitions the gather + matmuls with no collectives on the hot path;
    output stays batch-sharded, fetched once per batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, static_argnames=("s_max",),
                       out_shardings=batch)
    def fn(alleles, first, n_sites, s_max):
        # constraints (not in_shardings): inputs may arrive replicated
        # (upload_span's replicated placement) or as host arrays
        first = jax.lax.with_sharding_constraint(first, batch)
        n_sites = jax.lax.with_sharding_constraint(n_sites, batch)
        wa, valid = gather_window_batch(alleles, first, n_sites, s_max)
        m, s = pairwise_counts(wa, valid)
        return _tri_pack(m, s, s_max)

    return fn


class PairCountsHandle:
    """In-flight pair-count batches: device work is dispatched, results not
    yet fetched.  ``collect()`` blocks on the transfers and returns numpy
    (mismatch [W, H, H], shared [W, H, H]) in window order."""

    def __init__(self, W: int, H: int, pending: list):
        self.W, self.H, self.pending = W, H, pending

    def collect(self):
        mism = np.empty((self.W, self.H, self.H), dtype=np.int32)
        shar = np.empty((self.W, self.H, self.H), dtype=np.int32)
        for sel, b, ms in self.pending:
            host = np.asarray(ms)
            m, s = _tri_unpack(host, b, self.H)
            mism[sel] = m
            shar[sel] = s
        self.pending = []
        return mism, shar


def window_pair_counts_dispatch(alleles, first: np.ndarray,
                                n_sites: np.ndarray, batch_size: int = 1024,
                                bucket_rounding: int = 1024,
                                mesh=None) -> PairCountsHandle:
    """Dispatch pairwise counts for all windows without fetching results.

    ``alleles`` may be a host int8 [H, S] span (uploaded bit-packed, padded
    to a power-of-two site bucket) or an existing device array.  Windows are
    bucketed by padded length (rounded up to ``bucket_rounding``) to bound
    recompilation and dispatched in power-of-two batches.  With a ``mesh``,
    each batch is sharded data-parallel over the mesh devices.
    """
    W = first.shape[0]
    H = alleles.shape[0]
    if isinstance(alleles, np.ndarray) and mesh is None \
            and transfer._packed_enabled():
        return _dispatch_fused(alleles, first, n_sites)
    handle = PairCountsHandle(W, H, [])
    if W == 0:
        return handle
    if isinstance(alleles, np.ndarray):
        alleles_dev = transfer.upload_span(alleles, mesh=mesh)
    else:
        alleles_dev = alleles
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    fn = _sharded_gathered_pair_counts(mesh) if mesh is not None \
        else _gathered_pair_counts
    padded = np.maximum(
        bucket_rounding,
        ((n_sites + bucket_rounding - 1) // bucket_rounding) * bucket_rounding)
    order = np.argsort(padded, kind="stable")
    i = 0
    while i < W:
        j = i
        s_max = int(padded[order[i]])
        while j < W and padded[order[j]] == s_max and j - i < batch_size:
            j += 1
        sel = order[i:j]
        b = sel.size
        # pad the batch to n_dev * 2^k (not to batch_size): bounds compile
        # count to log2(batch_size) variants while keeping transfers ~b-sized
        # and the batch divisible over the mesh
        bsz = max(8, n_dev)
        while bsz < b:
            bsz *= 2
        f = np.zeros(bsz, dtype=np.int32)
        ns = np.zeros(bsz, dtype=np.int32)
        f[:b] = first[sel]
        ns[:b] = n_sites[sel]
        ms = fn(alleles_dev, jnp.asarray(f), jnp.asarray(ns), s_max)
        handle.pending.append((sel, b, ms))
        i = j
    return handle


def window_pair_counts(alleles, first: np.ndarray, n_sites: np.ndarray,
                       batch_size: int = 1024, bucket_rounding: int = 1024,
                       mesh=None):
    """Dispatch + collect in one call.  Returns numpy
    (mismatch [W, H, H], shared [W, H, H]) in window order."""
    return window_pair_counts_dispatch(
        alleles, first, n_sites, batch_size=batch_size,
        bucket_rounding=bucket_rounding, mesh=mesh).collect()
