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
