"""Bit-packed host->device transfer of allele matrices.

The allele matrix is int8 [H, S] with values in {-1, 0, 1, 2, 3} — 8x more
bits on the wire than information content.  Host->device bandwidth (PCIe on
real TPU hosts; far worse over tunneled links) is the dominant cost of the
whole pipeline once parsing is vectorized, so we ship two packed planes and
unpack on device with a few vector ops:

  * ``codes``: 2-bit allele codes, 4 sites/byte  (uint8 [H, ceil(S/4)])
  * ``miss`` : 1-bit missing mask, 8 sites/byte  (uint8 [H, ceil(S/8)])

2.67x fewer bytes than raw int8.  Unpacking is a handful of shift/compare
ops fused by XLA — negligible next to the matmul kernels that consume the
result.  All kernels keep operating on the plain int8 [H, S] device array.
"""

from __future__ import annotations

import functools

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


def device_alleles(alleles: np.ndarray) -> jnp.ndarray:
    """Upload an int8 [H, S] allele matrix as packed planes and return the
    unpacked int8 device array.  Drop-in for ``jnp.asarray(alleles)``."""
    H, S = alleles.shape
    if S == 0 or H == 0:
        return jnp.asarray(alleles)
    codes, miss, s = pack_alleles(alleles)
    return _unpack(jnp.asarray(codes), jnp.asarray(miss), s)
