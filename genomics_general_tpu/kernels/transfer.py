"""Host->device upload of allele matrices (raw or bit-packed).

The allele matrix is int8 [H, S] with values in {-1, 0, 1, 2, 3}.  Two upload
strategies:

* **raw** (default): one ``jax.device_put`` of the int8 matrix.  Measured on
  the target TPU host the wire runs at >1 GB/s, so a 2M-site x 40-haplotype
  matrix (80 MB) uploads in ~60 ms — while the *host-side* packing pass below
  costs 350-1200 ms.  Raw wins decisively whenever wire bandwidth exceeds a
  few hundred MB/s.
* **packed** (opt-in via ``GGT_PACKED_TRANSFER=1``): two bit-planes, 2.67x
  fewer wire bytes, unpacked on device with shift/compare ops.  Only pays on
  genuinely slow links (remote tunnels, congested PCIe):

    - ``codes``: 2-bit allele codes, 4 sites/byte  (uint8 [H, ceil(S/4)])
    - ``miss`` : 1-bit missing mask, 8 sites/byte  (uint8 [H, ceil(S/8)])

All kernels keep operating on the plain int8 [H, S] device array either way.
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


def device_alleles(alleles: np.ndarray, sharding=None) -> jnp.ndarray:
    """Upload an int8 [H, S] allele matrix and return the int8 device array.

    Raw ``device_put`` by default (fastest on measured hardware — see module
    docstring); set ``GGT_PACKED_TRANSFER=1`` to ship 2-bit + 1-bit planes
    instead (2.67x fewer wire bytes for slow links).  ``sharding`` optionally
    places the array (e.g. replicated over a mesh).
    """
    H, S = alleles.shape
    if S == 0 or H == 0 or os.environ.get("GGT_PACKED_TRANSFER") != "1":
        return jax.device_put(alleles, sharding)
    codes, miss, s = pack_alleles(alleles)
    out = _unpack(jax.device_put(codes), jax.device_put(miss), s)
    return jax.device_put(out, sharding) if sharding is not None else out
