"""Default device-mesh selection for the production CLIs.

The CLIs dispatch their window batches through mesh-aware kernel drivers
(kernels/pairdist.py, kernels/counts.py).  On a single chip the drivers run
the plain jit path; with more than one local device they shard the window
batch (data-parallel) / the site axis (sequence-parallel) over a 1-D
``data`` mesh — the TPU-native replacement for the reference's per-script
process pool (/root/reference/popgenWindows.py:386-421; SURVEY §2.3).

``GGT_NO_MESH=1`` forces the single-device path (used to A/B the sharded
path in tests).
"""

from __future__ import annotations

import os


def default_mesh():
    """A 1-D 'data' Mesh over all local devices, or None on a single chip."""
    if os.environ.get("GGT_NO_MESH") == "1":
        return None
    import jax
    devs = jax.devices()
    if len(devs) < 2:
        return None
    from .mesh import make_mesh
    return make_mesh()
