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
    """A 1-D 'data' Mesh over the *local* devices, or None on a single chip.

    In multi-host runs the kernel mesh is local-only: the input is sharded
    across hosts at the scaffold level (parallel/multihost.py), so each
    host's window batches live on its own devices; global collectives are
    reserved for genome-wide accumulators and the final gather."""
    if os.environ.get("GGT_NO_MESH") == "1":
        return None
    import jax
    devs = jax.local_devices()
    if len(devs) < 2:
        return None
    from .mesh import Mesh
    import numpy as np
    return Mesh(np.array(devs), ("data",))
