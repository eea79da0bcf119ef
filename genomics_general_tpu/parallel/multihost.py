"""Multi-host execution: jax.distributed init, per-host input sharding,
host-0 ordered output.

The reference parallelizes within one node via a process pool + sorter
thread (/root/reference/popgenWindows.py:386-421); there is no inter-node
capability.  This module supplies the TPU-native multi-host analog
(SURVEY §2.3 / §5 "distributed backend"):

* ``jax.distributed.initialize`` (from env or explicit args) brings up the
  global runtime; collectives ride ICI within a slice and DCN across hosts
  (gloo on the CPU test fabric),
* **input sharding**: each host parses the shared input and keeps only the
  scaffolds it owns — ownership is a stable hash of the scaffold name, so
  every host agrees without coordination and ownership is known before any
  data is read (required for predefined window lists),
* each host runs the normal single-host streaming pipeline on its scaffold
  subset; per-window rows stay in host-local per-scaffold buffers,
* **host-0 ordered writer**: rows are allgathered at the end and written by
  process 0 grouped by scaffold in genome (file) order — bit-identical to a
  single-host run (window order within a scaffold is deterministic by
  construction, so no sorter is needed),
* genome-wide accumulators (SFS, jackknife partials) merge with ``psum``
  (parallel/mesh.py); per-window stats never need cross-host traffic.

Tested end-to-end with two real processes on the CPU fabric in
tests/test_multihost.py (2-process CSV == 1-process CSV).
"""

from __future__ import annotations

import os
import pickle
import zlib


def maybe_initialize() -> None:
    """Initialize jax.distributed from GGT_* env vars if present.

    GGT_COORDINATOR=host:port GGT_NUM_PROCS=N GGT_PROC_ID=i — explicit
    single-machine / ad-hoc clusters.  On managed clusters (where JAX can
    auto-detect), set GGT_DIST_AUTO=1 instead.
    """
    import jax
    if os.environ.get("GGT_COORDINATOR"):
        jax.distributed.initialize(
            coordinator_address=os.environ["GGT_COORDINATOR"],
            num_processes=int(os.environ["GGT_NUM_PROCS"]),
            process_id=int(os.environ["GGT_PROC_ID"]))
    elif os.environ.get("GGT_DIST_AUTO") == "1":
        jax.distributed.initialize()


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def owner(scaffold_name: str, n_procs: int) -> int:
    """Stable scaffold -> host assignment (crc32: identical on every host,
    no coordination, known before reading any data)."""
    return zlib.crc32(scaffold_name.encode()) % n_procs


def shard_predicate(n_procs: int, rank: int):
    """Predicate(scaffold_name) -> bool: does this host own the scaffold?"""
    return lambda name: owner(name, n_procs) == rank


class _IndexedScaffoldStream:
    """File-like serving the geno header plus this host's owned scaffolds'
    decompressed lines out of a BGZF+.tbi input, in global (index) order."""

    def __init__(self, path: str, owned: list[str], header: bytes,
                 idx, rd):
        self._path = path
        self._idx = idx
        self._rd = rd
        self._buf = header

        def lines():
            INT64_MAX = (1 << 63) - 1
            from ..io import tabix as T
            for name in owned:
                for ln in T.region_lines(path, name, 1, INT64_MAX - 1,
                                         index=idx, reader=rd):
                    yield ln

        self._lines = lines()
        self._eof = False

    def read(self, n: int) -> bytes:
        while not self._eof and len(self._buf) < n:
            parts = [self._buf]
            got = len(self._buf)
            for ln in self._lines:
                parts.append(ln)
                parts.append(b"\n")
                got += len(ln) + 1
                if got >= n:
                    break
            else:
                self._eof = True
            self._buf = b"".join(parts)
        out, self._buf = self._buf[:n], self._buf[n:]
        return out


def indexed_input(geno_file: str | None, shard_pred):
    """(stream, scaffold_names) reading ONLY this host's owned scaffolds
    through a native ``{geno_file}.tbi`` index (io/tabix), or (None, None)
    when no index exists.

    Without an index every host decompresses and tokenizes the WHOLE
    shared input and drops the scaffolds it does not own — parse cost is
    replicated N-fold and bounds host scaling.  With the index each host
    reads ~1/N of the blocks.  ``scaffold_names`` is the index's full
    contig list: callers preseed the reader with it so scaffold ids (and
    the incremental-gather thresholds derived from them) are globally
    consistent across hosts even though each host only SEES its own
    scaffolds."""
    import os

    if not geno_file or not os.path.exists(str(geno_file) + ".tbi"):
        return None, None
    from ..io import tabix as T
    try:
        idx = T.TabixIndex(str(geno_file) + ".tbi")
        rd = T.BGZFReader(str(geno_file))
        # header = leading '#' lines (read whole blocks until a data line)
        header = b""
        pos = 0
        while True:
            payload, pos = rd.block_at(pos)
            header += payload
            # stop once a complete non-# line exists
            done = False
            off = 0
            while True:
                nl = header.find(b"\n", off)
                if nl < 0:
                    break
                if nl > off and not header[off:nl].startswith(b"#"):
                    done = True
                    break
                off = nl + 1
            if done or not payload:
                header = header[:off]
                break
    except (ValueError, OSError):
        return None, None
    owned = [n for n in idx.names if shard_pred(n)]
    return _IndexedScaffoldStream(str(geno_file), owned, header, idx, rd), \
        list(idx.names)


def mesh_reduce_stacked(stacked, mesh, op: str = "sum"):
    """Reduce a host-stacked [k, ...] array over a device mesh axis.

    The same reduce body as :func:`collective_reduce` but sharded over an
    explicit (local) mesh — used by the driver's multichip dryrun to execute
    the production psum/pmin merge on an n-device mesh without n processes.
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    spec = NamedSharding(mesh, P(axis))
    with jax.enable_x64():
        garr = jax.device_put(np.ascontiguousarray(stacked), spec)

        @functools.partial(jax.jit, static_argnames=("op",),
                           out_shardings=NamedSharding(mesh, P()))
        def red(x, op):
            return jnp.sum(x, axis=0) if op == "sum" else jnp.min(x, axis=0)

        out = np.asarray(red(garr, op))
    return out


def collective_reduce(arr, op: str = "sum"):
    """Reduce a host-local int64 accumulator across processes on device.

    Builds a one-device-per-process mesh, shards the stacked [n_procs, ...]
    array over it, and jit-reduces along the process axis — XLA lowers the
    reduction to a psum/pmin collective over the fabric (ICI/DCN on TPU
    pods, gloo on the CPU test fabric).  Used to merge SFS spectra counts
    (sum) and first-occurrence order keys (min); exact for int64."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n = jax.process_count()
    if n == 1:
        return arr
    devs = [next(d for d in jax.devices() if d.process_index == p)
            for p in range(n)]
    mesh = Mesh(np.array(devs), ("hosts",))
    spec = NamedSharding(mesh, P("hosts"))
    local = np.ascontiguousarray(arr)[None]
    with jax.enable_x64():               # int64 must survive the transfer
        garr = jax.make_array_from_process_local_data(
            spec, local, (n,) + local.shape[1:])

        @functools.partial(jax.jit, static_argnames=("op",),
                           out_shardings=NamedSharding(mesh, P()))
        def red(x, op):
            return jnp.sum(x, axis=0) if op == "sum" else jnp.min(x, axis=0)

        out = np.asarray(red(garr, op))
    return out.astype(arr.dtype).reshape(arr.shape)


def allgather_bytes(payload: bytes) -> list[bytes]:
    """Gather one bytes blob from every process (returned in rank order)."""
    import numpy as np
    from jax.experimental import multihost_utils

    arr = np.frombuffer(payload, dtype=np.uint8)
    lengths = multihost_utils.process_allgather(
        np.array([arr.size], dtype=np.int64))
    max_len = int(lengths.max())
    padded = np.zeros(max_len, dtype=np.uint8)
    padded[:arr.size] = arr
    gathered = multihost_utils.process_allgather(padded)
    return [bytes(gathered[i, :int(lengths[i, 0])])
            for i in range(gathered.shape[0])]


class MultiHostWriter:
    """Host-local row buffers merged to an ordered host-0 CSV.

    Two ordering modes:

    * **scaffold blocks** (coordinate/sites windows): each host buffers rows
      per scaffold it owns; ``finish`` allgathers the buffers and process 0
      writes blocks in genome (file) order.  Every host observes the full
      scaffold sequence of the shared input, so host 0's order is the genome
      order, and within a scaffold window order is deterministic by
      construction.
    * **explicit keys** (predefined window lists): rows carry their global
      windCoords row index and host 0 writes them key-sorted — byte-identical
      to a single-host run even when the window file interleaves scaffolds
      (plain scaffold grouping would reorder such files)."""

    SEGMENT_RAW = 4 << 20      # compress buffered text in ~4 MB segments

    def __init__(self, incremental_every: int | None = None,
                 open_out=None, header: str = ""):
        # per-scaffold: (list of zlib-compressed segments, list of pending
        # raw strings, pending raw length).  Compressing as we go bounds the
        # held memory at roughly the compressed output size (~10x smaller
        # for CSV/TSV text) instead of the full uncompressed stream —
        # genome-scale per-site outputs (freq) would otherwise hold the
        # entire file on every host.
        self.blocks: dict[str, tuple[list[bytes], list[str], int]] = {}
        self.keyed_rows: list[tuple[int, str]] = []
        # incremental gather: every ``incremental_every`` scaffolds of the
        # shared input stream, all hosts run one allgather round and host 0
        # writes those scaffolds immediately — peak buffered memory is
        # O(scaffold group), not O(output).  Every host observes the same
        # scaffold sequence, so the round trigger (a scaffold INDEX
        # threshold) fires identically everywhere — the collective call
        # counts always match.  Incompatible with keyed rows (predefined
        # window files interleave scaffolds).
        self.incr = incremental_every
        self._open_out = open_out
        self._header = header
        self._out = None
        self._rounds_done = 0           # scaffolds gathered so far
        self.peak_buffered = 0          # diagnostics: max held compressed B

    def _track_peak(self):
        held = sum(len(s) for segs, raw, _ in self.blocks.values()
                   for s in segs)
        held += sum(rl for _, _, rl in self.blocks.values())
        if held > self.peak_buffered:
            self.peak_buffered = held

    def maybe_gather(self, completed_idx: int, scaffold_names: list) -> None:
        """Run incremental gather rounds for every full scaffold group below
        ``completed_idx`` (the index of the first scaffold NOT yet fully
        processed on this host).  Call with increasing values; every host
        must call through the same thresholds (they do: the shared stream
        shows all hosts the same scaffold order)."""
        if not self.incr:
            return
        assert not self.keyed_rows, \
            "incremental gather is incompatible with keyed rows"
        while self._rounds_done + self.incr <= completed_idx:
            lo = self._rounds_done
            hi = lo + self.incr
            self._gather_round(scaffold_names[lo:hi])
            self._rounds_done = hi

    def _gather_round(self, names: list) -> None:
        group = {}
        for n in names:
            entry = self.blocks.pop(n, None)
            if entry is not None:
                segs, raw, _ = entry
                if raw:
                    segs = segs + [zlib.compress("".join(raw).encode(), 1)]
                group[n] = segs
        self._track_peak()
        payload = pickle.dumps(group, protocol=pickle.HIGHEST_PROTOCOL)
        gathered = allgather_bytes(payload)
        if process_index() != 0:
            return
        if self._out is None:
            self._out = self._open_out()
            self._out.write(self._header)
        merged: dict[str, list[bytes]] = {}
        for blob in gathered:
            for k, segs in pickle.loads(blob).items():
                merged.setdefault(k, []).extend(segs)
        for n in names:
            for seg in merged.get(n, ()):
                self._out.write(zlib.decompress(seg).decode())

    def write_row(self, scaffold: str, line: str,
                  order_key: int | None = None) -> None:
        if order_key is not None:
            self.keyed_rows.append((order_key, line))
            return
        entry = self.blocks.get(scaffold)
        if entry is None:
            entry = ([], [], 0)
            self.blocks[scaffold] = entry
        segs, raw, raw_len = entry
        raw.append(line)
        raw_len += len(line)
        if raw_len >= self.SEGMENT_RAW:
            segs.append(zlib.compress("".join(raw).encode(), 1))
            raw.clear()
            raw_len = 0
        self.blocks[scaffold] = (segs, raw, raw_len)

    def _sealed(self) -> dict[str, list[bytes]]:
        out = {}
        for k, (segs, raw, _) in self.blocks.items():
            if raw:
                segs = segs + [zlib.compress("".join(raw).encode(), 1)]
            out[k] = segs
        return out

    def finish(self, out, header: str, scaffold_order: list[str]) -> None:
        """Gather all hosts' remaining rows; process 0 writes them in order
        (after the header, or appended to the incremental stream)."""
        self._track_peak()
        payload = pickle.dumps((self._sealed(), self.keyed_rows),
                               protocol=pickle.HIGHEST_PROTOCOL)
        gathered = allgather_bytes(payload)
        if process_index() != 0:
            return
        merged: dict[str, list[bytes]] = {}
        keyed: list[tuple[int, str]] = []
        for blob in gathered:
            blocks, rows = pickle.loads(blob)
            for k, segs in blocks.items():
                # defensive: scaffold ownership is disjoint, but never
                # silently drop rows if two hosts ever emit the same key
                merged.setdefault(k, []).extend(segs)
            keyed.extend(rows)
        if self.incr:
            # the writer owns the stream in incremental mode; already-
            # gathered scaffolds were written by their rounds
            if self._out is None:
                self._out = self._open_out()
                self._out.write(self._header)
            out = self._out
            scaffold_order = scaffold_order[self._rounds_done:]
        else:
            out.write(header)
        keyed.sort(key=lambda kv: kv[0])
        for _, line in keyed:
            out.write(line)

        def write_scaf(name):
            for seg in merged.pop(name):
                out.write(zlib.decompress(seg).decode())

        for name in scaffold_order:
            if name in merged:
                write_scaf(name)
        # scaffolds only present in predefined window lists but absent from
        # host-0's observed order: write in deterministic name order
        for name in sorted(merged):
            write_scaf(name)
        return out
