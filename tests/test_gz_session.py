"""Native streaming gz session (csrc gz_stream_*) equivalence tests.

The C session serves line-aligned chunks straight out of the compressed
blob (per-member libdeflate for members that fit the chunk buffer, zlib
streaming otherwise).  These tests pin byte-for-byte equality of parsed
chunks against the pure-Python reader path for both gzip shapes.
"""

import gzip
import os

import numpy as np
import pytest

from genomics_general_tpu.io import geno as geno_io
from genomics_general_tpu.testing import simulate_geno_bytes


@pytest.fixture(scope="module")
def geno_text():
    data, inds = simulate_geno_bytes(n_sites=4000, n_scaffolds=3,
                                     scaffold_len=100000)
    return data, inds


def _read_all(path, chunk_bytes=None):
    env = {}
    if chunk_bytes:
        env["GGT_CHUNK_BYTES"] = str(chunk_bytes)
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        r = geno_io.GenoReader(str(path), geno_format="phased")
        d = r.read_all()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return d


def _assert_same(a, b):
    np.testing.assert_array_equal(a.alleles, b.alleles)
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.scaffold_ids, b.scaffold_ids)
    assert a.scaffold_names == b.scaffold_names


@pytest.mark.parametrize("members", ["single", "multi"])
def test_session_matches_python_path(tmp_path, geno_text, members, monkeypatch):
    data, _ = geno_text
    p = tmp_path / "t.geno.gz"
    if members == "single":
        p.write_bytes(gzip.compress(data, compresslevel=4, mtime=0))
    else:
        step = 1 << 16
        p.write_bytes(b"".join(
            gzip.compress(data[i:i + step], compresslevel=4, mtime=0)
            for i in range(0, len(data), step)))

    native = _read_all(p)
    monkeypatch.setenv("GGT_NO_NATIVE_PARSER", "1")
    python = _read_all(p)
    _assert_same(native, python)


def test_session_tiny_chunks(tmp_path, geno_text):
    """Chunk buffer far smaller than a member: zlib streaming + tail carry."""
    data, _ = geno_text
    p = tmp_path / "t.geno.gz"
    p.write_bytes(gzip.compress(data, compresslevel=4, mtime=0))
    big = _read_all(p)
    small = _read_all(p, chunk_bytes=4096)
    _assert_same(big, small)


def test_session_no_trailing_newline(tmp_path, geno_text):
    data, _ = geno_text
    assert data.endswith(b"\n")
    p = tmp_path / "t.geno.gz"
    p.write_bytes(gzip.compress(data[:-1], compresslevel=4, mtime=0))
    full = _read_all(tmp_path / "t.geno.gz")
    q = tmp_path / "u.geno.gz"
    q.write_bytes(gzip.compress(data, compresslevel=4, mtime=0))
    _assert_same(full, _read_all(q))


def test_parallel_member_chunks_match_sequential(tmp_path):
    """Opt-in ParallelGzChunks (member-parallel decompress) must serve the
    identical byte stream as the sequential session, raise on single-member
    input, and raise (not corrupt) on a damaged member."""
    import gzip

    import numpy as np
    import pytest

    from genomics_general_tpu.io.native import (GzChunkStream,
                                                ParallelGzChunks)
    parts = []
    for i in range(7):
        txt = b"".join(b"line%d_%d\tdatadata\n" % (i, j)
                       for j in range(200000))
        parts.append(gzip.compress(txt, compresslevel=1, mtime=0))
    blob = b"".join(parts)

    def drain(sess):
        out = []
        while True:
            c = sess.next_chunk()
            if c is None:
                return b"".join(out)
            out.append(c.tobytes())

    seq = drain(GzChunkStream(blob, 1 << 20))
    par = drain(ParallelGzChunks(blob, 1 << 20))
    assert par == seq

    with pytest.raises(RuntimeError):
        ParallelGzChunks(gzip.compress(b"x\n" * 3_000_000), 1 << 20)

    bad = bytearray(blob)
    bad[len(blob) // 2] ^= 0xFF
    with pytest.raises(RuntimeError):
        drain(ParallelGzChunks(bytes(bad), 1 << 20))


def test_geno_reader_parallel_gz_env(tmp_path):
    """GGT_GZ_THREADS=2 routes the reader through ParallelGzChunks with
    identical parsed output."""
    import subprocess
    import sys

    from .util import REPO
    D = REPO / "tests" / "data"
    out1, out2 = tmp_path / "a.csv", tmp_path / "b.csv"
    args = [sys.executable, "-m", "genomics_general_tpu.cli.popgen_windows",
            "-g", str(D / "sim1.geno.gz"), "-f", "phased", "-w", "50000",
            "-m", "50", "-p", "pop1", "-p", "pop2",
            "--popsFile", str(D / "sim1.pops.txt")]
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    r1 = subprocess.run(args + ["-o", str(out1)], env=env,
                        capture_output=True, cwd=REPO)
    assert r1.returncode == 0, r1.stderr.decode()[-1500:]
    r2 = subprocess.run(args + ["-o", str(out2)],
                        env=dict(env, GGT_GZ_THREADS="2"),
                        capture_output=True, cwd=REPO)
    assert r2.returncode == 0, r2.stderr.decode()[-1500:]
    assert out1.read_bytes() == out2.read_bytes()


def test_fused_gz_false_boundary_recovers(tmp_path):
    """A false member-boundary candidate (mid-member split) must be healed
    by the fused reader's merge-and-retry, with output identical to the
    sequential session."""
    import numpy as np

    from genomics_general_tpu.io import geno as geno_io
    from genomics_general_tpu.testing import write_geno, write_pops_file
    geno = tmp_path / "t.geno.gz"
    pops = tmp_path / "p.txt"
    inds = write_geno(str(geno), n_sites=200000, scaffold_len=6_000_000,
                      n_scaffolds=2)
    write_pops_file(str(pops), inds)

    def read_all(mangle):
        r = geno_io.GenoReader(str(geno), geno_format="phased")
        if mangle:
            assert r._gz_segs is not None and len(r._gz_segs) >= 2
            # split the second segment at a NON-boundary byte: the left
            # half ends mid-member and must fail + merge
            (a, b) = r._gz_segs[1]
            fake = (a + b) // 2
            segs = [r._gz_segs[0], (a, fake), (fake, b)] + r._gz_segs[2:]
            r._gz_segs = segs
        chunks = list(r.iter_chunks(threads=2))
        return (np.concatenate([c.alleles for c in chunks], axis=1),
                np.concatenate([c.positions for c in chunks]),
                np.concatenate([c.scaffold_ids for c in chunks]))

    a1, p1, s1 = read_all(False)
    a2, p2, s2 = read_all(True)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(s1, s2)
    assert p1.size == 200000
