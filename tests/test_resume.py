"""Checkpoint/resume + mesh A/B + observability flags.

* kill-and-resume produces byte-identical output (SURVEY §5 checkpoint),
* the sharded mesh path (default on the 8-device CPU test mesh) produces
  byte-identical CSVs to the single-device path (GGT_NO_MESH=1),
* --verbose/--profile actually emit something.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def run_cli(argv, env_extra=None, check=True):
    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    env.pop("PYTHONSTARTUP", None)
    if env_extra:
        env.update(env_extra)
    r = subprocess.run([sys.executable, "-m",
                        "genomics_general_tpu.cli.popgen_windows", *argv],
                       capture_output=True, text=True, env=env)
    if check:
        assert r.returncode == 0, r.stderr[-2000:]
    return r


def popgen_args(data_dir, out, extra=()):
    return ["-g", str(data_dir / "sim1.geno.gz"), "-f", "phased",
            "-w", "20000", "-m", "10", "-p", "pop1", "-p", "pop2",
            "--popsFile", str(data_dir / "sim1.pops.txt"),
            "-o", str(out), *extra]


def test_mesh_vs_single_device_identical(tmp_path, data_dir):
    """The 8-device sharded path (conftest default) == single-device path."""
    mesh_out = tmp_path / "mesh.csv"
    solo_out = tmp_path / "solo.csv"
    run_cli(popgen_args(data_dir, mesh_out))
    run_cli(popgen_args(data_dir, solo_out), env_extra={"GGT_NO_MESH": "1"})
    assert mesh_out.read_bytes() == solo_out.read_bytes()


def test_resume_byte_identical(tmp_path, data_dir):
    full = tmp_path / "full.csv"
    run_cli(popgen_args(data_dir, full))

    # simulate a kill: run with --resume, then truncate the output and
    # rewind the cursor to an earlier flushed batch boundary
    part = tmp_path / "part.csv"
    run_cli(popgen_args(data_dir, part, extra=["--resume"]))
    cursor_path = Path(str(part) + ".cursor")
    # the cursor is cleared after success; recreate a mid-run state by
    # re-running and capturing an intermediate checkpoint via a small flush
    run_cli(popgen_args(data_dir, part, extra=["--resume"]))
    assert part.read_bytes() == full.read_bytes()

    # now emulate an interrupted run: write a cursor pointing into the file
    lines = part.read_text().splitlines(keepends=True)
    assert len(lines) > 4
    cut_rows = len(lines) // 2
    kept = "".join(lines[:cut_rows])
    # windows_done must be the number of *windows processed*; recompute the
    # config key the same way the CLI does
    from genomics_general_tpu.cli import common as cli_common
    from genomics_general_tpu.cli.popgen_windows import build_parser
    args = build_parser().parse_args(popgen_args(data_dir, part,
                                                 extra=["--resume"]))
    key = cli_common.config_key(args)
    part.write_text(kept + "GARBAGE-TAIL-TO-TRUNCATE\n")
    cursor_path.write_text(json.dumps(
        {"config": key, "windows_done": cut_rows - 1,
         "bytes_done": len(kept.encode())}))
    run_cli(popgen_args(data_dir, part, extra=["--resume"]))
    assert part.read_bytes() == full.read_bytes()
    assert not cursor_path.exists()


def test_resume_rejects_gz(tmp_path, data_dir):
    out = tmp_path / "x.csv.gz"
    r = run_cli(popgen_args(data_dir, out, extra=["--resume"]), check=False)
    assert r.returncode != 0
    assert "plain-text" in r.stderr


def test_verbose_and_profile_emit(tmp_path, data_dir):
    out = tmp_path / "v.csv"
    r = run_cli(popgen_args(data_dir, out, extra=["--verbose", "--profile"]))
    assert "[progress]" in r.stderr
    assert "[profile]" in r.stderr
    assert "parse" in r.stderr
