"""Multi-host (2 real processes) end-to-end test on the CPU fabric.

Spawns two OS processes that bring up ``jax.distributed`` (gloo collectives),
shard the input by scaffold ownership (parallel/multihost.py), run the full
popgenWindows pipeline, and gather rows to a host-0 ordered writer.  The
2-process CSV must be byte-identical to the 1-process CSV — the TPU-native
analog of the reference's "N workers produce the same output as 1"
guarantee (sorter thread, /root/reference/popgenWindows.py:108-140).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
D = REPO / "tests" / "data"

pytestmark = pytest.mark.multihost


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _cli_args(out: str) -> list[str]:
    return ["-g", str(D / "sim1.geno.gz"), "-f", "phased",
            "-w", "50000", "-s", "25000", "-m", "100", "--minData", "0.3",
            "-p", "pop1", "-p", "pop2", "-p", "pop3", "-p", "pop4",
            "--popsFile", str(D / "sim1.pops.txt"),
            "--analysis", "popDist", "popPairDist",
            "--writeFailedWindows", "-o", out]


def _clean_env(extra: dict) -> dict:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env.update({
        "PYTHONPATH": str(REPO),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "GGT_NO_NATIVE_PARSER": os.environ.get("GGT_NO_NATIVE_PARSER", ""),
    })
    env.update(extra)
    return env


def test_two_process_csv_equals_one_process(tmp_path):
    single = tmp_path / "single.csv"
    r = subprocess.run(
        [sys.executable, "-m", "genomics_general_tpu.cli.popgen_windows",
         *_cli_args(str(single))],
        env=_clean_env({}), capture_output=True, timeout=600)
    assert r.returncode == 0, r.stderr.decode()[-2000:]

    dist = tmp_path / "dist.csv"
    port = _free_port()
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "genomics_general_tpu.cli.popgen_windows",
             *_cli_args(str(dist))],
            env=_clean_env({
                "GGT_COORDINATOR": f"127.0.0.1:{port}",
                "GGT_NUM_PROCS": "2",
                "GGT_PROC_ID": str(pid),
            }),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]

    assert dist.read_bytes() == single.read_bytes()
