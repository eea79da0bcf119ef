import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; set before any jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Some environments install a sitecustomize hook that registers an
# alternative TPU backend and forcibly overrides the jax_platforms config
# at interpreter start; override it back so tests always run on the
# virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# The pairwise executor auto-places small-H flushes on the host C path;
# tests default to the device (jit) executor so the golden suite keeps
# covering the XLA kernels (fixtures are all small-H).  Host-executor
# equality has its own tests (test_pair_v3.py) and CLI runs with
# GGT_EXEC=host.
os.environ.setdefault("GGT_EXEC", "tpu")

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def data_dir():
    d = Path(__file__).parent / "data"
    d.mkdir(exist_ok=True)
    return d


@pytest.fixture(scope="session")
def golden_dir():
    return Path(__file__).parent / "golden"
