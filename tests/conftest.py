import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware; set before any jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

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
