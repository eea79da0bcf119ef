#!/bin/bash
# Test runner: forces the CPU backend with a virtual 8-device mesh.
# The dev image's sitecustomize pre-imports jax with the TPU (axon) backend;
# clearing PYTHONPATH keeps it out so tests get a clean multi-device CPU jax.
set -euo pipefail
cd "$(dirname "$0")"
export JAX_PLATFORMS=cpu
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
PYTHONPATH= exec python -m pytest tests/ "$@"
