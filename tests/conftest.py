"""Test configuration: run everything on a virtual 8-device CPU mesh.

Env vars must be set before jax is imported anywhere, hence this top-of-file
block (the JAX-native substitute for the reference's nonexistent multi-GPU
test fixtures — see SURVEY.md §4).
"""
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # overwrite: the session presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
