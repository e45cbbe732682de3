"""Test configuration: run everything on a virtual 8-device CPU mesh.

This box's sitecustomize (PYTHONPATH=/root/.axon_site) force-registers the
axon TPU backend at interpreter start and overrides JAX_PLATFORMS, so env
vars alone don't stick. The backend client is still lazy, though: setting
XLA_FLAGS and jax.config BEFORE the first jax operation reliably selects an
8-device virtual CPU platform (the JAX-native substitute for multi-chip
hardware — SURVEY.md §4's fake-cluster story).
"""
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)

# note: deform semantics pins are PER-MODEL (a GraphModel field entered as a
# trace-time scope, ops/deform.py semantics_scope) — no process-global state
# to reset between tests. The r4 autouse reset fixture is gone with the
# global it compensated for.
