"""Pallas deform-sampling kernel: interpret-mode parity with the XLA patch
path (the TPU lowering is exercised by tools/proto_deform_patch.py and the
bench; CPU CI uses the Pallas interpreter)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mgdt_yolo_tpu.ops.deform import (modulated_deform_conv2d,
                                      modulated_deform_conv2d_patch)
from mgdt_yolo_tpu.ops.pallas_deform import modulated_deform_conv2d_pallas


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _case(rng, B=2, H=16, W=16, C=4, O=6, off_range=1.9):
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    off = jnp.asarray(rng.uniform(-off_range, off_range, (B, H, W, 18)),
                      jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (B, H, W, 9)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, O)) * 0.2, jnp.float32)
    return x, off, mask, w


def test_matches_patch_path(rng):
    x, off, mask, w = _case(rng)
    a = modulated_deform_conv2d_patch(x, off, mask, w)
    b = modulated_deform_conv2d_pallas(x, off, mask, w, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)


def test_matches_exact_within_window(rng):
    x, off, mask, w = _case(rng, off_range=1.5)
    a = modulated_deform_conv2d(x, off, mask, w, method="exact")
    b = modulated_deform_conv2d_pallas(x, off, mask, w, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_bias_and_rect_shapes(rng):
    x, off, mask, w = _case(rng, H=8, W=24, C=8, O=4)
    bias = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    a = modulated_deform_conv2d_patch(x, off, mask, w, bias)
    b = modulated_deform_conv2d_pallas(x, off, mask, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)
