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


def _grad_case(rng, B=2, H=16, W=16, C=4, O=6, off_range=1.5):
    x, off, mask, w = _case(rng, B=B, H=H, W=W, C=C, O=O,
                            off_range=off_range)
    bias = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((B, H, W, O)), jnp.float32)
    return x, off, mask, w, bias, cot


def test_vjp_forward_matches_pallas(rng):
    x, off, mask, w, bias, _ = _grad_case(rng)
    from mgdt_yolo_tpu.ops.pallas_deform import \
        modulated_deform_conv2d_pallas_vjp
    a = modulated_deform_conv2d_pallas(x, off, mask, w, bias, interpret=True)
    b = modulated_deform_conv2d_pallas_vjp(x, off, mask, w, bias,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_vjp_grads_match_exact_within_window(rng):
    """In-window offsets: the Pallas backward kernel must reproduce the
    unbounded exact path's gradients for every input (x/offset/mask/
    weight/bias)."""
    from mgdt_yolo_tpu.ops.pallas_deform import \
        modulated_deform_conv2d_pallas_vjp
    x, off, mask, w, bias, cot = _grad_case(rng)

    def loss_exact(x, off, mask, w, bias):
        out = modulated_deform_conv2d(x, off, mask, w, bias, method="exact")
        return jnp.sum(out * cot)

    def loss_pallas(x, off, mask, w, bias):
        out = modulated_deform_conv2d_pallas_vjp(x, off, mask, w, bias,
                                                 interpret=True)
        return jnp.sum(out * cot)

    ge = jax.grad(loss_exact, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, bias)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, bias)
    for name, a, b in zip(("x", "offset", "mask", "weight", "bias"), ge, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-4, err_msg=f"grad wrt {name}")


def test_vjp_grads_match_patch_out_of_window(rng):
    """Out-of-window offsets clamp; gradients must then match the XLA
    patch formulation (the differentiable reference for the windowed
    semantics), not the unbounded path."""
    from mgdt_yolo_tpu.ops.pallas_deform import \
        modulated_deform_conv2d_pallas_vjp
    x, off, mask, w, bias, cot = _grad_case(rng, off_range=4.0)

    def loss_patch(x, off, mask, w, bias):
        out = modulated_deform_conv2d_patch(x, off, mask, w, bias)
        return jnp.sum(out * cot)

    def loss_pallas(x, off, mask, w, bias):
        out = modulated_deform_conv2d_pallas_vjp(x, off, mask, w, bias,
                                                 interpret=True)
        return jnp.sum(out * cot)

    ge = jax.grad(loss_patch, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, bias)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, bias)
    for name, a, b in zip(("x", "offset", "mask", "weight", "bias"), ge, gp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=1e-4, err_msg=f"grad wrt {name}")


def test_patch_pads_short_batches(rng):
    """ADVICE r2 (medium): B > chunk with B % chunk != 0 must pad+slice,
    not assert."""
    x, off, mask, w = _case(rng, B=5, H=8, W=8)
    a = modulated_deform_conv2d_patch(x, off, mask, w, chunk=2)
    b = modulated_deform_conv2d(x, off, mask, w, method="exact")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
