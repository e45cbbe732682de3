"""Modulated deformable convolution v2 (DCNv2) as a TPU-native XLA composition.

Replaces mmcv's CUDA `ModulatedDeformConv2d` (reference nn/modules/block.py:17,
used by DyDCNv2 / TOODHead at head.py:518). Strategy: per kernel tap, sample
the input at offset-shifted positions with differentiable bilinear weights
(4 gathers over the flattened spatial axis), modulate with the mask, then
contract with that tap's (Cin, Cout) kernel slice on the MXU — i.e. the 3x3
deformable conv becomes 9 gathers + 9 matmuls, all statically shaped.

Offset channel convention matches mmcv: for tap k (row-major over the 3x3
window), offset[..., 2k] is the y-shift and offset[..., 2k+1] the x-shift;
mask has one channel per tap, already sigmoid-activated by the caller.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(x_flat: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray,
                     H: int, W: int) -> jnp.ndarray:
    """Sample x at fractional positions with zero padding outside.

    Args:
        x_flat: (B, H*W, C) input.
        py, px: (B, Ho*Wo) fractional sample coordinates in input space.
    Returns:
        (B, Ho*Wo, C) sampled values.
    """
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0  # weight toward y0+1
    wx1 = px - x0

    def corner(yi, xi, w):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
        v = jnp.take_along_axis(x_flat, idx[..., None], axis=1)
        return v * (w * inb)[..., None]

    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    return (corner(y0i, x0i, (1 - wy1) * (1 - wx1)) +
            corner(y0i, x0i + 1, (1 - wy1) * wx1) +
            corner(y0i + 1, x0i, wy1 * (1 - wx1)) +
            corner(y0i + 1, x0i + 1, wy1 * wx1))


def modulated_deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                            weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                            stride: int = 1, padding: int = 1,
                            dilation: int = 1) -> jnp.ndarray:
    """DCNv2 forward for NHWC input.

    Args:
        x: (B, H, W, Cin).
        offset: (B, Ho, Wo, 2*kh*kw) y/x interleaved per tap.
        mask: (B, Ho, Wo, kh*kw) modulation scalars in [0, 1].
        weight: (kh, kw, Cin, Cout) HWIO kernel.
        bias: (Cout,) or None.
    Returns:
        (B, Ho, Wo, Cout).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = (jnp.arange(Ho, dtype=x.dtype) * stride - padding)  # top-left tap origin
    base_x = (jnp.arange(Wo, dtype=x.dtype) * stride - padding)
    gy, gx = jnp.meshgrid(base_y, base_x, indexing="ij")  # (Ho, Wo)
    gy = gy.reshape(1, -1)
    gx = gx.reshape(1, -1)

    x_flat = x.reshape(B, H * W, Cin)
    off = offset.reshape(B, Ho * Wo, kh * kw, 2)
    m = mask.reshape(B, Ho * Wo, kh * kw)

    out = jnp.zeros((B, Ho * Wo, Cout), dtype=jnp.promote_types(x.dtype, jnp.float32))
    for k in range(kh * kw):
        i, j = divmod(k, kw)
        py = gy + i * dilation + off[:, :, k, 0]
        px = gx + j * dilation + off[:, :, k, 1]
        sampled = _bilinear_gather(x_flat, py, px, H, W) * m[:, :, k, None]
        out = out + jnp.einsum("bpc,co->bpo", sampled, weight[i, j],
                               preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)
