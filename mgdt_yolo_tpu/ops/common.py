"""Shared spatial ops for NHWC feature maps, built TPU-first.

Resampling (adaptive average pooling, bilinear interpolation) is expressed as
matmuls against small interpolation matrices that are constructed with numpy at
trace time (all shapes are static under jit). This keeps the work on the MXU
and gives exact parity with the torch operators the reference relies on
(`F.adaptive_avg_pool2d`, `F.interpolate(mode='bilinear', align_corners=False)`
— reference nn/modules/block.py:289-399) without any gather traffic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-stochastic matrix reproducing torch adaptive_avg_pool1d.

    Output cell i averages input indices [floor(i*in/out), ceil((i+1)*in/out)).
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


@functools.lru_cache(maxsize=256)
def _block_indicator(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) 0/1 block-membership matrix for divisible pooling.

    Every entry is 0.0 or 1.0 — exactly representable in bf16 — so the
    block *sum* can contract the input in its native dtype with f32
    accumulation on the MXU.
    """
    k = in_size // out_size
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        m[i, i * k:(i + 1) * k] = 1.0
    return m


@functools.lru_cache(maxsize=256)
def _bilinear_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix reproducing torch bilinear resize, align_corners=False."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w_hi = src - lo
        m[i, lo] += 1.0 - w_hi
        m[i, hi] += w_hi
    return m


def _apply_hw_matrices(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Resample NHWC tensor with per-axis (out,in) matrices via two matmuls."""
    dt = x.dtype
    mh = jnp.asarray(mh, dtype=jnp.float32)
    mw = jnp.asarray(mw, dtype=jnp.float32)
    xf = x.astype(jnp.float32)
    # highest precision: these are exact-parity resampling weights, and the
    # matrices are tiny relative to the activations they resample
    y = jnp.einsum("oh,bhwc->bowc", mh, xf, precision="highest")
    y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision="highest")  # -> (b, Ho, Wo, c)
    return y.astype(dt)


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """torch.nn.functional.adaptive_avg_pool2d for NHWC input."""
    oh, ow = (output_size, output_size) if isinstance(output_size, int) else tuple(output_size)
    b, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if h % oh == 0 and w % ow == 0:
        # Divisible fast path: block sums as two MXU contractions against
        # 0/1 indicator matrices (exact in any dtype), f32 accumulation,
        # one final scale. The previous reshape-then-mean form forced XLA
        # to materialize an f32 convert + tiled-layout copy of the whole
        # map on TPU (~20 MB/img inside the MSPA blocks at b512,
        # tools/hbm_traffic.py); this reads the input once, natively.
        eh = jnp.asarray(_block_indicator(h, oh), x.dtype)
        ew = jnp.asarray(_block_indicator(w, ow), x.dtype)
        y = jnp.einsum("oh,bhwc->bowc", eh, x,
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("ow,bhwc->bhoc", ew, y,
                       preferred_element_type=jnp.float32)
        return (y * (1.0 / ((h // oh) * (w // ow)))).astype(x.dtype)
    return _apply_hw_matrices(x, _adaptive_pool_matrix(h, oh), _adaptive_pool_matrix(w, ow))


def interpolate_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) for NHWC input."""
    oh, ow = tuple(size)
    _, h, w, _ = x.shape
    if (h, w) == (oh, ow):
        return x
    return _apply_hw_matrices(x, _bilinear_matrix(h, oh), _bilinear_matrix(w, ow))


def upsample_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Nearest-neighbor integer upsample for NHWC (torch nn.Upsample 'nearest')."""
    x = jnp.repeat(x, scale, axis=1)
    return jnp.repeat(x, scale, axis=2)


def max_pool2d_same(x: jnp.ndarray, kernel: int, stride: int = 1) -> jnp.ndarray:
    """Max pool with torch-style symmetric padding k//2 (used by SPP/SPPF)."""
    pad = kernel // 2
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


def h_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """ReLU6(x + 3) / 6 — hard sigmoid used by the GD injection gate
    (reference nn/modules/block.py:343-349)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0
