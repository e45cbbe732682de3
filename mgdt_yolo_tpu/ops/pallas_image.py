"""Fused train-input augmentation: uint8 ingest + HSV jitter + flips +
normalize in one device pass.

BASELINE.json names the input pipeline (normalize + HSV + flips) as a fused
device-side kernel feeding HBM-resident NHWC batches. Shipping uint8 to the
device is 4x less host->device traffic than float32; the augment math then
runs fused on-chip.

Two implementations with identical semantics:
- fused_augment (default): one jitted XLA program — the whole chain is
  elementwise, XLA fuses it into a single loop over the batch.
- fused_augment_pallas: explicit Pallas kernel operating on channel-plane
  (B, 3, H, W) layout so the trailing dim is lane-aligned (W multiple of
  128); one grid step per image. Useful as the scheduling-controlled variant
  when composing with DMA pipelines.

HSV math is the continuous rotation form (exact for multiplicative gains),
vs cv2's uint8-LUT path used by the host augmenter — they agree to ~1/255.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hsv_adjust(r, g, b, gains):
    """Continuous HSV gain adjustment on [0,1] RGB planes. gains: (3,)."""
    cmax = jnp.maximum(r, jnp.maximum(g, b))
    cmin = jnp.minimum(r, jnp.minimum(g, b))
    delta = cmax - cmin + 1e-12
    h = jnp.where(cmax == r, ((g - b) / delta) % 6.0,
                  jnp.where(cmax == g, (b - r) / delta + 2.0,
                            (r - g) / delta + 4.0)) / 6.0
    s = delta / (cmax + 1e-12)
    v = cmax
    h = (h * gains[0]) % 1.0
    s = jnp.clip(s * gains[1], 0.0, 1.0)
    v = jnp.clip(v * gains[2], 0.0, 1.0)
    h6 = h * 6.0
    c = v * s
    xx = c * (1.0 - jnp.abs(h6 % 2.0 - 1.0))
    m = v - c
    sector = jnp.floor(h6) % 6.0
    zeros = c * 0.0

    def pick(cases):
        out = cases[5]
        for k in range(4, -1, -1):
            out = jnp.where(sector < k + 0.5, cases[k], out)
        return out

    r2 = pick([c, xx, zeros, zeros, xx, c]) + m
    g2 = pick([xx, c, c, xx, zeros, zeros]) + m
    b2 = pick([zeros, zeros, xx, c, c, xx]) + m
    return r2, g2, b2


def _apply_flips_u8(images_u8, flips):
    flips = flips.astype(jnp.int32)
    images_u8 = jnp.where(flips[:, 0, None, None, None] > 0,
                          images_u8[:, :, ::-1], images_u8)
    return jnp.where(flips[:, 1, None, None, None] > 0,
                     images_u8[:, ::-1], images_u8)


@jax.jit
def fused_augment(images_u8: jnp.ndarray, hsv_gains: jnp.ndarray,
                  flips: jnp.ndarray) -> jnp.ndarray:
    """XLA-fused augment.

    Args:
        images_u8: (B, H, W, 3) uint8 RGB.
        hsv_gains: (B, 3) float32 multiplicative h/s/v gains (1.0 = identity).
        flips: (B, 2) int [fliplr, flipud] flags.
    Returns:
        (B, H, W, 3) float32 normalized, augmented.
    """
    x = _apply_flips_u8(images_u8, flips).astype(jnp.float32) / 255.0

    def one(img, gains):
        r, g, b = _hsv_adjust(img[..., 0], img[..., 1], img[..., 2], gains)
        return jnp.stack([r, g, b], axis=-1)

    return jax.vmap(one)(x, hsv_gains)


@jax.jit
def fused_augment_pallas(images_u8: jnp.ndarray, hsv_gains: jnp.ndarray,
                         flips: jnp.ndarray) -> jnp.ndarray:
    """Pallas variant: channel-plane layout, one image per grid step."""
    B, H, W, _ = images_u8.shape
    x = _apply_flips_u8(images_u8, flips)
    planes = jnp.transpose(x, (0, 3, 1, 2))  # (B, 3, H, W): W lane-aligned

    def kernel(gains_ref, img_ref, out_ref):
        i = pl.program_id(0)
        xf = img_ref[0].astype(jnp.int32).astype(jnp.float32) / 255.0  # (3,H,W)
        r, g, b = _hsv_adjust(xf[0], xf[1], xf[2],
                              (gains_ref[i, 0], gains_ref[i, 1], gains_ref[i, 2]))
        out_ref[0] = jnp.stack([r, g, b], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, H, W), lambda i, *_: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 3, H, W), lambda i, *_: (i, 0, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, H, W), jnp.float32),
    )(hsv_gains, planes)
    return jnp.transpose(out, (0, 2, 3, 1))


def fused_augment_reference(images_u8: np.ndarray, hsv_gains: np.ndarray,
                            flips: np.ndarray) -> np.ndarray:
    """numpy reference of the same continuous math (for tests)."""
    x = images_u8.astype(np.float32) / 255.0
    out = np.empty_like(x)
    for i in range(len(x)):
        img = x[i]
        if flips[i, 0]:
            img = img[:, ::-1]
        if flips[i, 1]:
            img = img[::-1]
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        cmax = np.maximum(r, np.maximum(g, b))
        cmin = np.minimum(r, np.minimum(g, b))
        delta = cmax - cmin + 1e-12
        h = np.where(cmax == r, ((g - b) / delta) % 6.0,
                     np.where(cmax == g, (b - r) / delta + 2.0,
                              (r - g) / delta + 4.0)) / 6.0
        s = delta / (cmax + 1e-12)
        v = cmax
        h = (h * hsv_gains[i, 0]) % 1.0
        s = np.clip(s * hsv_gains[i, 1], 0, 1)
        v = np.clip(v * hsv_gains[i, 2], 0, 1)
        h6 = h * 6.0
        c = v * s
        xx = c * (1 - np.abs(h6 % 2 - 1))
        m = v - c
        sec = np.floor(h6).astype(int) % 6
        r2 = np.choose(sec, [c, xx, c * 0, c * 0, xx, c])
        g2 = np.choose(sec, [xx, c, c, xx, c * 0, c * 0])
        b2 = np.choose(sec, [c * 0, c * 0, xx, c, c, xx])
        out[i] = np.stack([r2 + m, g2 + m, b2 + m], -1)
    return out
