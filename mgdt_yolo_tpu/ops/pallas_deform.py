"""Pallas TPU kernel for the deform-conv sampling core.

The XLA 'patch' path (ops/deform.py) materializes an 8x8 im2col in HBM
(~P*64*C bytes) and contracts it with one-hot bilinear weights — both
stages are HBM-bandwidth bound (measured ~21 ms + ~19 ms per 32-image
chunk on v5e). This kernel keeps the whole window computation in VMEM:

  grid (B, H/RB): each step owns RB=8 output rows of one image.
    x block      (1, C, Hp, Wp)   — the padded image, channels-first so a
                                    window slice needs no transpose; loaded
                                    once per image (index map ignores the
                                    row index, consecutive steps reuse it).
    field blocks (1, K, RB, W)    — floor/frac/mask-valid fields per tap.
    out block    (1, K*C, RB, W)  — sampled taps, K*C on sublanes, pixels
                                    on lanes (no 4x lane padding a C=32
                                    minor dim would cost).
  body: python-unrolled loop over the 64 window slots (qy, qx):
    w_q  = [(y0==qy)(1-fy) + (y0+1==qy)fy] * [same for x] * wv   (K,RB,W)
    acc += repeat(w_q, C) * tile(x-slice, K)                      (K*C,RB,W)
  i.e. the bilinear one-hot contraction happens slot-by-slot against
  VMEM-resident data; nothing data-dependent ever indexes memory.

The caller (ops/deform.py, method='pallas') precomputes the per-tap
floor/frac/mask fields (cheap elementwise XLA) and finishes with the
shared-weight GEMM  out[b,p,o] = sampled[b,kc,p] . W[kc,o]  on the MXU.
Window coverage and clamping semantics are identical to method='patch'.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 8          # window side (matches ops/deform.py patch method)
RB = 8         # output rows per grid step
K = 9          # 3x3 taps


def _kernel(x_ref, y0_ref, fy_ref, x0_ref, fx_ref, wv_ref, o_ref, *,
            C: int, W: int):
    r = pl.program_id(1)
    y0 = y0_ref[0]          # (K, RB, W) f32: floor(ry) clipped to [0, M-2]
    fy = fy_ref[0]
    x0 = x0_ref[0]
    fx = fx_ref[0]
    wv = wv_ref[0]          # mask * valid
    # one aligned 2*RB-row slab per block (start r*RB is 8-aligned — Mosaic
    # rejects the unaligned per-slot row starts); every window slice below
    # is then a static in-register slice of this value
    slab = x_ref[0, :, pl.ds(pl.multiple_of(r * RB, 8), 2 * RB), :]
    acc = jnp.zeros((K * C, RB, W), jnp.float32)
    for q in range(M * M):
        qy, qx = divmod(q, M)
        ay = jnp.where(y0 == qy, 1.0 - fy, 0.0) + \
            jnp.where(y0 == qy - 1, fy, 0.0)
        ax = jnp.where(x0 == qx, 1.0 - fx, 0.0) + \
            jnp.where(x0 == qx - 1, fx, 0.0)
        w_q = ay * ax * wv                        # (K, RB, W)
        xs = slab[:, qy:qy + RB, qx:qx + W]       # (C, RB, W) static slice
        # k-major element repeat via outer-dim broadcast (pltpu.repeat tiles)
        w_qx = jnp.broadcast_to(w_q[:, None], (K, C, RB, W)) \
            .reshape(K * C, RB, W)
        xs_t = jnp.concatenate([xs] * K, axis=0)  # (K*C, RB, W), k-major
        acc = acc + w_qx.astype(jnp.float32) * xs_t.astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def deform_sample(x: jnp.ndarray, y0: jnp.ndarray, fy: jnp.ndarray,
                  x0: jnp.ndarray, fx: jnp.ndarray, wv: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Sampled modulated taps for every output pixel.

    Args:
        x: (B, C, Hp, Wp) padded channels-first image, Hp = H + M - 1.
        y0/fy/x0/fx/wv: (B, K, H, W) f32 window-relative floor, fraction
            and modulation-validity fields.
    Returns:
        (B, K*C, H, W) sampled taps in x.dtype (k-major: feature = k*C+c;
        accumulation is f32 in-kernel, only the stored result narrows).
    """
    B, C, Hp, Wp = x.shape
    _, _, H, W = y0.shape
    assert Hp == H + 2 * RB and Wp == W + M - 1  # extra rows: aligned slab loads
    assert H % RB == 0, f"H={H} must be a multiple of {RB}"
    grid = (B, H // RB)
    fspec = pl.BlockSpec((1, K, RB, W), lambda b, r: (b, 0, r, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, C=C, W=W),
        out_shape=jax.ShapeDtypeStruct((B, K * C, H, W), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, C, Hp, Wp), lambda b, r: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                fspec, fspec, fspec, fspec, fspec,
            ],
            out_specs=pl.BlockSpec((1, K * C, RB, W),
                                   lambda b, r: (b, 0, r, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, y0, fy, x0, fx, wv)


def modulated_deform_conv2d_pallas(x, offset, mask, weight, bias=None,
                                   interpret: bool = False):
    """DCNv2 eval kernel: Pallas sampling core + MXU shared-weight GEMM.

    Same signature/semantics as ops.deform.modulated_deform_conv2d_patch
    (8x8 window, +/-2 px universal offset coverage, out-of-window clamp).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    assert kh == 3 and kw == 3
    P = H * W
    f32 = jnp.float32

    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=f32) - 1,
                          jnp.arange(W, dtype=f32) - 1, indexing="ij")
    ty = (jnp.arange(K) // kw).astype(f32)
    tx = (jnp.arange(K) % kw).astype(f32)
    off = offset.reshape(B, P, K, 2).astype(f32)
    ry = ty.reshape(1, 1, K) + off[..., 0] + 2.0
    rx = tx.reshape(1, 1, K) + off[..., 1] + 2.0
    py = gy.reshape(1, P, 1) + ty.reshape(1, 1, K) + off[..., 0]
    px = gx.reshape(1, P, 1) + tx.reshape(1, 1, K) + off[..., 1]
    valid = (py > -1.0) & (py < H) & (px > -1.0) & (px < W)

    def fields(r):
        r0 = jnp.clip(jnp.floor(r), 0, M - 2)
        return r0, jnp.clip(r - r0, 0.0, 1.0)

    y0, fy = fields(ry)
    x0, fx = fields(rx)
    wv = mask.reshape(B, P, K).astype(f32) * valid

    def bkhw(a):  # (B, P, K) -> (B, K, H, W)
        return a.transpose(0, 2, 1).reshape(B, K, H, W)

    # rows padded to H + 2*RB so the kernel's aligned 16-row slab never
    # reads out of bounds (front 3 = window margin, back fills the slab)
    xp = jnp.pad(x, ((0, 0), (3, 2 * RB - 3), (3, M - 4), (0, 0)))
    xcf = xp.transpose(0, 3, 1, 2)  # channels-first for transpose-free slices
    sampled = deform_sample(xcf, bkhw(y0), bkhw(fy), bkhw(x0), bkhw(fx),
                            bkhw(wv), interpret=interpret)
    # shared-weight GEMM on the MXU: feature = k*C + c matches weight layout
    wf = weight.reshape(K * Cin, Cout)
    out = jnp.einsum("bfhw,fo->bhwo", sampled.astype(x.dtype),
                     wf.astype(x.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
