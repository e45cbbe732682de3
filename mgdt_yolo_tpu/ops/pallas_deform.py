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
    out block    (1, RB, W, Cout) — NHWC conv output (taps are contracted
                                    with the weight in-kernel; the K*C
                                    accumulator lives only in VMEM).
  body: python-unrolled loop over the 64 window slots (qy, qx):
    w_q  = [(y0==qy)(1-fy) + (y0+1==qy)fy] * [same for x] * wv   (K,RB,W)
    acc += repeat(w_q, C) * tile(x-slice, K)                      (K*C,RB,W)
  i.e. the bilinear one-hot contraction happens slot-by-slot against
  VMEM-resident data; nothing data-dependent ever indexes memory.

The caller (ops/deform.py, method='pallas') precomputes the per-tap
floor/frac/mask fields (cheap elementwise XLA); the shared-weight GEMM
out[p,o] = acc[kc,p] . W[kc,o] runs on the MXU *inside* the kernel
(_kernel_fused), so the (B, K*C, H, W) tap tensor never reaches HBM and
the output is written NHWC directly. Window coverage and clamping
semantics are identical to method='patch'.
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


def _acc_slots(slab, y0, fy, x0, fx, wv, C: int, W: int):
    """Window-slot walk shared by the forward kernels: accumulate the
    sampled modulated taps (K*C, RB, W) in f32 from VMEM-resident data."""
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
    return acc


def _kernel_fused(x_ref, y0_ref, fy_ref, x0_ref, fx_ref, wv_ref, w_ref,
                  o_ref, *, C: int, W: int):
    """Sampling + shared-weight GEMM in one kernel, NHWC output.

    The two-stage form (deform_sample then an XLA einsum) writes the
    (B, K*C, H, W) tap tensor to HBM and XLA inserts a layout copy of it
    before the GEMM — 11+ MB/img at b512 (tools/hbm_traffic.py). Here the
    taps never leave VMEM: the slot accumulator is contracted against the
    (K*C, Cout) weight on the MXU in-kernel and only the (RB, W, Cout)
    output block is written, already in the NHWC layout the downstream
    GroupNorm/convs read.
    """
    r = pl.program_id(1)
    slab = x_ref[0, :, pl.ds(pl.multiple_of(r * RB, 8), 2 * RB), :]
    acc = _acc_slots(slab, y0_ref[0], fy_ref[0], x0_ref[0], fx_ref[0],
                     wv_ref[0], C, W)
    # Mosaic cannot merge (RB, W) sublane/lane dims into one, so contract
    # row-by-row: RB small (K*C, W)^T . (K*C, Cout) matmuls on the MXU.
    wf = w_ref[...].astype(jnp.float32)
    rows = [jax.lax.dot_general(acc[:, i], wf,
                                dimension_numbers=(((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)[None]
            for i in range(RB)]                   # RB x (1, W, Cout)
    o_ref[0] = jnp.concatenate(rows, axis=0).astype(o_ref.dtype)


def _fields(offset, mask, H, W):
    """Window-relative sampling fields in (B, K, H, W) layout.

    Returns (y0, fy, x0, fx, wv, pass_y, pass_x, valid): floor/frac per
    axis, modulation*validity, and the clip-pass indicators the backward
    needs (d fy / d off_y = 1 exactly where the frac survived its clips).
    """
    B = offset.shape[0]
    P = H * W
    f32 = jnp.float32
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=f32) - 1,
                          jnp.arange(W, dtype=f32) - 1, indexing="ij")
    ty = (jnp.arange(K) // 3).astype(f32)
    tx = (jnp.arange(K) % 3).astype(f32)
    off = offset.reshape(B, P, K, 2).astype(f32)
    ry = ty.reshape(1, 1, K) + off[..., 0] + 2.0
    rx = tx.reshape(1, 1, K) + off[..., 1] + 2.0
    py = gy.reshape(1, P, 1) + ty.reshape(1, 1, K) + off[..., 0]
    px = gx.reshape(1, P, 1) + tx.reshape(1, 1, K) + off[..., 1]
    valid = (py > -1.0) & (py < H) & (px > -1.0) & (px < W)

    def fr(r):
        r0 = jnp.clip(jnp.floor(r), 0, M - 2)
        f = r - r0
        return r0, jnp.clip(f, 0.0, 1.0), (f >= 0.0) & (f <= 1.0)

    y0, fy, pass_y = fr(ry)
    x0, fx, pass_x = fr(rx)
    wv = mask.reshape(B, P, K).astype(f32) * valid

    def bkhw(a):  # (B, P, K) -> (B, K, H, W)
        return a.transpose(0, 2, 1).reshape(B, K, H, W)

    return tuple(bkhw(a) for a in (y0, fy, x0, fx, wv)) + (pass_y, pass_x,
                                                           valid)


def _pad_cf(x):
    """NHWC -> channels-first with the kernel's slab padding.

    Rows padded to H + 2*RB so the aligned 16-row slab never reads out of
    bounds (front 3 = window margin, back fills the slab).
    """
    xp = jnp.pad(x, ((0, 0), (3, 2 * RB - 3), (3, M - 4), (0, 0)))
    return xp.transpose(0, 3, 1, 2)


def modulated_deform_conv2d_pallas(x, offset, mask, weight, bias=None,
                                   interpret: bool = False):
    """DCNv2 eval kernel: Pallas sampling + in-kernel MXU GEMM, NHWC out.

    Same signature/semantics as ops.deform.modulated_deform_conv2d_patch
    (8x8 window, +/-2 px universal offset coverage, out-of-window clamp).
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    assert kh == 3 and kw == 3
    assert H % RB == 0, f"H={H} must be a multiple of {RB}"
    y0, fy, x0, fx, wv = _fields(offset, mask, H, W)[:5]
    xp = _pad_cf(x)
    _, _, Hp, Wp = xp.shape
    wf = weight.reshape(K * Cin, Cout)
    fspec = pl.BlockSpec((1, K, RB, W), lambda b, r: (b, 0, r, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_fused, C=Cin, W=W),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(B, H // RB),
            in_specs=[
                pl.BlockSpec((1, Cin, Hp, Wp), lambda b, r: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                fspec, fspec, fspec, fspec, fspec,
                pl.BlockSpec((K * Cin, Cout), lambda b, r: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, RB, W, Cout), lambda b, r: (b, r, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, y0, fy, x0, fx, wv, wf)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


KB = 3         # taps per backward grid step (VMEM budget: K at once OOMs)


def _bwd_kernel(x_ref, y0_ref, fy_ref, x0_ref, fx_ref, wv_ref, ds_ref,
                s_ref, dx_ref, dfy_ref, dfx_ref, dwv_ref, *, C: int, W: int,
                Wp: int):
    """Backward of the sampling core, same VMEM window-slot walk as forward.

    Per slot q the forward did  sampled[k,c] += w_q[k] * xs[c]  with
    w_q = ay(qy) * ax(qx) * wv.  Given ds = dL/dsampled this emits:
      dw_q[k]   = sum_c ds[k,c] * xs[c]           (-> dfy/dfx/dwv fields)
      dx[slot]  = sum_k w_q[k] * ds[k,c]          (overlap-add outside)
      sampled   = forward recompute (for dWeight; cheaper than saving the
                  (B, K*C, H, W) residual in HBM)
    The grid's fastest dim walks K/KB tap chunks so per-step live buffers
    fit scoped VMEM; the dx slab block's index map ignores that dim, so it
    stays VMEM-resident and accumulates across the chunks.
    """
    r = pl.program_id(1)
    kc = pl.program_id(2)
    y0 = y0_ref[0]
    fy = fy_ref[0]
    x0 = x0_ref[0]
    fx = fx_ref[0]
    wv = wv_ref[0]
    ds = ds_ref[0].astype(jnp.float32).reshape(KB, C, RB, W)
    slab = x_ref[0, :, pl.ds(pl.multiple_of(r * RB, 8), 2 * RB), :]

    @pl.when(kc == 0)
    def _():
        dx_ref[0] = jnp.zeros_like(dx_ref[0])

    acc_s = jnp.zeros((KB, C, RB, W), jnp.float32)
    acc_dx = jnp.zeros((C, 2 * RB, Wp), jnp.float32)
    acc_dfy = jnp.zeros((KB, RB, W), jnp.float32)
    acc_dfx = jnp.zeros((KB, RB, W), jnp.float32)
    acc_dwv = jnp.zeros((KB, RB, W), jnp.float32)
    for q in range(M * M):
        qy, qx = divmod(q, M)
        ay = jnp.where(y0 == qy, 1.0 - fy, 0.0) + \
            jnp.where(y0 == qy - 1, fy, 0.0)
        ax = jnp.where(x0 == qx, 1.0 - fx, 0.0) + \
            jnp.where(x0 == qx - 1, fx, 0.0)
        w_q = ay * ax * wv                              # (KB, RB, W)
        xs = slab[:, qy:qy + RB, qx:qx + W].astype(jnp.float32)
        acc_s = acc_s + w_q[:, None] * xs[None]
        dw_q = jnp.sum(ds * xs[None], axis=1)           # (KB, RB, W)
        dxc = jnp.sum(w_q[:, None] * ds, axis=0)        # (C, RB, W)
        acc_dx = acc_dx + jnp.pad(
            dxc, ((0, 0), (qy, RB - qy), (qx, Wp - W - qx)))
        d_ay = dw_q * ax * wv
        d_ax = dw_q * ay * wv
        acc_dfy = acc_dfy + d_ay * (jnp.where(y0 == qy - 1, 1.0, 0.0) -
                                    jnp.where(y0 == qy, 1.0, 0.0))
        acc_dfx = acc_dfx + d_ax * (jnp.where(x0 == qx - 1, 1.0, 0.0) -
                                    jnp.where(x0 == qx, 1.0, 0.0))
        acc_dwv = acc_dwv + dw_q * ay * ax
    s_ref[0] = acc_s.reshape(KB * C, RB, W).astype(s_ref.dtype)
    dx_ref[0] = dx_ref[0] + acc_dx.astype(dx_ref.dtype)
    dfy_ref[0] = acc_dfy
    dfx_ref[0] = acc_dfx
    dwv_ref[0] = acc_dwv


def deform_sample_bwd(x, y0, fy, x0, fx, wv, dsampled,
                      interpret: bool = False):
    """Backward sampling core: (sampled, dx_parts, dfy, dfx, dwv).

    dx_parts is (B*R, C, 2*RB, Wp) of per-row-block slab gradients whose
    RB-row overlaps the caller folds back together (each output row gets
    contributions from exactly two consecutive row blocks).
    """
    B, C, Hp, Wp = x.shape
    _, _, H, W = y0.shape
    assert Hp == H + 2 * RB and Wp == W + M - 1
    assert H % RB == 0
    assert K % KB == 0
    R = H // RB
    fspec = pl.BlockSpec((1, KB, RB, W), lambda b, r, kc: (b, kc, r, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, C=C, W=W, Wp=Wp),
        out_shape=(
            jax.ShapeDtypeStruct((B, K * C, H, W), x.dtype),
            jax.ShapeDtypeStruct((B * R, C, 2 * RB, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
        ),
        grid_spec=pl.GridSpec(
            grid=(B, R, K // KB),
            in_specs=[
                pl.BlockSpec((1, C, Hp, Wp), lambda b, r, kc: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                fspec, fspec, fspec, fspec, fspec,
                pl.BlockSpec((1, KB * C, RB, W),
                             lambda b, r, kc: (b, kc, r, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, KB * C, RB, W),
                             lambda b, r, kc: (b, kc, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, 2 * RB, Wp),
                             lambda b, r, kc: (b * R + r, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                fspec, fspec, fspec,
            ),
        ),
        interpret=interpret,
    )(x, y0, fy, x0, fx, wv, dsampled)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _mdcv2_core(x, offset, mask, weight, interpret=False):
    return modulated_deform_conv2d_pallas(x, offset, mask, weight,
                                          interpret=interpret)


def _mdcv2_fwd(x, offset, mask, weight, interpret):
    return _mdcv2_core(x, offset, mask, weight, interpret), \
        (x, offset, mask, weight)


def _mdcv2_bwd(interpret, res, g):
    x, offset, mask, weight = res
    B, H, W, Cin = x.shape
    Cout = weight.shape[-1]
    R = H // RB
    Wp = W + M - 1
    g = g.astype(jnp.float32)
    y0, fy, x0, fx, wv, pass_y, pass_x, valid = _fields(offset, mask, H, W)
    wf = weight.reshape(K * Cin, Cout).astype(jnp.float32)
    dsampled = jnp.einsum("bhwo,fo->bfhw", g, wf,
                          preferred_element_type=jnp.float32).astype(x.dtype)
    sampled, dx_parts, dfy, dfx, dwv = deform_sample_bwd(
        _pad_cf(x), y0, fy, x0, fx, wv, dsampled, interpret=interpret)

    dwf = jnp.einsum("bfhw,bhwo->fo", sampled.astype(jnp.float32), g,
                     preferred_element_type=jnp.float32)
    dweight = dwf.reshape(weight.shape).astype(weight.dtype)

    # overlap-add the slab gradients: block r's rows cover padded rows
    # [r*RB, r*RB + 2*RB), so row j gets block j//RB's first half plus
    # block j//RB - 1's second half; then strip the (3, 3) window margin.
    parts = dx_parts.reshape(B, R, Cin, 2 * RB, Wp)
    first = parts[:, :, :, :RB].transpose(0, 2, 1, 3, 4).reshape(
        B, Cin, H, Wp)
    second = parts[:, :, :, RB:].transpose(0, 2, 1, 3, 4).reshape(
        B, Cin, H, Wp)
    pad_rows = 2 * RB  # padded image has H + 2*RB rows
    dxp = (jnp.pad(first, ((0, 0), (0, 0), (0, pad_rows), (0, 0))) +
           jnp.pad(second, ((0, 0), (0, 0), (RB, pad_rows - RB), (0, 0))))
    dx = dxp[:, :, 3:3 + H, 3:3 + W].transpose(0, 2, 3, 1).astype(x.dtype)

    def pbk(a):  # (B, K, H, W) -> (B, P, K)
        return a.reshape(B, K, H * W).transpose(0, 2, 1)

    d_off_y = pbk(dfy) * pass_y
    d_off_x = pbk(dfx) * pass_x
    doffset = jnp.stack([d_off_y, d_off_x], axis=-1).reshape(
        offset.shape).astype(offset.dtype)
    dmask = (pbk(dwv) * valid).reshape(mask.shape).astype(mask.dtype)
    return dx, doffset, dmask, dweight


_mdcv2_core.defvjp(_mdcv2_fwd, _mdcv2_bwd)


def modulated_deform_conv2d_pallas_vjp(x, offset, mask, weight, bias=None,
                                       interpret: bool = False):
    """Differentiable DCNv2 on the Pallas VMEM kernels (fwd + bwd).

    Training-path replacement for mmcv's CUDA op (reference
    nn/modules/block.py:17): forward is `modulated_deform_conv2d_pallas`,
    backward a second window-slot kernel (`deform_sample_bwd`), so neither
    direction materializes the 8x8 im2col in HBM. Gradient semantics match
    the XLA patch formulation (window clamp; clip-boundary subgradients as
    in jnp.clip).
    """
    out = _mdcv2_core(x, offset, mask, weight, interpret)
    if bias is not None:
        out = out + bias
    return out
