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
  body: python-unrolled PER-TAP window walk. Tap k sits at grid position
  (ty, tx) = divmod(k, 3) inside the window, and its bilinear floor is
  clamped to [ty, ty+4] x [tx, tx+4] (per-tap +/-2 px reach, `_fields`),
  so only the 36 static slots [ty, ty+5] x [tx, tx+5] can ever fire:
    for each tap k:  acc[kC:(k+1)C] += (ay*ax*wv)[None] * x-slice  (C,RB,W)
  i.e. 9 taps x 36 slots x C-wide FMAs = 0.56x the shared 64-slot walk's
  64 x K*C — and no per-slot K-times slab concat. Measured 1.72x the
  shared-slot kernel at b512 80^2 C64 (tools/proto_deform_tapwalk.py);
  runtime slot-skipping was tried and rejected instead (Mosaic lowers
  @pl.when around vector code to masked execution, proto_deform_slot_skip).

The caller (ops/deform.py, method='pallas') precomputes the per-tap
floor/frac/mask fields (cheap elementwise XLA); the shared-weight GEMM
out[p,o] = acc[kc,p] . W[kc,o] runs on the MXU *inside* the kernel
(_kernel_fused), so the (B, K*C, H, W) tap tensor never reaches HBM and
the output is written NHWC directly. Sampling is exact for offsets within
+/-2 px of each tap's rest position (trained TOOD offsets sit well
inside); larger offsets clamp to the tap's own reach — the same exactness
domain as method='patch', whose out-of-window clamp is the shared 8x8
window edge instead.
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


def _tap_axis_weights(t: int, f0, frac):
    """One-hot bilinear weights of one axis for tap-row/col t: slot q gets
    (f0==q)*(1-frac) + (f0==q-1)*frac, for the 6 slots q in [t, t+5]."""
    return [jnp.where(f0 == q, 1.0 - frac, 0.0) +
            jnp.where(f0 == q - 1, frac, 0.0)
            for q in range(t, t + 6)]


def _acc_slots(slab, y0, fy, x0, fx, wv, C: int, W: int):
    """Per-tap static window walk: accumulate the sampled modulated taps
    (K*C, RB, W) in f32 from VMEM-resident data (see module docstring)."""
    accs = []
    for k in range(K):
        ty, tx = divmod(k, 3)
        axs = _tap_axis_weights(tx, x0[k], fx[k])
        acc = jnp.zeros((C, RB, W), jnp.float32)
        for qy in range(ty, ty + 6):
            ay = (jnp.where(y0[k] == qy, 1.0 - fy[k], 0.0) +
                  jnp.where(y0[k] == qy - 1, fy[k], 0.0)) * wv[k]
            for j, qx in enumerate(range(tx, tx + 6)):
                w_q = (ay * axs[j]).astype(jnp.float32)      # (RB, W)
                xs = slab[:, qy:qy + RB, qx:qx + W]          # (C, RB, W)
                acc = acc + w_q[None] * xs.astype(jnp.float32)
        accs.append(acc)
    return jnp.concatenate(accs, axis=0)                     # (K*C, RB, W)


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
    The floor is clamped PER TAP to [t, t+4] (t = the tap's window-grid
    row/col), i.e. offsets clamp to each tap's own +/-2 px reach — this is
    what lets the kernels walk only a tap's 36 reachable slots.
    """
    B = offset.shape[0]
    P = H * W
    f32 = jnp.float32
    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=f32) - 1,
                          jnp.arange(W, dtype=f32) - 1, indexing="ij")
    ty = (jnp.arange(K) // 3).astype(f32).reshape(1, 1, K)
    tx = (jnp.arange(K) % 3).astype(f32).reshape(1, 1, K)
    off = offset.reshape(B, P, K, 2).astype(f32)
    ry = ty + off[..., 0] + 2.0
    rx = tx + off[..., 1] + 2.0
    py = gy.reshape(1, P, 1) + ty + off[..., 0]
    px = gx.reshape(1, P, 1) + tx + off[..., 1]
    valid = (py > -1.0) & (py < H) & (px > -1.0) & (px < W)

    def fr(r, t):
        r0 = jnp.clip(jnp.floor(r), t, t + 4.0)
        f = r - r0
        return r0, jnp.clip(f, 0.0, 1.0), (f >= 0.0) & (f <= 1.0)

    y0, fy, pass_y = fr(ry, ty)
    x0, fx, pass_x = fr(rx, tx)
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
    within the +/-2 px offset domain where both are exact; out-of-window
    offsets clamp to the tap's own reach (see `_fields`).
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


def _bwd_kernel(x_ref, y0_ref, fy_ref, x0_ref, fx_ref, wv_ref, ds_ref,
                s_ref, dx_ref, dfy_ref, dfx_ref, dwv_ref, *, C: int, W: int,
                Wp: int):
    """Backward of the sampling core, same per-tap VMEM walk as forward.

    Per slot q the forward did  sampled[k,c] += w_q[k] * xs[c]  with
    w_q = ay(qy) * ax(qx) * wv.  Given ds = dL/dsampled this emits:
      dw_q[k]   = sum_c ds[k,c] * xs[c]           (-> dfy/dfx/dwv fields)
      dx[slot]  = sum_k w_q[k] * ds[k,c]          (overlap-add outside)
      sampled   = forward recompute (for dWeight; cheaper than saving the
                  (B, K*C, H, W) residual in HBM)
    The walk iterates the 64 absolute window slots; at each slot only the
    taps whose per-tap 6x6 reach covers it contribute (~5 of 9 on
    average), so the per-slot dx bucket is built from just those taps and
    overlap-added once per slot. All K taps are handled in one grid step;
    the fully unrolled 64-slot walk makes Mosaic's stack scope large
    (measured 18.4 MB at C=32, W=40 — past the 16 MB default scoped-vmem
    limit), so the pallas_call raises `vmem_limit_bytes` explicitly
    (v5e VMEM is 128 MB; see deform_sample_bwd).
    """
    r = pl.program_id(1)
    y0 = y0_ref[0]
    fy = fy_ref[0]
    x0 = x0_ref[0]
    fx = fx_ref[0]
    wv = wv_ref[0]
    ds = ds_ref[0].astype(jnp.float32).reshape(K, C, RB, W)
    slab = x_ref[0, :, pl.ds(pl.multiple_of(r * RB, 8), 2 * RB), :]

    # per-tap one-hot axis weights for the tap's 6 reachable slots
    ays = {}
    axs = {}
    for k in range(K):
        ty, tx = divmod(k, 3)
        ays[k] = {ty + i: w for i, w in
                  enumerate(_tap_axis_weights(ty, y0[k], fy[k]))}
        axs[k] = {tx + i: w for i, w in
                  enumerate(_tap_axis_weights(tx, x0[k], fx[k]))}

    acc_s = [jnp.zeros((C, RB, W), jnp.float32) for _ in range(K)]
    acc_dx = jnp.zeros((C, 2 * RB, Wp), jnp.float32)
    acc_dfy = [jnp.zeros((RB, W), jnp.float32) for _ in range(K)]
    acc_dfx = [jnp.zeros((RB, W), jnp.float32) for _ in range(K)]
    acc_dwv = [jnp.zeros((RB, W), jnp.float32) for _ in range(K)]
    for qy in range(M):
        for qx in range(M):
            hit = [k for k in range(K) if qy in ays[k] and qx in axs[k]]
            if not hit:
                continue
            xs = slab[:, qy:qy + RB, qx:qx + W].astype(jnp.float32)
            dxc = jnp.zeros((C, RB, W), jnp.float32)
            for k in hit:
                ay = ays[k][qy]
                ax = axs[k][qx]
                w_q = ay * ax * wv[k]                       # (RB, W)
                acc_s[k] = acc_s[k] + w_q[None] * xs
                dw_q = jnp.sum(ds[k] * xs, axis=0)          # (RB, W)
                dxc = dxc + w_q[None] * ds[k]
                d_ay = dw_q * ax * wv[k]
                d_ax = dw_q * ay * wv[k]
                acc_dfy[k] = acc_dfy[k] + d_ay * (
                    jnp.where(y0[k] == qy - 1, 1.0, 0.0) -
                    jnp.where(y0[k] == qy, 1.0, 0.0))
                acc_dfx[k] = acc_dfx[k] + d_ax * (
                    jnp.where(x0[k] == qx - 1, 1.0, 0.0) -
                    jnp.where(x0[k] == qx, 1.0, 0.0))
                acc_dwv[k] = acc_dwv[k] + dw_q * ay * ax
            acc_dx = acc_dx + jnp.pad(
                dxc, ((0, 0), (qy, RB - qy), (qx, Wp - W - qx)))
    s_ref[0] = jnp.concatenate(acc_s, axis=0).astype(s_ref.dtype)
    dx_ref[0] = acc_dx.astype(dx_ref.dtype)
    stack = lambda a: jnp.concatenate([v[None] for v in a], axis=0)
    dfy_ref[0] = stack(acc_dfy)
    dfx_ref[0] = stack(acc_dfx)
    dwv_ref[0] = stack(acc_dwv)


def deform_sample_bwd(x, y0, fy, x0, fx, wv, dsampled,
                      interpret: bool = False):
    """Backward sampling core: (sampled, dx_parts, dfy, dfx, dwv).

    dx_parts is (B*R, C, 2*RB, Wp) of per-row-block slab gradients whose
    RB-row overlaps the caller folds back together (each output row gets
    contributions from exactly two consecutive row blocks).

    The single-pass 9-tap walk needs more Mosaic stack scope than the
    16 MB default scoped-vmem limit (18.4 MB at C=32/W=40, scaling ~C*W):
    the call sets vmem_limit_bytes=100 MB, which covers the MGDT head
    shapes through l-scale's 80x80 level on a 128 MB-VMEM v5e.
    """
    B, C, Hp, Wp = x.shape
    _, _, H, W = y0.shape
    assert Hp == H + 2 * RB and Wp == W + M - 1
    assert H % RB == 0
    R = H // RB
    fspec = pl.BlockSpec((1, K, RB, W), lambda b, r: (b, 0, r, 0),
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
            grid=(B, R),
            in_specs=[
                pl.BlockSpec((1, C, Hp, Wp), lambda b, r: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                fspec, fspec, fspec, fspec, fspec,
                pl.BlockSpec((1, K * C, RB, W), lambda b, r: (b, 0, r, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, K * C, RB, W), lambda b, r: (b, 0, r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, 2 * RB, Wp),
                             lambda b, r: (b * R + r, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                fspec, fspec, fspec,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
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
    backward a second per-tap window-walk kernel (`deform_sample_bwd`), so
    neither direction materializes the 8x8 im2col in HBM. Gradient
    semantics match the XLA patch formulation on the shared +/-2 px
    domain (per-tap window clamp; clip-boundary subgradients as in
    jnp.clip).
    """
    out = _mdcv2_core(x, offset, mask, weight, interpret)
    if bias is not None:
        out = out + bias
    return out
