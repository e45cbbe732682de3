"""Modulated deformable convolution v2 (DCNv2) as a TPU-native XLA composition.

Replaces mmcv's CUDA `ModulatedDeformConv2d` (reference nn/modules/block.py:17,
used by DyDCNv2 / TOODHead at head.py:518).

TPU gather cost is dominated by per-index overhead, not bytes (measured on
v5e: a (128, 6400)-index gather costs ~16 ms whether rows are 64 or 256
channels wide). So instead of 9 taps x 4 bilinear corners = 36 gathers, we
pack each position's 2x2 corner neighborhood into one 4C-wide row of a
padded "quad" tensor and fetch ALL taps' corners with ONE gather of
(B, P*9) indices — 5x faster end-to-end, bit-identical output ('exact').
The serving path goes further: modulated_deform_conv2d_patch removes the
gather entirely (static im2col + one-hot bilinear weights on the MXU,
measured 1.9x the exact op / 1.57x whole-model on v5e), exact for offsets
within its +/-2 px window.

Offset channel convention matches mmcv: for tap k (row-major over the 3x3
window), offset[..., 2k] is the y-shift and offset[..., 2k+1] the x-shift;
mask has one channel per tap, already sigmoid-activated by the caller.
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp

_LOGGED_PATHS: set = set()

# PER-MODEL semantics pin, scoped at trace time. The windowed kernels are
# only mAP-safe when every consumer (training, eval, export) matches the
# semantics the weights were TRAINED under (measured: a windowed-trained
# MGDT ckpt drops mAP50-95 0.619 -> 0.362 under exact eval —
# tools/deform_window_audit.py / README results table). Each model graph
# (nn/tasks.GraphModel) carries a `deform_semantics` field and enters
# `semantics_scope` around its own trace, so two models with different
# pins coexist in one process (Ensemble, benchmark format sweeps, serve)
# — the r4 process-global pin re-pinned EVERY model on each load.
# Values: "auto" keeps the platform default dispatch (windowed on TPU);
# "exact" pins the unbounded reference semantics everywhere, training
# included (torch-imported / exact-trained weights); "windowed" pins the
# per-tap-clamped kernels everywhere (windowed-trained weights — off-TPU
# training then rides the differentiable `patch` path). MGDT_DEFORM_EXACT
# still wins over any pin (escape hatch, reference parity runs).
from contextvars import ContextVar

_SCOPE: ContextVar = ContextVar("mgdt_deform_semantics", default="auto")

VALID_SEMANTICS = ("auto", "exact", "windowed")


def check_semantics(sem: str) -> str:
    if sem not in VALID_SEMANTICS:
        raise ValueError(f"unknown deform semantics {sem!r}; "
                         f"expected one of {VALID_SEMANTICS}")
    return sem


class semantics_scope:
    """Context manager pinning the deform dispatch for traces inside it."""

    def __init__(self, sem: str):
        self.sem = check_semantics(sem)
        self._token = None

    def __enter__(self):
        self._token = _SCOPE.set(self.sem)
        return self

    def __exit__(self, *exc):
        _SCOPE.reset(self._token)
        return False


def current_semantics() -> str:
    """The pin active for traces at this point ('auto' outside any scope)."""
    return _SCOPE.get()


def training_semantics(pinned: str = "auto") -> str:
    """What method='auto' selects for TRAINING under the given pin:
    'windowed' (per-tap-clamped kernels: pallas_vjp on TPU, patch off-TPU)
    or 'exact' (unbounded reference semantics). Recorded into checkpoint
    sidecar json by the trainer so every later consumer (resume, eval at
    load, export metadata) can match it."""
    if os.environ.get("MGDT_DEFORM_EXACT"):
        return "exact"
    if check_semantics(pinned) != "auto":
        return pinned
    if (jax.default_backend() == "tpu"
            and not os.environ.get("MGDT_DEFORM_NO_PALLAS")):
        return "windowed"
    return "windowed" if os.environ.get("MGDT_DEFORM_FAST_TRAIN") else "exact"


def eval_semantics(pinned: str = "auto") -> str:
    """What method='auto' selects for EVAL under the given pin (the value
    export legs record next to their artifacts): 'exact' only when forced
    by env or pin — the default eval dispatch is windowed on every backend
    (pallas on TPU, the XLA patch path elsewhere)."""
    if os.environ.get("MGDT_DEFORM_EXACT"):
        return "exact"
    return "windowed" if check_semantics(pinned) == "auto" else pinned


def _log_fast_path_once(method: str, train: bool) -> None:
    """Announce the clamped-window fast path the first time it is chosen.

    The windowed kernels are exact only while each tap's bilinear support
    lies within that tap's own reach (floor clamped to [t, t+4] in window
    coordinates, i.e. roughly [-2, +3) px around the tap's rest position);
    offsets beyond a tap's reach clamp to it. `MGDT_DEFORM_EXACT=1`
    restores the unbounded-offset reference semantics everywhere — for
    TRAINING as well: on TPU, method='auto' + train selects the windowed
    pallas_vjp kernel by default. See PARITY.md §2.14.
    """
    key = (method, train)
    if key not in _LOGGED_PATHS:
        _LOGGED_PATHS.add(key)
        logging.getLogger("mgdt_yolo_tpu").info(
            "deform-conv %s path selected (%s): exact within each tap's "
            "per-tap reach (~+/-2 px), clamped to the tap's reach outside; "
            "MGDT_DEFORM_EXACT=1 to force the unbounded path",
            method, "train" if train else "eval")


def modulated_deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray, mask: jnp.ndarray,
                            weight: jnp.ndarray, bias: jnp.ndarray | None = None,
                            stride: int = 1, padding: int = 1,
                            dilation: int = 1,
                            method: str = "auto",
                            train: bool = True) -> jnp.ndarray:
    """DCNv2 forward for NHWC input.

    Args:
        x: (B, H, W, Cin).
        offset: (B, Ho, Wo, 2*kh*kw) y/x interleaved per tap.
        mask: (B, Ho, Wo, kh*kw) modulation scalars in [0, 1].
        weight: (kh, kw, Cin, Cout) HWIO kernel.
        bias: (Cout,) or None.
        method: 'exact' (unbounded-offset gather), 'patch' (gather-free
            static-window kernel, see modulated_deform_conv2d_patch),
            'pallas' / 'pallas_vjp' (VMEM kernels, eval / differentiable),
            or 'auto': on TPU the Pallas kernels for both eval and
            training of the standard 3x3/s1/d1 config, exact otherwise
            (MGDT_DEFORM_EXACT=1 forces unbounded semantics).
        train: eval-vs-train hint consumed by method='auto'.
    Returns:
        (B, Ho, Wo, Cout).
    """
    if method == "auto":
        std = (stride == 1 and padding == 1 and dilation == 1
               and weight.shape[0] == weight.shape[1] == 3)
        # the per-model pin (semantics_scope, entered by GraphModel around
        # its trace) governs BOTH training and eval dispatch; the env
        # escape hatch MGDT_DEFORM_EXACT wins over any pin
        scope = _SCOPE.get()
        if (std and not os.environ.get("MGDT_DEFORM_EXACT")
                and scope != "exact"):
            from .pallas_deform import RB
            pallas_ok = (jax.default_backend() == "tpu"
                         and x.shape[1] % RB == 0
                         and not os.environ.get("MGDT_DEFORM_NO_PALLAS"))
            if not train:
                # serving: Pallas VMEM kernel (3.6x the XLA patch path);
                # other backends / odd shapes: the XLA patch path
                method = "pallas" if pallas_ok else "patch"
            elif pallas_ok:
                # training rides VMEM too: custom_vjp pairs the forward
                # kernel with a second window-slot backward kernel
                method = "pallas_vjp"
            elif (scope == "windowed"
                  or os.environ.get("MGDT_DEFORM_FAST_TRAIN")):
                # windowed-pinned training off-TPU: the differentiable XLA
                # patch path shares the pallas kernels' clamped semantics
                method = "patch"
            else:
                method = "exact"
        else:
            method = "exact"
        if method != "exact":
            _log_fast_path_once(method, train)
    if method == "pallas":
        from .pallas_deform import modulated_deform_conv2d_pallas
        return modulated_deform_conv2d_pallas(x, offset, mask, weight, bias)
    if method == "pallas_vjp":
        from .pallas_deform import modulated_deform_conv2d_pallas_vjp
        return modulated_deform_conv2d_pallas_vjp(x, offset, mask, weight,
                                                  bias)
    if method == "patch":
        return modulated_deform_conv2d_patch(x, offset, mask, weight, bias)
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    Ho = (H + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    P = Ho * Wo

    # fractional sample positions per (output position, tap): (B, P, K)
    base_y = (jnp.arange(Ho, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(Wo, dtype=jnp.float32) * stride - padding)
    gy, gx = jnp.meshgrid(base_y, base_x, indexing="ij")
    tap_y = (jnp.arange(K) // kw).astype(jnp.float32) * dilation
    tap_x = (jnp.arange(K) % kw).astype(jnp.float32) * dilation
    off = offset.reshape(B, P, K, 2).astype(jnp.float32)
    py = gy.reshape(1, P, 1) + tap_y.reshape(1, 1, K) + off[..., 0]
    px = gx.reshape(1, P, 1) + tap_x.reshape(1, 1, K) + off[..., 1]

    # quad tensor over the extended grid [-1, H] x [-1, W]: row (y, x) holds
    # the 2x2 corner block [x[y,x], x[y,x+1], x[y+1,x], x[y+1,x+1]], with
    # zero padding supplying out-of-bounds corners exactly
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))  # grid [-1, H+1]
    He, We = H + 2, W + 2  # quad grid spans y,x in [-1, H] -> He=H+2 rows
    xq = jnp.concatenate([
        xp[:, 0:He, 0:We], xp[:, 0:He, 1:We + 1],
        xp[:, 1:He + 1, 0:We], xp[:, 1:He + 1, 1:We + 1]], axis=-1)
    xq = xq.reshape(B, He * We, 4 * Cin)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0  # weight toward y0+1
    wx = px - x0
    # a sample contributes iff its bilinear support intersects the grid
    valid = (py > -1.0) & (py < H) & (px > -1.0) & (px < W)
    y0c = jnp.clip(y0, -1, H).astype(jnp.int32)
    x0c = jnp.clip(x0, -1, W).astype(jnp.int32)
    idx = (y0c + 1) * We + (x0c + 1)  # (B, P, K) into the extended grid

    g = jnp.take_along_axis(xq, idx.reshape(B, P * K)[..., None], axis=1)
    g = g.reshape(B, P, K, 4, Cin)
    cw = jnp.stack([(1 - wy) * (1 - wx), (1 - wy) * wx,
                    wy * (1 - wx), wy * wx], axis=-1)  # (B, P, K, 4)
    cw = (cw * valid[..., None]).astype(g.dtype)
    sampled = jnp.einsum("bpkqc,bpkq->bpkc", g, cw)
    sampled = sampled * mask.reshape(B, P, K, 1).astype(g.dtype)

    out = jnp.einsum("bpkc,kco->bpo", sampled,
                     weight.reshape(K, Cin, Cout).astype(sampled.dtype),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.reshape(B, Ho, Wo, Cout).astype(x.dtype)


def modulated_deform_conv2d_patch(x: jnp.ndarray, offset: jnp.ndarray,
                                  mask: jnp.ndarray, weight: jnp.ndarray,
                                  bias: jnp.ndarray | None = None,
                                  M: int = 8, chunk: int = 32) -> jnp.ndarray:
    """Gather-free DCNv2 for the standard 3x3 / stride 1 / dilation 1 case.

    Every tap of output pixel (i, j) samples near base (i-1, j-1)+tap, so an
    MxM window whose origin is a *static* function of the output grid covers
    all taps for offsets within each tap's own reach: the bilinear floor is
    clamped per tap to [t, t+4] window slots, i.e. the tap is exact for
    offsets in roughly [-2, +3) px of its rest position and clamps beyond.
    That turns the data-dependent
    gather (per-index-overhead bound on TPU: ~20 ns/row regardless of width)
    into (a) a static im2col — M*M shifted slices, pure HBM bandwidth — and
    (b) per-(pixel, tap) bilinear one-hot weights contracted against the
    window on the MXU. Bit-equal to the exact path whenever every tap's
    bilinear support lies inside its reach; larger offsets clamp to the
    tap's reach. On TPU this windowed semantics is the default for BOTH
    serving and training (method='auto' -> pallas / pallas_vjp); parity
    tests and non-TPU training use the unbounded `exact` path, and
    MGDT_DEFORM_EXACT=1 forces it everywhere — see `method` in
    modulated_deform_conv2d and PARITY.md §2.14.
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    assert kh == 3 and kw == 3, "patch method is specialized to 3x3"
    K = 9
    P = H * W
    f32 = jnp.float32

    if B > chunk:  # bound the im2col intermediate (~P*M*M*C per image)
        Bp = -(-B // chunk) * chunk  # short final val batches: pad + slice
        if Bp != B:
            pad = ((0, Bp - B), (0, 0), (0, 0), (0, 0))
            x, offset, mask = (jnp.pad(a, pad) for a in (x, offset, mask))
        out = jax.lax.map(
            lambda t: modulated_deform_conv2d_patch(*t, weight, bias, M=M,
                                                    chunk=chunk),
            (x.reshape(Bp // chunk, chunk, H, W, Cin),
             offset.reshape(Bp // chunk, chunk, H, W, offset.shape[-1]),
             mask.reshape(Bp // chunk, chunk, H, W, K)),
        ).reshape(Bp, H, W, Cout)
        return out[:B]

    # static im2col: patch[b, (i,j), c, (qy,qx)] = xpad[b, i+qy, j+qx, c];
    # window origin (i-3, j-3) == padded coord (i, j) with 3 rows of pre-pad.
    # XLA's native patches op keeps the feature dim lane-aligned (C*M*M wide)
    # — hand-stacked views here produced catastrophically padded (…,1,C)
    # copies on TPU. Output feature order is channel-major: c*M*M + qy*M + qx.
    patch = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(M, M), window_strides=(1, 1),
        padding=((3, M - 4), (3, M - 4)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    patch = patch.reshape(B, P, Cin, M * M)

    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=f32) - 1,
                          jnp.arange(W, dtype=f32) - 1, indexing="ij")
    ty = (jnp.arange(K) // kw).astype(f32)
    tx = (jnp.arange(K) % kw).astype(f32)
    off = offset.reshape(B, P, K, 2).astype(f32)
    ry = ty.reshape(1, 1, K) + off[..., 0] + 2.0  # window-relative position
    rx = tx.reshape(1, 1, K) + off[..., 1] + 2.0
    py = gy.reshape(1, P, 1) + ty.reshape(1, 1, K) + off[..., 0]  # absolute
    px = gx.reshape(1, P, 1) + tx.reshape(1, 1, K) + off[..., 1]
    valid = (py > -1.0) & (py < H) & (px > -1.0) & (px < W)

    # per-axis one-hot bilinear weights, outer-product combined to M*M slots
    # (weights computed f32, stored/contracted in the compute dtype — the
    # big (B,P,K,M,M) intermediate is bandwidth, not precision, critical).
    # The floor clamps PER TAP to [t, t+4] — each tap's own +/-2 px reach —
    # matching ops/pallas_deform._fields so the XLA fallback and the Pallas
    # kernel share one windowed semantics (and one differentiable reference).
    def axis_w(r, t):
        r0 = jnp.clip(jnp.floor(r), t.reshape(1, 1, K), t.reshape(1, 1, K) + 4.0)
        f = jnp.clip(r - r0, 0.0, 1.0)
        slots = jnp.arange(M, dtype=f32)
        oh0 = (slots == r0[..., None]).astype(f32)
        oh1 = (slots == (r0 + 1)[..., None]).astype(f32)
        return oh0 * (1 - f)[..., None] + oh1 * f[..., None]  # (B, P, K, M)

    wk = mask.reshape(B, P, K).astype(f32) * valid
    w2d = jnp.einsum("bpki,bpkj->bpkij",
                     (axis_w(ry, ty) * wk[..., None]).astype(x.dtype),
                     axis_w(rx, tx).astype(x.dtype)).reshape(B, P, K, M * M)
    sampled = jnp.einsum("bpkq,bpcq->bpkc", w2d, patch)
    out = jnp.einsum("bpkc,kco->bpo", sampled,
                     weight.reshape(K, Cin, Cout).astype(sampled.dtype),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.reshape(B, H, W, Cout).astype(x.dtype)
