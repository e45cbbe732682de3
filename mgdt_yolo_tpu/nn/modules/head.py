"""Detection heads: Detect (fork reg_max=4), TOODHead, Segment, Pose, Classify.

TPU-native re-design of reference nn/modules/head.py. Heads return
`(decoded, feats)`: `feats` is the per-scale raw map list consumed by the
loss; `decoded` is the eval-path (B, 4+nc, A) tensor (DFL integral decode +
dist2bbox x stride + sigmoid cls), or None while strides are still being
discovered. Anchors are built from static feature shapes at trace time —
no shape-change caching needed under jit.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.boxes import dist2bbox, make_anchors
from .block import DyDCNv2, Proto, dfl_decode
from .conv import Conv, get_act, torch_conv_init


def _head_conv(c2: int, k: int, dtype, name: str):
    """Plain conv2d with bias (torch nn.Conv2d equivalent)."""
    pad = k // 2
    return nn.Conv(c2, (k, k), padding=[(pad, pad), (pad, pad)], use_bias=True,
                   kernel_init=torch_conv_init, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class Conv_GN(nn.Module):
    """conv + GroupNorm(16) + SiLU (reference head.py:67-81)."""
    c2: int
    k: int = 1
    s: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.k // 2
        y = nn.Conv(self.c2, (self.k, self.k), strides=self.s,
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    kernel_init=torch_conv_init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        y = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="gn")(y)
        return get_act(self.act)(y)


class TaskDecomposition(nn.Module):
    """Layer attention over stacked tower features (reference head.py:83-131).

    The reduction conv is folded into a per-sample batched matmul: the layer
    attention weight (b, stacked) scales the reduction kernel's per-block
    columns, then one bhwi x bfi einsum applies it — the memory/FLOP-saving
    bmm trick of the reference, which maps straight onto the MXU.

    Quirk preserved: the reference creates a bias on the reduction conv but
    never applies it in the bmm path; we create it too (checkpoint-shape
    parity) and likewise leave it unused.
    """
    feat_channels: int
    stacked_convs: int
    la_down_rate: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat, avg_feat=None, train: bool = False):
        b, h, w, cin = feat.shape
        fc = self.feat_channels
        if avg_feat is None:
            avg_feat = jnp.mean(feat, axis=(1, 2), keepdims=True)
        wgt = _head_conv(cin // self.la_down_rate, 1, self.dtype, "la_conv1")(avg_feat)
        wgt = nn.relu(wgt)
        wgt = _head_conv(self.stacked_convs, 1, self.dtype, "la_conv2")(wgt)
        wgt = nn.sigmoid(wgt)  # (b,1,1,stacked)

        kernel = self.param("reduction_weight", torch_conv_init, (1, 1, cin, fc))
        _ = self.param("reduction_bias", nn.initializers.zeros, (fc,))  # unused (quirk)
        # (b, stacked) attention scales the (stacked, fc) blocks of the kernel
        k = kernel.reshape(self.stacked_convs, fc, fc)  # (stacked, fc_in_block, fc_out)
        wgt = wgt.reshape(b, self.stacked_convs)
        conv_w = jnp.einsum("bs,sif->bsif", wgt, k.astype(self.dtype)).reshape(b, cin, fc)
        out = jnp.einsum("bhwi,bif->bhwf", feat, conv_w,
                         preferred_element_type=jnp.float32).astype(feat.dtype)
        return nn.relu(out)


class Detect(nn.Module):
    """YOLOv8 decoupled detect head; fork sets reg_max=4 (head.py:133-186)."""
    nc: int = 80
    ch: Tuple[int, ...] = ()
    reg_max: int = 4  # fork quirk: upstream uses 16 (reference head.py:145)
    strides: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], self.nc)
        feats = []
        for i, x in enumerate(xs):
            box = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            box = Conv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(box, train)
            box = _head_conv(4 * self.reg_max, 1, self.dtype, f"cv2_{i}_2")(box)
            cls = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            cls = Conv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(cls, train)
            cls = _head_conv(self.nc, 1, self.dtype, f"cv3_{i}_2")(cls)
            feats.append(jnp.concatenate([box, cls], axis=-1))
        if train or self.strides is None:
            return None, feats
        return decode_detections(feats, self.strides, self.nc, self.reg_max), feats


def decode_detections(feats: Sequence[jnp.ndarray], strides: Sequence[int],
                      nc: int, reg_max: int) -> jnp.ndarray:
    """Eval-path decode shared by Detect/TOODHead (reference head.py:154-177).

    Returns (B, 4+nc, A): xywh in input pixels, then sigmoid class scores.
    """
    b = feats[0].shape[0]
    no = nc + reg_max * 4
    flat = jnp.concatenate([f.reshape(b, -1, no) for f in feats], axis=1)  # (b, A, no)
    box, cls = flat[..., :reg_max * 4], flat[..., reg_max * 4:]
    shapes = [f.shape[1:3] for f in feats]
    anchors, stride_t = make_anchors(shapes, strides, 0.5)
    dist = dfl_decode(box, reg_max) if reg_max > 1 else box
    dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
    out = jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1)
    return jnp.transpose(out, (0, 2, 1))  # (b, 4+nc, A) reference layout


class TOODHead(nn.Module):
    """Task-aligned decoupled head with deformable reg alignment
    (reference head.py:466-572). reg_max=16 here even though Detect uses 4."""
    nc: int
    hidc: int
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    strides: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        half = self.hidc // 2
        share0 = Conv_GN(half, 3, dtype=self.dtype, name="share_conv_0")
        share1 = Conv_GN(half, 3, dtype=self.dtype, name="share_conv_1")
        cls_decomp = TaskDecomposition(half, 2, 16, dtype=self.dtype, name="cls_decomp")
        reg_decomp = TaskDecomposition(half, 2, 16, dtype=self.dtype, name="reg_decomp")
        dydcn = DyDCNv2(half, dtype=self.dtype, name="DyDCNV2")
        offset_conv = _head_conv(27, 3, self.dtype, "spatial_conv_offset")
        prob1 = _head_conv(self.hidc // 4, 1, self.dtype, "cls_prob_conv1")
        prob2 = _head_conv(1, 3, self.dtype, "cls_prob_conv2")
        cv2 = _head_conv(4 * self.reg_max, 1, self.dtype, "cv2")
        cv3 = _head_conv(self.nc, 1, self.dtype, "cv3")

        feats = []
        for x in xs:
            s1 = share0(x, train)
            s2 = share1(s1, train)
            feat = jnp.concatenate([s1, s2], axis=-1)  # (b,h,w,hidc)

            avg_feat = jnp.mean(feat, axis=(1, 2), keepdims=True)
            cls_feat = cls_decomp(feat, avg_feat, train)
            reg_feat = reg_decomp(feat, avg_feat, train)

            om = offset_conv(feat)
            offset = om[..., :18]
            mask = jax.nn.sigmoid(om[..., 18:])
            reg_feat = dydcn(reg_feat, offset, mask, train)

            cls_prob = jax.nn.sigmoid(prob2(nn.relu(prob1(feat))))
            out = jnp.concatenate([cv2(nn.relu(reg_feat)), cv3(cls_feat * cls_prob)],
                                  axis=-1)
            feats.append(out)
        if train or self.strides is None:
            return None, feats
        return decode_detections(feats, self.strides, self.nc, self.reg_max), feats


class Segment(nn.Module):
    """Detect + prototype masks + coefficient branch (reference head.py:189-212)."""
    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: Tuple[int, ...] = ()
    reg_max: int = 4
    strides: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        c4 = max(self.ch[0] // 4, self.nm)
        mcs = []
        for i, x in enumerate(xs):
            mc = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            mc = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(mc, train)
            mcs.append(_head_conv(self.nm, 1, self.dtype, f"cv4_{i}_2")(mc))
        decoded, feats = Detect(self.nc, self.ch, self.reg_max, self.strides,
                                dtype=self.dtype, name="detect")(xs, train)
        b = xs[0].shape[0]
        mc_flat = jnp.concatenate([m.reshape(b, -1, self.nm) for m in mcs], axis=1)
        if decoded is None:
            return None, (feats, mc_flat, proto)
        out = jnp.concatenate([decoded, jnp.transpose(mc_flat, (0, 2, 1))], axis=1)
        return out, (feats, mc_flat, proto)


class Pose(nn.Module):
    """Detect + keypoint branch (reference head.py:215-253)."""
    nc: int = 80
    kpt_shape: Tuple[int, int] = (17, 3)
    ch: Tuple[int, ...] = ()
    reg_max: int = 4
    strides: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @property
    def no(self):
        return self.nc + self.reg_max * 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpts = []
        for i, x in enumerate(xs):
            k = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            k = Conv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(k, train)
            kpts.append(_head_conv(nk, 1, self.dtype, f"cv4_{i}_2")(k))
        decoded, feats = Detect(self.nc, self.ch, self.reg_max, self.strides,
                                dtype=self.dtype, name="detect")(xs, train)
        b = xs[0].shape[0]
        kpt_flat = jnp.concatenate([k.reshape(b, -1, nk) for k in kpts], axis=1)
        if decoded is None:
            return None, (feats, kpt_flat)
        shapes = [f.shape[1:3] for f in feats]
        anchors, stride_t = make_anchors(shapes, self.strides, 0.5)
        k = kpt_flat.reshape(b, -1, *self.kpt_shape)
        xy = (k[..., :2] * 2.0 + (anchors[None, :, None, :] - 0.5)) * stride_t[None, :, None, :1]
        rest = jax.nn.sigmoid(k[..., 2:]) if self.kpt_shape[1] == 3 else k[..., 2:]
        pk = jnp.concatenate([xy, rest], axis=-1).reshape(b, -1, nk)
        out = jnp.concatenate([decoded, jnp.transpose(pk, (0, 2, 1))], axis=1)
        return out, (feats, kpt_flat)


class Classify(nn.Module):
    """conv -> global pool -> dropout -> linear (reference head.py:256-272)."""
    c2: int
    k: int = 1
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, (list, tuple)):
            x = jnp.concatenate(x, axis=-1)
        c_ = 1280
        y = Conv(c_, self.k, self.s, dtype=self.dtype, name="conv")(x, train)
        y = jnp.mean(y, axis=(1, 2))
        y = nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear")(y)
        return y if train else jax.nn.softmax(y.astype(jnp.float32), axis=-1)
