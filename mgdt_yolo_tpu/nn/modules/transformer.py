"""Transformer primitives: AIFI encoder, multi-scale deformable attention,
deformable DETR decoder, RT-DETR head.

TPU-native re-design of reference nn/modules/transformer.py:20-380 and
head.py:275-464. The CUDA/grid_sample sampling core of MSDeformAttn becomes a
static-shape bilinear gather per level (4 taps x n_points x n_levels), and
attention runs as plain batched einsums on the MXU. Dropout is compiled out
(the reference trains RT-DETR with dropout=0.0 as well).
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .conv import BN, Conv, torch_conv_init


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0, 1)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


class MultiHeadAttention(nn.Module):
    """Standard MHA (torch nn.MultiheadAttention equivalent, batch-first)."""
    embed_dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, attn_mask: Optional[jnp.ndarray] = None):
        d = self.embed_dim
        h = self.num_heads
        hd = d // h
        proj = lambda name: nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                                     name=name)
        b, lq, _ = q.shape
        lk = k.shape[1]
        qh = proj("q_proj")(q).reshape(b, lq, h, hd)
        kh = proj("k_proj")(k).reshape(b, lk, h, hd)
        vh = proj("v_proj")(v).reshape(b, lk, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        if attn_mask is not None:
            # True = masked (torch convention for bool masks)
            logits = jnp.where(attn_mask, -jnp.inf, logits)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(vh.dtype), vh,
                         preferred_element_type=jnp.float32)
        return proj("out_proj")(out.reshape(b, lq, d).astype(q.dtype))


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (reference transformer.py:20-68)."""
    c1: int
    cm: int = 2048
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos: Optional[jnp.ndarray] = None):
        q = k = src if pos is None else src + pos
        attn = MultiHeadAttention(self.c1, self.num_heads, dtype=self.dtype,
                                  name="ma")(q, k, src)
        src = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                           name="norm1")(src + attn)
        y = nn.Dense(self.cm, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(src)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.c1, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="norm2")(src + y)


class AIFI(nn.Module):
    """Single-scale encoder with 2D sincos position embedding
    (reference transformer.py:70-97). NHWC in/out."""
    c1: int
    cm: int = 2048
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        pos = self._sincos_embed(w, h, c).astype(x.dtype)
        flat = x.reshape(b, h * w, c)
        out = TransformerEncoderLayer(self.c1, self.cm, self.num_heads,
                                      dtype=self.dtype, name="enc")(flat, pos)
        return out.reshape(b, h, w, c)

    @staticmethod
    def _sincos_embed(w: int, h: int, dim: int, temperature: float = 10000.0):
        grid_w, grid_h = np.meshgrid(np.arange(w, dtype=np.float32),
                                     np.arange(h, dtype=np.float32),
                                     indexing="ij")
        pos_dim = dim // 4
        omega = 1.0 / (temperature ** (np.arange(pos_dim, dtype=np.float32) / pos_dim))
        out_w = grid_w.flatten()[:, None] @ omega[None]
        out_h = grid_h.flatten()[:, None] @ omega[None]
        emb = np.concatenate([np.sin(out_w), np.cos(out_w),
                              np.sin(out_h), np.cos(out_h)], axis=1)
        # PRESERVED QUIRK: the reference builds these rows W-major
        # (meshgrid indexing='ij' over (w, h)) yet adds them to tokens
        # flattened H-major by x.flatten(2) — i.e. the embedding arrives
        # transposed (transformer.py:75-97). Our NHWC reshape flattens
        # H-major exactly like torch's flatten(2), so bit-parity (and torch
        # rtdetr-l/x checkpoint behavior) requires applying the rows
        # UNREORDERED, reproducing the reference's mismatch.
        return jnp.asarray(emb)[None]


class TransformerLayer(nn.Module):
    """Norm-free ViT layer (reference transformer.py:100-117)."""
    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dn = lambda name: nn.Dense(self.c, use_bias=False, dtype=self.dtype,
                                   param_dtype=jnp.float32, name=name)
        q, k, v = dn("q")(x), dn("k")(x), dn("v")(x)
        x = MultiHeadAttention(self.c, self.num_heads, dtype=self.dtype,
                               name="ma")(q, k, v) + x
        return dn("fc2")(dn("fc1")(x)) + x


class TransformerBlock(nn.Module):
    """Conv-projected ViT block with learned position embedding
    (reference transformer.py:120-139)."""
    c2: int
    num_heads: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = Conv(self.c2, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         name="linear")(p)
        for i in range(self.num_layers):
            p = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype,
                                 name=f"tr_{i}")(p)
        return p.reshape(b, h, w, self.c2)


class MLP(nn.Module):
    """ReLU MLP head (reference transformer.py:153-166)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def _bilinear_sample_level(value_hw: jnp.ndarray, loc: jnp.ndarray) -> jnp.ndarray:
    """Sample (B, H, W, C) at normalized locations (B, Q, P, 2) in [0,1]
    with torch grid_sample(align_corners=False, padding_mode='zeros')
    semantics. Returns (B, Q, P, C)."""
    B, H, W, C = value_hw.shape
    # grid_sample: x = loc*2-1 maps to pixel x_pix = ((x+1)*W - 1)/2
    px = loc[..., 0] * W - 0.5
    py = loc[..., 1] * H - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wy1 = py - y0
    flat = value_hw.reshape(B, H * W, C)

    def corner(yi, xi, wgt):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
        b_, q_, p_ = idx.shape
        g = jnp.take_along_axis(flat, idx.reshape(B, -1, 1), axis=1)
        g = g.reshape(b_, q_, p_, C)
        return g * (wgt * inb)[..., None]

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    return (corner(y0i, x0i, (1 - wy1) * (1 - wx1)) +
            corner(y0i, x0i + 1, (1 - wy1) * wx1) +
            corner(y0i + 1, x0i, wy1 * (1 - wx1)) +
            corner(y0i + 1, x0i + 1, wy1 * wx1))


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (reference transformer.py:187-271)
    with the grid_sample core replaced by static gathers per level."""
    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, refer_bbox, value, value_shapes: Sequence[Tuple[int, int]],
                 value_mask=None):
        b, lq = query.shape[:2]
        lv = value.shape[1]
        d, h, L, P = self.d_model, self.n_heads, self.n_levels, self.n_points
        hd = d // h
        value = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                         name="value_proj")(value)
        if value_mask is not None:
            value = jnp.where(value_mask[..., None], value, 0.0)

        off = nn.Dense(h * L * P * 2, dtype=self.dtype, param_dtype=jnp.float32,
                       bias_init=_deform_bias_init(h, L, P),
                       kernel_init=nn.initializers.zeros,
                       name="sampling_offsets")(query)
        off = off.reshape(b, lq, h, L, P, 2)
        attw = nn.Dense(h * L * P, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attw = jax.nn.softmax(attw.reshape(b, lq, h, L * P).astype(jnp.float32),
                              axis=-1).reshape(b, lq, h, L, P).astype(query.dtype)

        np_ref = refer_bbox.shape[-1]
        if np_ref == 2:
            norm = jnp.asarray([[wh[1], wh[0]] for wh in value_shapes],
                               dtype=query.dtype)  # (L, 2) as (w, h)
            loc = refer_bbox[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
        else:  # 4: xywh reference boxes
            loc = (refer_bbox[:, :, None, :, None, :2] +
                   off / P * refer_bbox[:, :, None, :, None, 2:] * 0.5)

        # per-level sampling; heads folded into channels
        value_heads = value.reshape(b, lv, h, hd)
        outputs = []
        start = 0
        for li, (H, W) in enumerate(value_shapes):
            n = H * W
            v_l = value_heads[:, start:start + n].reshape(b, H, W, h * hd)
            # (b, lq, h, P, 2) for this level -> fold heads into batch? keep
            # channels: sample all heads' channels at each head's own loc.
            # Heads have distinct sampling locations; sample per head.
            locs_l = loc[:, :, :, li]  # (b, lq, h, P, 2)
            v_l = value_heads[:, start:start + n].reshape(b, H, W, h, hd)
            samples = []
            for hi in range(h):
                s = _bilinear_sample_level(v_l[..., hi, :], locs_l[:, :, hi])
                samples.append(s)  # (b, lq, P, hd)
            outputs.append(jnp.stack(samples, axis=2))  # (b, lq, h, P, hd)
            start += n
        stacked = jnp.stack(outputs, axis=3)  # (b, lq, h, L, P, hd)
        out = (stacked * attw[..., None]).sum(axis=(3, 4))  # (b, lq, h, hd)
        out = out.reshape(b, lq, d)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        name="output_proj")(out)


def _deform_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Reference sampling-offset bias init: ring of unit directions scaled by
    point index (transformer.py:222-231)."""
    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(n_heads, dtype=np.float32) * (2 * np.pi / n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for i in range(n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)
    return init


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (transformer.py:273-327)."""
    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 4
    n_points: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, attn_mask=None,
                 query_pos=None):
        q = k = embed if query_pos is None else embed + query_pos
        tgt = MultiHeadAttention(self.d_model, self.n_heads, dtype=self.dtype,
                                 name="self_attn")(q, k, embed, attn_mask)
        embed = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm1")(embed + tgt)
        tgt = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                           self.n_points, dtype=self.dtype, name="cross_attn")(
            embed if query_pos is None else embed + query_pos,
            refer_bbox[:, :, None, :], feats, shapes)
        embed = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm2")(embed + tgt)
        y = nn.Dense(self.d_ffn, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear1")(embed)
        y = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear2")(nn.relu(y))
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="norm3")(embed + y)


class RTDETRDecoder(nn.Module):
    """RT-DETR decoder head (reference head.py:275-464).

    Inference path: project multi-scale features, select top-nq encoder
    queries, run ndl deformable decoder layers with iterative box refinement.
    Training additionally returns per-layer predictions and accepts a
    contrastive-denoising group (vit/utils/ops.py get_cdn_group) prepared by
    the loss wrapper.
    """
    nc: int = 80
    ch: Tuple[int, ...] = (512, 1024, 2048)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    eval_idx: int = -1
    num_denoising: int = 100
    label_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0
    strides: Optional[Tuple[int, ...]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False,
                 dn=None, dn_embed=None, dn_bbox=None, attn_mask=None):
        nl = len(self.ch)
        b = xs[0].shape[0]
        # input projection: 1x1 conv + BN per level
        feats_list, shapes = [], []
        for i, x in enumerate(xs):
            y = nn.Conv(self.hd, (1, 1), use_bias=False,
                        kernel_init=nn.initializers.xavier_uniform(),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"input_proj_{i}")(x)
            y = BN(dtype=self.dtype, name=f"input_proj_bn_{i}")(y, train)
            h, w = y.shape[1:3]
            shapes.append((h, w))
            feats_list.append(y.reshape(b, h * w, self.hd))
        feats = jnp.concatenate(feats_list, axis=1)

        # encoder head + query selection
        anchors, valid_mask = self._generate_anchors(shapes, feats.dtype)
        features = nn.Dense(self.hd, dtype=self.dtype, param_dtype=jnp.float32,
                            name="enc_output_dense")(
            jnp.where(valid_mask, feats, 0.0))
        features = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                                name="enc_output_norm")(features)
        enc_scores_all = nn.Dense(self.nc, dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  bias_init=nn.initializers.constant(
                                      _cls_bias(self.nc)),
                                  name="enc_score_head")(features)
        enc_bbox_delta = MLP(self.hd, 4, 3, dtype=self.dtype,
                             name="enc_bbox_head")(features)
        enc_bboxes_all = enc_bbox_delta + anchors

        # contrastive denoising group (reference get_cdn_group, built in-graph
        # from the padded gt batch when training with dn targets)
        class_embed = self.param("denoising_class_embed",
                                 nn.initializers.normal(1.0),
                                 (self.nc, self.hd))
        dn_meta = None
        if train and dn is not None:
            from ...vit.utils.ops import get_cdn_group
            dn_embed, dn_bbox, attn_mask, dn_meta = get_cdn_group(
                dn["gt_labels"], dn["gt_bboxes_norm"], dn["mask_gt"],
                self.nc, min(self.nq, feats.shape[1]),
                class_embed.astype(self.dtype), self.num_denoising,
                self.label_noise_ratio, self.box_noise_scale,
                key=dn.get("key"))

        nq = min(self.nq, feats.shape[1])  # fewer anchors than queries at tiny sizes
        topk_val, topk_ind = jax.lax.top_k(
            enc_scores_all.max(-1).astype(jnp.float32), nq)
        refer_bbox = jnp.take_along_axis(enc_bboxes_all, topk_ind[..., None], axis=1)
        enc_bboxes = jax.nn.sigmoid(refer_bbox)
        enc_scores = jnp.take_along_axis(enc_scores_all, topk_ind[..., None], axis=1)
        embed = jnp.take_along_axis(features, topk_ind[..., None], axis=1)
        if train:
            embed = jax.lax.stop_gradient(embed)
            refer_bbox = jax.lax.stop_gradient(refer_bbox)
        if dn_bbox is not None:
            refer_bbox = jnp.concatenate([dn_bbox, refer_bbox], axis=1)
        if dn_embed is not None:
            embed = jnp.concatenate([dn_embed, embed], axis=1)

        # decoder with iterative refinement
        query_pos_head = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype,
                             name="query_pos_head")
        dec_layers = [DeformableTransformerDecoderLayer(
            self.hd, self.nh, self.d_ffn, nl, self.ndp, dtype=self.dtype,
            name=f"decoder_layer_{i}") for i in range(self.ndl)]
        score_heads = [nn.Dense(self.nc, dtype=self.dtype, param_dtype=jnp.float32,
                                bias_init=nn.initializers.constant(_cls_bias(self.nc)),
                                name=f"dec_score_head_{i}") for i in range(self.ndl)]
        bbox_heads = [MLP(self.hd, 4, 3, dtype=self.dtype,
                          name=f"dec_bbox_head_{i}") for i in range(self.ndl)]

        eval_idx = self.eval_idx if self.eval_idx >= 0 else self.ndl + self.eval_idx
        output = embed
        ref = jax.nn.sigmoid(refer_bbox)
        dec_bboxes, dec_cls = [], []
        last_refined = None
        for i in range(self.ndl):
            output = dec_layers[i](output, ref, feats, shapes, attn_mask,
                                   query_pos_head(ref))
            refined = jax.nn.sigmoid(bbox_heads[i](output) + inverse_sigmoid(ref))
            if train:
                dec_cls.append(score_heads[i](output))
                if i == 0:
                    dec_bboxes.append(refined)
                else:
                    dec_bboxes.append(jax.nn.sigmoid(
                        bbox_heads[i](output) + inverse_sigmoid(last_refined)))
            elif i == eval_idx:
                dec_cls.append(score_heads[i](output))
                dec_bboxes.append(refined)
                break
            last_refined = refined
            ref = jax.lax.stop_gradient(refined) if train else refined

        dec_bboxes = jnp.stack(dec_bboxes)
        dec_cls = jnp.stack(dec_cls)
        if not train:
            dec_cls = jax.nn.sigmoid(dec_cls)
        return (dec_bboxes, dec_cls, enc_bboxes, enc_scores, dn_meta), None

    def _generate_anchors(self, shapes, dtype, grid_size: float = 0.05,
                          eps: float = 1e-2):
        anchors = []
        for i, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32), indexing="ij")
            gxy = jnp.stack([gx, gy], -1)
            # reference divides by [h, w] (head.py:377) — quirk preserved
            gxy = (gxy + 0.5) / jnp.asarray([h, w], jnp.float32)
            wh = jnp.full_like(gxy, grid_size * (2.0 ** i))
            anchors.append(jnp.concatenate([gxy, wh], -1).reshape(1, h * w, 4))
        anchors = jnp.concatenate(anchors, axis=1)
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors = jnp.log(anchors / (1 - anchors))
        anchors = jnp.where(valid, anchors, jnp.inf)
        return anchors.astype(dtype), valid


def _cls_bias(nc: int, prior: float = 0.01) -> float:
    """bias_init_with_prob scaled as in reference head.py:440."""
    return float(-math.log((1 - prior) / prior) / 80 * nc)
