"""SAM core modules: windowed ViT encoder, prompt encoder, mask decoder.

TPU-native re-design of reference vit/sam/modules/{encoders,decoders,
transformer}.py: NHWC throughout, attention as batched einsums, windowing as
static reshapes (no dynamic padding at standard 1024px where H=W=64 divides
the 14px window after pad), decomposed relative position bias added per axis.
Inference path (the only path the reference supports — SAM is not trained by
the fork either).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class LayerNorm2d(nn.Module):
    """Channel LayerNorm over NHWC (reference transformer.py:171-184)."""
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        u = xf.mean(-1, keepdims=True)
        s = ((xf - u) ** 2).mean(-1, keepdims=True)
        return ((xf - u) / jnp.sqrt(s + self.eps) * w + b).astype(x.dtype)


def window_partition(x: jnp.ndarray, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C) with zero pad (encoders.py:435)."""
    B, H, W, C = x.shape
    ph = (ws - H % ws) % ws
    pw = (ws - W % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def window_unpartition(x: jnp.ndarray, ws: int, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // (Hp * Wp // ws // ws)
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Slice/interp the relative position table for (q, k) sizes."""
    max_rel = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel:
        # linear resize of the table
        t = jnp.linspace(0, rel_pos.shape[0] - 1, max_rel)
        lo = jnp.floor(t).astype(jnp.int32)
        hi = jnp.clip(lo + 1, 0, rel_pos.shape[0] - 1)
        w = (t - lo)[:, None]
        rel_pos = rel_pos[lo] * (1 - w) + rel_pos[hi] * w
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class Attention(nn.Module):
    """MHA with optional decomposed relative position bias
    (reference encoders.py:314-433)."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: Optional[Tuple[int, int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, h, HW, hd)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, hd))
            Rh = _get_rel_pos(H, H, rel_h)  # (H, H, hd)
            Rw = _get_rel_pos(W, W, rel_w)
            r_q = q.reshape(B, self.num_heads, H, W, hd)
            rh = jnp.einsum("bnhwc,hkc->bnhwk", r_q, Rh)
            rw = jnp.einsum("bnhwc,wkc->bnhwk", r_q, Rw)
            attn = attn.reshape(B, self.num_heads, H, W, H, W)
            attn = attn + rh[..., :, None] + rw[..., None, :]
            attn = attn.reshape(B, self.num_heads, H * W, H * W)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class ViTBlock(nn.Module):
    """Transformer block with optional window attention (encoders.py:240-312)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    input_size: Optional[Tuple[int, int]] = None
    use_rel_pos: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        if self.window_size > 0:
            H, W = y.shape[1:3]
            y, pad_hw = window_partition(y, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        y = Attention(self.dim, self.num_heads, use_rel_pos=self.use_rel_pos,
                      input_size=attn_size, dtype=self.dtype, name="attn")(y)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, pad_hw, x.shape[1:3])
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        h = int(self.dim * self.mlp_ratio)
        y = nn.Dense(h, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_lin2")(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """SAM image encoder (reference encoders.py:14-113)."""
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        gh = self.img_size // p
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, gh, gh, self.embed_dim))
        x = x + pos[:, :x.shape[1], :x.shape[2]]
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = ViTBlock(self.embed_dim, self.num_heads, window_size=ws,
                         input_size=(x.shape[1], x.shape[2]), dtype=self.dtype,
                         name=f"blocks_{i}")(x)
        y = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="neck_conv1")(x)
        y = LayerNorm2d(self.out_chans, name="neck_ln1")(y)
        y = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="neck_conv2")(y)
        return LayerNorm2d(self.out_chans, name="neck_ln2")(y)


class PromptEncoder(nn.Module):
    """Point/box prompt embeddings (reference encoders.py:115-238)."""
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    dtype: Any = jnp.float32

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", lambda k, s: jax.random.normal(k, s), (2, self.embed_dim // 2))
        self.point_embeddings = [
            self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                       (1, self.embed_dim)) for i in range(4)]
        self.not_a_point_embed = self.param("not_a_point_embed",
                                            nn.initializers.normal(1.0),
                                            (1, self.embed_dim))
        self.no_mask_embed = self.param("no_mask_embed",
                                        nn.initializers.normal(1.0),
                                        (1, self.embed_dim))

    def _pe_encoding(self, coords: jnp.ndarray) -> jnp.ndarray:
        """Random-Fourier positional encoding of [0,1] coords."""
        c = 2 * coords - 1
        c = c @ self.pe_gaussian
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def get_dense_pe(self) -> jnp.ndarray:
        h, w = self.image_embedding_size
        gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
        return self._pe_encoding(jnp.stack([xx, yy], -1))  # (h, w, C)

    def __call__(self, points=None, labels=None, boxes=None):
        """points: (B, N, 2) pixel coords; labels: (B, N) 1=fg 0=bg -1=pad;
        boxes: (B, M, 4) xyxy. Returns (sparse (B, S, C), dense (B, h, w, C))."""
        parts = []
        B = 1
        if points is not None:
            B = points.shape[0]
            if boxes is None:
                # reference pads a (0,0)/label -1 token when no boxes
                # accompany the points (encoders.py _embed_points pad=True)
                points = jnp.concatenate(
                    [points, jnp.zeros((B, 1, 2), points.dtype)], axis=1)
                labels = jnp.concatenate(
                    [labels, -jnp.ones((B, 1), labels.dtype)], axis=1)
            coords = (points + 0.5) / jnp.asarray(
                [self.input_image_size[1], self.input_image_size[0]], jnp.float32)
            pe = self._pe_encoding(coords)
            pe = jnp.where((labels == -1)[..., None],
                           self.not_a_point_embed, pe)
            pe = pe + jnp.where((labels == 1)[..., None], self.point_embeddings[1],
                                jnp.where((labels == 0)[..., None],
                                          self.point_embeddings[0], 0.0))
            parts.append(pe)
        if boxes is not None:
            B = boxes.shape[0]
            corners = boxes.reshape(B, -1, 2, 2)
            c = (corners + 0.5) / jnp.asarray(
                [self.input_image_size[1], self.input_image_size[0]], jnp.float32)
            pe = self._pe_encoding(c)
            pe = pe + jnp.stack([jnp.broadcast_to(self.point_embeddings[2], pe.shape[:-2] + pe.shape[-1:]),
                                 jnp.broadcast_to(self.point_embeddings[3], pe.shape[:-2] + pe.shape[-1:])],
                                axis=-2)
            parts.append(pe.reshape(B, -1, self.embed_dim))
        sparse = jnp.concatenate(parts, axis=1) if parts else \
            jnp.zeros((B, 0, self.embed_dim))
        h, w = self.image_embedding_size
        dense = jnp.broadcast_to(self.no_mask_embed.reshape(1, 1, 1, -1),
                                 (B, h, w, self.embed_dim))
        return sparse, dense


class TwoWayAttention(nn.Module):
    dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample_rate
        h = self.num_heads
        hd = d // h
        dn = lambda n, out: nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                                     name=n)
        B, Lq = q.shape[:2]
        Lk = k.shape[1]
        qh = dn("q_proj", d)(q).reshape(B, Lq, h, hd)
        kh = dn("k_proj", d)(k).reshape(B, Lk, h, hd)
        vh = dn("v_proj", d)(v).reshape(B, Lk, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        w = jax.nn.softmax(logits, -1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vh,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        return dn("out_proj", self.dim)(out.reshape(B, Lq, d))


class TwoWayBlock(nn.Module):
    """One two-way transformer block (reference transformer.py:12-160)."""
    dim: int
    num_heads: int
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                    param_dtype=jnp.float32, name=n)  # torch LN default eps
        if self.skip_first_layer_pe:
            queries = TwoWayAttention(self.dim, self.num_heads, dtype=self.dtype,
                                      name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + TwoWayAttention(self.dim, self.num_heads,
                                                dtype=self.dtype,
                                                name="self_attn")(q, q, queries)
        queries = ln("norm1")(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + TwoWayAttention(self.dim, self.num_heads, 2,
                                            dtype=self.dtype,
                                            name="cross_attn_t2i")(q, k, keys)
        queries = ln("norm2")(queries)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_lin1")(queries)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_lin2")(nn.relu(y))
        queries = ln("norm3")(queries + y)
        q = queries + query_pe
        keys = keys + TwoWayAttention(self.dim, self.num_heads, 2, dtype=self.dtype,
                                      name="cross_attn_i2t")(k, q, queries)
        keys = ln("norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        B, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(B, h * w, c)
        key_pe = image_pe.reshape(1, h * w, c)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayBlock(self.dim, self.num_heads, self.mlp_dim,
                                        skip_first_layer_pe=(i == 0),
                                        dtype=self.dtype, name=f"layers_{i}")(
                queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + TwoWayAttention(self.dim, self.num_heads, 2,
                                            dtype=self.dtype,
                                            name="final_attn")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               param_dtype=jnp.float32,
                               name="norm_final")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    """Mask + IoU prediction decoder (reference decoders.py:12-159)."""
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = True):
        num_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.transformer_dim))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (num_mask_tokens, self.transformer_dim))
        B = sparse_prompt.shape[0]
        tokens = jnp.concatenate([
            jnp.broadcast_to(iou_token[None], (B, 1, self.transformer_dim)),
            jnp.broadcast_to(mask_tokens[None], (B, num_mask_tokens, self.transformer_dim)),
            sparse_prompt], axis=1)
        src = image_embeddings + dense_prompt
        hs, src_out = TwoWayTransformer(dim=self.transformer_dim, dtype=self.dtype,
                                        name="transformer")(src, image_pe, tokens)
        iou_tok = hs[:, 0]
        mask_toks = hs[:, 1:1 + num_mask_tokens]
        h, w = image_embeddings.shape[1:3]
        src_hw = src_out.reshape(B, h, w, self.transformer_dim)
        y = nn.ConvTranspose(self.transformer_dim // 4, (2, 2), strides=(2, 2),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="upscale_conv1")(src_hw)
        y = LayerNorm2d(self.transformer_dim // 4, name="upscale_ln")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.ConvTranspose(self.transformer_dim // 8, (2, 2), strides=(2, 2),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="upscale_conv2")(y)
        y = nn.gelu(y, approximate=False)  # (B, 4h, 4w, C/8)

        hyper = []
        for i in range(num_mask_tokens):
            t = mask_toks[:, i]
            for j in range(2):
                t = nn.Dense(self.transformer_dim // (1 if j == 0 else 1),
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"hyper_{i}_lin{j}")(t)
                t = nn.relu(t)
            t = nn.Dense(self.transformer_dim // 8, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"hyper_{i}_out")(t)
            hyper.append(t)
        hyper = jnp.stack(hyper, axis=1)  # (B, num_mask_tokens, C/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, y,
                           preferred_element_type=jnp.float32)

        iou = iou_tok
        for j in range(self.iou_head_depth - 1):
            iou = nn.relu(nn.Dense(self.iou_head_hidden_dim, dtype=self.dtype,
                                   param_dtype=jnp.float32,
                                   name=f"iou_head_{j}")(iou))
        iou_pred = nn.Dense(num_mask_tokens, dtype=self.dtype,
                            param_dtype=jnp.float32, name="iou_head_out")(iou)
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]
