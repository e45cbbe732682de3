"""In-graph training augmentation: mosaic + scale/translate warp + flips +
HSV, fused into the jitted train step.

The reference runs mosaic/affine/HSV on host CPU workers
(yolo/data/augment.py) — on a TPU that pipeline is host-bound. This module
is the TPU-native redesign (SURVEY §7 step 10): the mosaic canvas is
composed with dynamic_update_slice pastes, and the affine warp exploits the
fork's default hyp (degrees = shear = perspective = 0, augment.py defaults)
to become an AXIS-ALIGNED scale+translate — which factors into two
per-image bilinear interpolation-matrix matmuls that run on the MXU instead
of an irregular gather. Flips + HSV + /255 normalization reuse the fused
kernel in ops/pallas_image.py. Labels ride along in-graph with the same
transforms; survivors are re-masked with the reference's box_candidates
rule (augment.py:469-476).

Everything is keyed by a single jax.random key folded with the step
counter, so augmentation is deterministic given (seed, step) and needs no
host-side RNG at all.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

FILL = 114.0


def _paste(canvas, tile, oy, ox):
    """dynamic_update_slice paste of a full (s, s, 3) tile."""
    return jax.lax.dynamic_update_slice(canvas, tile, (oy, ox, 0))


def _mosaic_one(imgs, hws, boxes, labels, mask, picks, center, s):
    """Compose one 3s x 3s mosaic canvas (origin-shifted by s/2 so all tile
    offsets are in-bounds) + merged padded labels.

    imgs: (B, s, s, 3) uint8 top-left-anchored content with 114 pad;
    picks: (4,) int32 batch indices (picks[0] = the image itself);
    center: (2,) float mosaic center in [s/2, 3s/2).
    Returns canvas (3s, 3s, 3) uint8, boxes (4G, 4) in canvas coords,
    labels (4G,), mask (4G,).
    """
    off = s // 2  # canvas origin shift
    xc = center[0].astype(jnp.int32)
    yc = center[1].astype(jnp.int32)
    canvas = jnp.full((3 * s, 3 * s, 3), jnp.uint8(FILL), jnp.uint8)
    out_boxes, out_labels, out_mask = [], [], []
    for k in range(4):
        i = picks[k]
        tile = imgs[i]
        h = hws[i, 0].astype(jnp.int32)
        w = hws[i, 1].astype(jnp.int32)
        if k == 0:      # top-left: image's (h, w) corner sits at (yc, xc)
            oy, ox = yc - h, xc - w
        elif k == 1:    # top-right: bottom-left corner at (yc, xc)
            oy, ox = yc - h, xc
        elif k == 2:    # bottom-left: top-right corner at (yc, xc)
            oy, ox = yc, xc - w
        else:           # bottom-right: top-left corner at (yc, xc)
            oy, ox = yc, xc
        # pad regions of earlier tiles only bleed into LATER tiles' regions
        # (paste order 0..3) or into 114-filled canvas, so whole-tile pastes
        # reproduce the reference's cropped placement exactly
        canvas = _paste(canvas, tile, oy + off, ox + off)
        shift = jnp.stack([ox, oy, ox, oy]).astype(jnp.float32)
        out_boxes.append(boxes[i] + shift[None])
        out_labels.append(labels[i])
        out_mask.append(mask[i])
    return (canvas, jnp.concatenate(out_boxes), jnp.concatenate(out_labels),
            jnp.concatenate(out_mask))


def _interp_matrix(src_coord, n_src):
    """(n_out,) fractional source coords -> (n_out, n_src) bilinear weights."""
    k = jnp.arange(n_src, dtype=jnp.float32)
    return jnp.clip(1.0 - jnp.abs(k[None, :] - src_coord[:, None]), 0.0, None)


@partial(jax.jit, static_argnames=("imgsz", "max_out"))
def device_augment(batch: Dict[str, jnp.ndarray], key: jnp.ndarray,
                   imgsz: int, mosaic_p: float = 1.0, scale: float = 0.5,
                   translate: float = 0.1, fliplr: float = 0.5,
                   flipud: float = 0.0, hsv_h: float = 0.015,
                   hsv_s: float = 0.7, hsv_v: float = 0.4,
                   max_out: int = 0) -> Dict[str, jnp.ndarray]:
    """Full in-graph train-time augmentation.

    batch: img (B, s, s, 3) uint8 (content top-left anchored, 114 pad),
    img_hw (B, 2) float, gt_bboxes (B, G, 4) xyxy px, gt_labels (B, G),
    mask_gt (B, G).
    Returns img (B, s, s, 3) float32 normalized + transformed padded labels
    of width max_out (default 4G).
    """
    from .pallas_image import fused_augment

    imgs = batch["img"]
    B, s = imgs.shape[0], imgsz
    G = batch["gt_bboxes"].shape[1]
    max_out = max_out or 4 * G
    hws = batch["img_hw"].astype(jnp.float32)
    k_pick, k_center, k_mosaic, k_scale, k_tx, k_ty, k_flip, k_hsv = \
        jax.random.split(key, 8)

    # ---- mosaic (vectorized over the batch via vmap) ----
    picks = jnp.concatenate(
        [jnp.arange(B, dtype=jnp.int32)[:, None],
         jax.random.randint(k_pick, (B, 3), 0, B, jnp.int32)], axis=1)
    centers = jax.random.uniform(k_center, (B, 2), jnp.float32,
                                 s / 2, 2 * s - s / 2)
    canvas, m_boxes, m_labels, m_mask = jax.vmap(
        lambda p, c: _mosaic_one(imgs, hws, batch["gt_bboxes"].astype(jnp.float32),
                                 batch["gt_labels"], batch["mask_gt"], p, c, s)
    )(picks, centers)

    use_mosaic = jax.random.uniform(k_mosaic, (B,)) < mosaic_p
    # non-mosaic branch: the single image centered on the canvas
    solo_off = jnp.stack([(3 * s - hws[:, 1]) / 2,
                          (3 * s - hws[:, 0]) / 2], axis=1)  # (B, 2) x, y
    solo = jax.vmap(lambda i, o: _paste(
        jnp.full((3 * s, 3 * s, 3), jnp.uint8(FILL), jnp.uint8), imgs[i],
        o[1].astype(jnp.int32), o[0].astype(jnp.int32)))(
        jnp.arange(B), solo_off)
    solo_boxes = jnp.concatenate(
        [batch["gt_bboxes"].astype(jnp.float32) +
         jnp.concatenate([solo_off, solo_off], 1)[:, None] -
         jnp.float32(s // 2),  # canvas-coord convention of the mosaic branch
         jnp.zeros((B, 3 * G, 4), jnp.float32)], axis=1)
    solo_labels = jnp.concatenate(
        [batch["gt_labels"], jnp.zeros((B, 3 * G), batch["gt_labels"].dtype)], 1)
    solo_mask = jnp.concatenate(
        [batch["mask_gt"], jnp.zeros((B, 3 * G), bool)], axis=1)
    canvas = jnp.where(use_mosaic[:, None, None, None], canvas, solo)
    m_boxes = jnp.where(use_mosaic[:, None, None], m_boxes, solo_boxes)
    m_labels = jnp.where(use_mosaic[:, None], m_labels, solo_labels)
    m_mask = jnp.where(use_mosaic[:, None], m_mask, solo_mask)

    # reference-canvas crop: the reference composes on a 2s canvas, so
    # content outside [0, 2s) (here [off, off+2s) after the origin shift)
    # does not exist — warpAffine samples 114 there and _cat_labels clips
    # mosaic boxes to [0, 2s]. Tiles pasted whole on the 3s canvas can
    # leave real pixels (and box extents) in that band; mask them to FILL
    # and clip the boxes so the warp and the w_before keep-filter term
    # match the reference exactly.
    pos = jnp.arange(3 * s)
    in_ref = (pos >= s // 2) & (pos < s // 2 + 2 * s)  # canvas origin = s//2
    canvas = jnp.where((in_ref[:, None] & in_ref[None, :])[None, :, :, None],
                       canvas, jnp.uint8(FILL))
    m_boxes = m_boxes.clip(0.0, 2.0 * s)  # reference-coord clip pre-warp

    # ---- separable scale+translate warp (MXU matmuls) ----
    # reference mapping (augment.py:289-476 with degrees=shear=persp=0,
    # border=-s/2): dst = sf * (src - s) + t, t ~ U(0.5-tr, 0.5+tr) * s
    # => src(dst) = (dst - t)/sf + s; our canvas origin adds +s/2.
    sf = jax.random.uniform(k_scale, (B,), jnp.float32, 1 - scale, 1 + scale)
    tx = jax.random.uniform(k_tx, (B,), jnp.float32,
                            (0.5 - translate) * s, (0.5 + translate) * s)
    ty = jax.random.uniform(k_ty, (B,), jnp.float32,
                            (0.5 - translate) * s, (0.5 + translate) * s)
    dst = jnp.arange(s, dtype=jnp.float32)
    src_x = (dst[None] - tx[:, None]) / sf[:, None] + s + s // 2  # (B, s)
    src_y = (dst[None] - ty[:, None]) / sf[:, None] + s + s // 2
    Wx = jax.vmap(lambda c: _interp_matrix(c, 3 * s))(src_x)  # (B, s, 3s)
    Wy = jax.vmap(lambda c: _interp_matrix(c, 3 * s))(src_y)
    cf = canvas.astype(jnp.bfloat16)
    t1 = jnp.einsum("bik,bkwc->biwc", Wy.astype(jnp.bfloat16), cf)  # rows
    warped = jnp.einsum("bjw,biwc->bijc", Wx.astype(jnp.bfloat16), t1)
    # out-of-range rows/cols have all-zero weights -> 0; reference pads 114
    cov = jnp.einsum("bik->bi", Wy)[:, :, None, None] * \
        jnp.einsum("bjw->bj", Wx)[:, None, :, None]
    warped = warped.astype(jnp.float32) + (1.0 - jnp.clip(cov, 0, 1)) * FILL
    img_u8 = jnp.clip(jnp.round(warped), 0, 255).astype(jnp.uint8)

    # boxes through the same map: dst = sf*(src - 3s/2... in canvas coords
    # src_canvas = src + s//2, so dst = sf*(src_canvas - s//2 - s) + t
    def warp_boxes(bx, sf_, tx_, ty_):
        shift = jnp.float32(s + s // 2)
        x1 = sf_ * (bx[:, 0] - shift + s // 2) + tx_
        y1 = sf_ * (bx[:, 1] - shift + s // 2) + ty_
        x2 = sf_ * (bx[:, 2] - shift + s // 2) + tx_
        y2 = sf_ * (bx[:, 3] - shift + s // 2) + ty_
        return jnp.stack([x1, y1, x2, y2], 1)

    # m_boxes are in pre-shift canvas coords (tile offsets without +s//2),
    # i.e. src coordinates of the reference's 2s canvas
    wb = jax.vmap(lambda bx, a, b, c: warp_boxes(bx, a, b, c))(
        m_boxes, sf, tx, ty)
    w_before = (m_boxes[..., 2] - m_boxes[..., 0])
    h_before = (m_boxes[..., 3] - m_boxes[..., 1])
    wb = jnp.stack([wb[..., 0].clip(0, s), wb[..., 1].clip(0, s),
                    wb[..., 2].clip(0, s), wb[..., 3].clip(0, s)], -1)
    w_after = wb[..., 2] - wb[..., 0]
    h_after = wb[..., 3] - wb[..., 1]
    # box_candidates (reference augment.py:469-476)
    ar = jnp.maximum(w_after / (h_after + 1e-16), h_after / (w_after + 1e-16))
    keep = (w_after > 2) & (h_after > 2) & (ar < 100) & \
        (w_after * h_after / (w_before * sf[:, None] * h_before * sf[:, None]
                              + 1e-16) > 0.1)
    m_mask = m_mask & keep

    # ---- flips + HSV + normalize (fused kernel) ----
    do_lr = jax.random.uniform(k_flip, (B,)) < fliplr
    do_ud = (jax.random.uniform(jax.random.fold_in(k_flip, 1), (B,)) < flipud)
    flips = jnp.stack([do_lr, do_ud], 1).astype(jnp.int32)
    gains = 1.0 + jax.random.uniform(k_hsv, (B, 3), jnp.float32, -1.0, 1.0) * \
        jnp.asarray([hsv_h, hsv_s, hsv_v], jnp.float32)
    img = fused_augment(img_u8, gains, flips)
    x1m = jnp.where(do_lr[:, None], s - wb[..., 2], wb[..., 0])
    x2m = jnp.where(do_lr[:, None], s - wb[..., 0], wb[..., 2])
    y1m = jnp.where(do_ud[:, None], s - wb[..., 3], wb[..., 1])
    y2m = jnp.where(do_ud[:, None], s - wb[..., 1], wb[..., 3])
    wb = jnp.stack([x1m, y1m, x2m, y2m], -1)

    # compact to max_out slots by validity (top_k over the mask keeps the
    # program static; surviving boxes keep their relative order)
    order = m_mask.astype(jnp.float32) - \
        jnp.arange(m_mask.shape[1], dtype=jnp.float32)[None] * 1e-6
    _, idx = jax.lax.top_k(order, max_out)
    out_boxes = jnp.take_along_axis(wb, idx[..., None], axis=1)
    out_labels = jnp.take_along_axis(m_labels, idx, axis=1)
    out_mask = jnp.take_along_axis(m_mask, idx, axis=1)
    out_boxes = jnp.where(out_mask[..., None], out_boxes, 0.0)
    out_labels = jnp.where(out_mask, out_labels, 0)

    return {"img": img, "gt_bboxes": out_boxes, "gt_labels": out_labels,
            "mask_gt": out_mask}
