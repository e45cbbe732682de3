"""In-graph training augmentation: mosaic + scale/translate warp + flips +
HSV, fused into the jitted train step.

The reference runs mosaic/affine/HSV on host CPU workers
(yolo/data/augment.py) — on a TPU that pipeline is host-bound. This module
is the TPU-native redesign (SURVEY §7 step 10).

The r4 formulation composes the mosaic and the affine warp in ONE pass of
per-tile interpolation-matrix matmuls, with no intermediate canvas at all.
Two facts make this exact:

1. The fork's default hyp (degrees = shear = perspective = 0,
   augment.py defaults) makes the warp AXIS-ALIGNED scale+translate, which
   factors into separable row/column bilinear-weight matmuls on the MXU.
2. Mosaic paste-overwrite composition is value-equivalent to a DISJOINT
   quadrant partition: tile k's pasted rect only intersects other tiles'
   quadrants in its 114-pad region, and 114 is also the canvas fill, so
   "last paste wins" never changes a pixel's value outside tile k's own
   content-in-quadrant rect. Therefore
       warped = sum_k  Wy_k @ tile_k @ Wx_k^T  +  114 * (1 - cov)
   where Wy_k/Wx_k are the bilinear weight matrices evaluated against tile
   k's content rows/cols (shift folded in), masked to the quadrant ∩
   reference-2s-crop interval, and cov = sum_k rowcov_k ⊗ colcov_k is the
   total sampled weight mass (everything unsampled is reference pad 114).

The previous revision composed a (3s, 3s) uint8 canvas with vmapped
dynamic_update_slice pastes — XLA lowers batched scatter to a sequential
while loop per paste, and the hbm ledger measured 256.7 MB/img at 640px
with 48% of it in five scatter-whiles. This formulation replaces ~19
GFLOP/img of canvas-warp matmuls with ~12.6 GFLOP/img of tile-warp
matmuls and removes the canvas traffic entirely.

The non-mosaic ("solo") branch is the k=3 term with centered offsets and
the other three terms weight-masked to zero — no second canvas, no
full-image select.

Flips + HSV + /255 normalization reuse the fused kernel in
ops/pallas_image.py. Labels ride along in-graph with the same transforms;
survivors are re-masked with the reference's box_candidates rule
(augment.py:469-476).

Everything is keyed by a single jax.random key folded with the step
counter, so augmentation is deterministic given (seed, step) and needs no
host-side RNG at all.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp

FILL = 114.0


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
    off = s // 2  # raw-canvas origin shift vs reference-2s coordinates

    picks = jnp.concatenate(
        [jnp.arange(B, dtype=jnp.int32)[:, None],
         jax.random.randint(k_pick, (B, 3), 0, B, jnp.int32)], axis=1)
    centers = jax.random.uniform(k_center, (B, 2), jnp.float32,
                                 s / 2, 2 * s - s / 2)
    use_mosaic = jax.random.uniform(k_mosaic, (B,)) < mosaic_p
    # solo (non-mosaic) images warp themselves: every slot is the image
    picks = jnp.where(use_mosaic[:, None], picks,
                      jnp.arange(B, dtype=jnp.int32)[:, None])
    xc = centers[:, 0].astype(jnp.int32)  # reference-2s coords
    yc = centers[:, 1].astype(jnp.int32)

    # per-tile content size + paste offsets (reference-2s coords, like the
    # reference's mosaic: tile k's anchored corner sits at (yc, xc))
    hk = hws[picks]  # (B, 4, 2) = (h, w) per slot
    h = hk[..., 0].astype(jnp.int32)
    w = hk[..., 1].astype(jnp.int32)
    oy = jnp.stack([yc - h[:, 0], yc - h[:, 1], yc, yc], axis=1)  # (B, 4)
    ox = jnp.stack([xc - w[:, 0], xc, xc - w[:, 2], xc], axis=1)

    # ---- mosaic labels (tiny tensors) ----
    shift = jnp.stack([ox, oy, ox, oy], axis=-1).astype(jnp.float32)
    m_boxes = (batch["gt_bboxes"].astype(jnp.float32)[picks] +
               shift[:, :, None, :]).reshape(B, 4 * G, 4)
    m_labels = batch["gt_labels"][picks].reshape(B, 4 * G)
    m_mask = batch["mask_gt"][picks].reshape(B, 4 * G)
    # non-mosaic labels: the image itself centered on the 2s reference
    # canvas (same coordinate convention as the mosaic terms)
    solo_off = jnp.stack([(3 * s - hws[:, 1]) / 2,
                          (3 * s - hws[:, 0]) / 2], axis=1)  # (B, 2) x, y
    solo_boxes = jnp.concatenate(
        [batch["gt_bboxes"].astype(jnp.float32) +
         jnp.concatenate([solo_off, solo_off], 1)[:, None] -
         jnp.float32(off),
         jnp.zeros((B, 3 * G, 4), jnp.float32)], axis=1)
    solo_labels = jnp.concatenate(
        [batch["gt_labels"], jnp.zeros((B, 3 * G), batch["gt_labels"].dtype)], 1)
    solo_mask = jnp.concatenate(
        [batch["mask_gt"], jnp.zeros((B, 3 * G), bool)], axis=1)
    m_boxes = jnp.where(use_mosaic[:, None, None], m_boxes, solo_boxes)
    m_labels = jnp.where(use_mosaic[:, None], m_labels, solo_labels)
    m_mask = jnp.where(use_mosaic[:, None], m_mask, solo_mask)
    m_boxes = m_boxes.clip(0.0, 2.0 * s)  # reference-coord clip pre-warp

    # ---- fused mosaic + scale/translate warp (per-tile MXU matmuls) ----
    # reference mapping (augment.py:289-476 with degrees=shear=persp=0,
    # border=-s/2): dst = sf * (src - s) + t, t ~ U(0.5-tr, 0.5+tr) * s
    # => src(dst) = (dst - t)/sf + s; raw-canvas coords add +s//2.
    sf = jax.random.uniform(k_scale, (B,), jnp.float32, 1 - scale, 1 + scale)
    tx = jax.random.uniform(k_tx, (B,), jnp.float32,
                            (0.5 - translate) * s, (0.5 + translate) * s)
    ty = jax.random.uniform(k_ty, (B,), jnp.float32,
                            (0.5 - translate) * s, (0.5 + translate) * s)
    dst = jnp.arange(s, dtype=jnp.float32)
    src_x = (dst[None] - tx[:, None]) / sf[:, None] + s + off  # (B, s) raw
    src_y = (dst[None] - ty[:, None]) / sf[:, None] + s + off

    # raw-canvas paste offsets + sampled-region bounds per tile: region =
    # content rows/cols ∩ tile k's quadrant ∩ the reference 2s crop
    # [off, off+2s). Quadrant boundaries sit at (yc, xc) raw = +off.
    ycr, xcr = yc + off, xc + off
    ref_hi = off + 2 * s
    O_y = oy + off  # (B, 4)
    O_x = ox + off
    row_lo = jnp.stack([jnp.maximum(O_y[:, 0], off),
                        jnp.maximum(O_y[:, 1], off), ycr, ycr], axis=1)
    row_hi = jnp.stack([ycr, ycr,
                        jnp.minimum(O_y[:, 2] + h[:, 2], ref_hi),
                        jnp.minimum(O_y[:, 3] + h[:, 3], ref_hi)], axis=1)
    col_lo = jnp.stack([jnp.maximum(O_x[:, 0], off), xcr,
                        jnp.maximum(O_x[:, 2], off), xcr], axis=1)
    col_hi = jnp.stack([xcr, jnp.minimum(O_x[:, 1] + w[:, 1], ref_hi),
                        xcr, jnp.minimum(O_x[:, 3] + w[:, 3], ref_hi)], axis=1)
    # solo: only the k=3 term fires, centered, full content, no quadrants
    solo_oy = solo_off[:, 1].astype(jnp.int32)  # raw coords
    solo_ox = solo_off[:, 0].astype(jnp.int32)
    zero = jnp.zeros_like(ycr)

    def pick_solo(mos, solo3, k):
        return jnp.where(use_mosaic, mos[:, k], solo3 if k == 3 else zero)

    hs = hws[:, 0].astype(jnp.int32)
    ws = hws[:, 1].astype(jnp.int32)
    warped = None
    cov = None
    u = jnp.arange(s, dtype=jnp.float32)
    for k in range(4):
        oyk = pick_solo(O_y, solo_oy, k)
        oxk = pick_solo(O_x, solo_ox, k)
        rlo = pick_solo(row_lo, solo_oy, k)
        rhi = pick_solo(row_hi, solo_oy + hs, k)
        clo = pick_solo(col_lo, solo_ox, k)
        chi = pick_solo(col_hi, solo_ox + ws, k)
        # bilinear weights against tile k's rows/cols, region-masked
        pos_y = oyk[:, None].astype(jnp.float32) + u[None]  # (B, s) raw
        pos_x = oxk[:, None].astype(jnp.float32) + u[None]
        my = ((pos_y >= rlo[:, None]) & (pos_y < rhi[:, None]))
        mx = ((pos_x >= clo[:, None]) & (pos_x < chi[:, None]))
        Wy = jnp.clip(1.0 - jnp.abs(src_y[:, :, None] - pos_y[:, None, :]),
                      0.0, None) * my[:, None, :]  # (B, s_out, s_tile)
        Wx = jnp.clip(1.0 - jnp.abs(src_x[:, :, None] - pos_x[:, None, :]),
                      0.0, None) * mx[:, None, :]
        covk = (Wy.sum(-1)[:, :, None] * Wx.sum(-1)[:, None, :])
        cov = covk if cov is None else cov + covk
        tile = imgs[picks[:, k]].astype(jnp.bfloat16)  # (B, s, s, 3)
        t1 = jnp.einsum("biu,buxc->bixc", Wy.astype(jnp.bfloat16), tile)
        term = jnp.einsum("bjx,bixc->bijc", Wx.astype(jnp.bfloat16), t1)
        warped = term if warped is None else warped + term
    warped = warped.astype(jnp.float32) + \
        (1.0 - jnp.clip(cov, 0, 1))[..., None] * FILL
    img_u8 = jnp.clip(jnp.round(warped), 0, 255).astype(jnp.uint8)

    # boxes through the same map: src here are reference-2s coords, and
    # dst = sf * (src - s) + t
    def warp_boxes(bx, sf_, tx_, ty_):
        x1 = sf_ * (bx[:, 0] - s) + tx_
        y1 = sf_ * (bx[:, 1] - s) + ty_
        x2 = sf_ * (bx[:, 2] - s) + tx_
        y2 = sf_ * (bx[:, 3] - s) + ty_
        return jnp.stack([x1, y1, x2, y2], 1)

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
