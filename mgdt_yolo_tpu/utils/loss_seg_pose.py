"""Segmentation and pose training losses, fixed-shape JAX.

Re-implementations of reference yolo/utils/loss.py:212-392:
- SegmentationLoss: detection loss + per-anchor prototype-mask BCE cropped
  to the assigned gt box and area-normalized. The reference's per-image
  Python loop with boolean indexing (loss.py:272-284) becomes fully batched
  mask arithmetic over all anchors.
- PoseLoss: detection loss + OKS-style keypoint location loss
  (KeypointLoss, loss.py:92-104) + keypoint-visibility BCE.

Both reuse DetectionLoss's assigner pass (targets returned by a shared core).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..ops.boxes import xyxy2xywh
from . import LOGGER
from .loss import DetectionLoss, LossOutputs, _bce_logits


class SegmentationLoss(DetectionLoss):
    """v8SegmentationLoss equivalent. Head output: (feats, mask_coefs, proto).

    Extra batch keys: `masks` (b, G, mh, mw) float per-gt binary masks already
    at prototype resolution (non-overlap encoding — padded per-gt planes
    replace the reference's index-encoded overlap masks, which don't batch).
    """

    def __init__(self, nc: int, reg_max: int, strides, nm: int = 32, **kw):
        super().__init__(nc, reg_max, strides, **kw)
        self.nm = nm

    def __call__(self, head_out, batch: Dict, step) -> LossOutputs:
        feats, mask_coefs, proto = head_out
        c = self.detection_core(feats, batch, step)
        b, shapes = c["b"], c["shapes"]
        assign, fg, weight = c["assign"], c["fg"], c["weight"]
        loss_cls, loss_box, loss_dfl = (c["loss_cls"], c["loss_box"],
                                        c["loss_dfl"])

        # ---- mask loss (reference loss.py:272-300) ----
        # A full (b, A, mh, mw) per-anchor mask tensor is memory-prohibitive
        # (8400 anchors x 160^2); instead take the top-K foreground anchors
        # and compute crop-BCE only for those. fg anchors per image are
        # bounded by TAL's topk(10) x n_gt, so K = 10*max_gt is exact;
        # capped at 256 for the (b, K, mh, mw) intermediate — beyond-cap
        # truncation is logged once at trace time, never silent.
        masks = batch["masks"].astype(jnp.float32)  # (b, G, mh, mw)
        K = min(10 * masks.shape[1], 256)
        if 10 * masks.shape[1] > 256:
            LOGGER.warning(
                f"seg mask loss caps at 256 fg anchors/image "
                f"(max_gt={masks.shape[1]}): extreme-density images truncate")
        mh, mw = proto.shape[1:3]
        # +1 sentinel: select by FG membership, not weight — an fg anchor
        # whose target-score weight underflows to exactly 0 still belongs in
        # the reference's per-image mean (loss.py:272-284)
        sel_v, sel_idx = jax.lax.top_k(jnp.where(fg, weight + 1.0, -1.0), K)
        sel_fg = sel_v > 0.0
        coefs = jnp.take_along_axis(mask_coefs, sel_idx[..., None], axis=1)  # (b,K,nm)
        sel_gt = jnp.take_along_axis(assign.target_gt_idx, sel_idx, axis=1)  # (b,K)
        tgt_m = jnp.take_along_axis(masks, sel_gt[:, :, None, None], axis=1)  # (b,K,mh,mw)
        pred_m = jnp.einsum("bkn,bhwn->bkhw", coefs, proto,
                            preferred_element_type=jnp.float32)
        sel_boxes = jnp.take_along_axis(assign.target_bboxes, sel_idx[..., None],
                                        axis=1)  # (b, K, 4) input pixels
        img_w = shapes[0][1] * self.strides[0]
        img_h = shapes[0][0] * self.strides[0]
        norm = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
        xyxyn = sel_boxes / norm
        area = jnp.clip(xyxy2xywh(xyxyn)[..., 2:].prod(-1), 1e-4, None)  # (b, K)
        mxy = xyxyn * jnp.asarray([mw, mh, mw, mh], jnp.float32)  # (b, K, 4)
        yy = jnp.arange(mh, dtype=jnp.float32).reshape(1, 1, mh, 1)
        xx = jnp.arange(mw, dtype=jnp.float32).reshape(1, 1, 1, mw)
        crop = ((xx >= mxy[..., 0].reshape(b, K, 1, 1)) &
                (xx < mxy[..., 2].reshape(b, K, 1, 1)) &
                (yy >= mxy[..., 1].reshape(b, K, 1, 1)) &
                (yy < mxy[..., 3].reshape(b, K, 1, 1)))
        bce = _bce_logits(pred_m, tgt_m) * crop
        per_anchor = bce.mean(axis=(2, 3)) / area  # (b, K)
        # reference sums per-image means (loss[1] += single_mask_loss per image,
        # loss.py:283-284,296): mean over each image's fg anchors, then sum
        # over images; images with no fg contribute 0.
        n_fg = sel_fg.sum(axis=1)  # (b,)
        per_image = (per_anchor * sel_fg).sum(axis=1) / jnp.maximum(n_fg, 1)
        loss_seg = jnp.where(n_fg > 0, per_image, 0.0).sum()

        bg, cg, dg = self.gains
        parts = jnp.stack([loss_box * bg, loss_seg * bg / b, loss_cls * cg,
                           loss_dfl * dg])
        return LossOutputs(parts.sum() * b, jax.lax.stop_gradient(parts))


class PoseLoss(DetectionLoss):
    """v8PoseLoss equivalent. Head output: (feats, kpt_flat).

    Extra batch keys: `keypoints` (b, G, nk, 3) in input pixels with
    visibility in channel 2.
    """

    def __init__(self, nc: int, reg_max: int, strides, kpt_shape=(17, 3),
                 pose_gain: float = 12.0, kobj_gain: float = 1.0, **kw):
        super().__init__(nc, reg_max, strides, **kw)
        self.kpt_shape = tuple(kpt_shape)
        self.pose_gain = pose_gain
        self.kobj_gain = kobj_gain
        # OKS sigmas (reference v8PoseLoss init): COCO 17-kpt table or uniform
        import numpy as np
        if self.kpt_shape == (17, 3):
            s = np.array([.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
                          1.07, 1.07, .87, .87, .89, .89]) / 10.0
        else:
            s = np.ones(self.kpt_shape[0]) / self.kpt_shape[0]
        self.sigmas = jnp.asarray(s, jnp.float32)

    def __call__(self, head_out, batch: Dict, step) -> LossOutputs:
        feats, kpt_flat = head_out
        c = self.detection_core(feats, batch, step)
        b = c["b"]
        anchor_points, stride_tensor = c["anchor_points"], c["stride_tensor"]
        assign, fg, target_bboxes = c["assign"], c["fg"], c["target_bboxes"]
        loss_cls, loss_box, loss_dfl = (c["loss_cls"], c["loss_box"],
                                        c["loss_dfl"])

        # ---- keypoint losses (reference loss.py:307-392) ----
        nk, kdim = self.kpt_shape
        k = kpt_flat.reshape(b, -1, nk, kdim)  # raw head output per anchor
        # decode to grid units (reference kpts_decode: *2 + anchor - 0.5)
        pk_xy = k[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
        gt_k = batch["keypoints"].astype(jnp.float32)  # (b, G, nk, 3)
        sel_k = jnp.take_along_axis(gt_k, assign.target_gt_idx[:, :, None, None],
                                    axis=1)  # (b, A, nk, 3)
        sel_xy = sel_k[..., :2] / stride_tensor[None, :, None, :]  # -> grid units
        vis = (sel_k[..., 2] > 0).astype(jnp.float32)
        area = jnp.clip(xyxy2xywh(target_bboxes)[..., 2:].prod(-1), 1e-4, None)
        d2 = ((pk_xy - sel_xy) ** 2).sum(-1)  # (b, A, nk)
        e = d2 / (2 * self.sigmas[None, None]) ** 2 / (area[..., None] + 1e-9) / 2
        # Reference accumulates KeypointLoss per image (loss.py:374):
        #   factor_i = total_kpt_elems_i / (visible_i + 1e-9)   [loss.py:101]
        #   loss_kpt_i = factor_i * mean over (n_fg_i, nk) of (1-exp(-e))*vis
        # then sums over images. kobj is the per-image BCE mean, summed.
        fg_f = fg.astype(jnp.float32)
        n_fg = fg_f.sum(axis=1)                      # (b,) fg anchors per image
        total_i = n_fg * nk                          # kpt elements per image
        visible_i = (vis * fg_f[..., None]).sum(axis=(1, 2))
        factor_i = total_i / (visible_i + 1e-9)
        sum_elems = ((1 - jnp.exp(-e)) * vis * fg_f[..., None]).sum(axis=(1, 2))
        mean_i = sum_elems / jnp.maximum(total_i, 1.0)
        loss_kpt = jnp.where(n_fg > 0, factor_i * mean_i, 0.0).sum()
        if kdim == 3:
            bce_k = (_bce_logits(k[..., 2], vis) * fg_f[..., None]).sum(axis=(1, 2))
            loss_kobj = jnp.where(n_fg > 0,
                                  bce_k / jnp.maximum(total_i, 1.0), 0.0).sum()
        else:
            loss_kobj = jnp.zeros(())

        bg, cg, dg = self.gains
        # pose/kobj gains carry the reference's /batch_size (loss.py:380-381);
        # the trailing * b in the total restores the per-image sum scale.
        parts = jnp.stack([loss_box * bg, loss_kpt * self.pose_gain / b,
                           loss_kobj * self.kobj_gain / b, loss_cls * cg,
                           loss_dfl * dg])
        return LossOutputs(parts.sum() * b, jax.lax.stop_gradient(parts))
