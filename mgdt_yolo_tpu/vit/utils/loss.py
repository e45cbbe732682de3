"""DETR loss stack: varifocal/focal classification + L1 + GIoU box losses
over Hungarian-matched pairs, with per-decoder-layer aux losses and optional
denoising supervision (reference vit/utils/loss.py:12-290).

All main-branch math is jit-compatible; the matcher's LSA runs on host via
pure_callback (see vit/utils/ops.py).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.boxes import bbox_iou, xywh2xyxy
from .ops import HungarianMatcher


def _sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss


def _varifocal_loss(logits, gt_score, label, alpha: float = 0.75, gamma: float = 2.0):
    """VFL (reference loss.py:35-50): IoU-aware positive weighting."""
    p = jax.nn.sigmoid(logits)
    weight = alpha * (p ** gamma) * (1 - label) + gt_score * label
    ce = jnp.maximum(logits, 0) - logits * gt_score + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return ce * weight


class DETRLoss:
    """Single-layer loss + aux accumulation (reference loss.py:12-247)."""

    def __init__(self, nc: int = 80, loss_gain: Optional[Dict] = None,
                 use_vfl: bool = True, use_fl: bool = True):
        self.nc = nc
        self.loss_gain = loss_gain or {"class": 1, "bbox": 5, "giou": 2}
        self.use_vfl = use_vfl
        self.use_fl = use_fl
        self.matcher = HungarianMatcher(use_fl=use_fl)

    def _layer_loss(self, pred_bboxes, pred_scores, gt_bboxes, gt_cls, mask_gt,
                    match_idx=None):
        """Loss for one decoder layer's (b, nq, ...) predictions."""
        b, nq, _ = pred_scores.shape
        if match_idx is None:
            match_idx = self.matcher(pred_bboxes, pred_scores, gt_bboxes,
                                     gt_cls, mask_gt)  # (b, nq) gt idx or -1
        matched = match_idx >= 0
        safe_idx = jnp.clip(match_idx, 0, gt_bboxes.shape[1] - 1)
        tgt_box = jnp.take_along_axis(gt_bboxes, safe_idx[..., None], axis=1)
        tgt_cls = jnp.take_along_axis(gt_cls, safe_idx, axis=1)
        tgt_valid = matched & jnp.take_along_axis(mask_gt, safe_idx, axis=1)

        n_gt = jnp.maximum(tgt_valid.sum(), 1).astype(jnp.float32)

        # classification: one-hot (bg = all-zero) with optional IoU-aware VFL
        onehot = jax.nn.one_hot(tgt_cls, self.nc) * tgt_valid[..., None]
        if self.use_vfl:
            iou = bbox_iou(xywh2xyxy(pred_bboxes), xywh2xyxy(tgt_box),
                           xywh=False, CIoU=False).squeeze(-1)
            iou = jax.lax.stop_gradient(jnp.clip(iou, 0, 1)) * tgt_valid
            gt_score = onehot * iou[..., None]
            vfl = _varifocal_loss(pred_scores.astype(jnp.float32),
                                  gt_score, onehot).sum() / n_gt
            # reference falls back to FocalLoss (its default gamma 1.5) on a
            # zero-gt batch (vit/utils/loss.py:58-61 `if num_gts and
            # self.vfl`); traced in-graph as a select
            fl = _sigmoid_focal_loss(pred_scores.astype(jnp.float32),
                                     onehot, gamma=1.5).sum() / n_gt
            loss_cls = jnp.where(tgt_valid.sum() > 0, vfl, fl)
        elif self.use_fl:
            loss_cls = _sigmoid_focal_loss(pred_scores.astype(jnp.float32),
                                           onehot, gamma=1.5).sum() / n_gt
        else:
            p = jax.nn.log_softmax(pred_scores.astype(jnp.float32))
            loss_cls = -(onehot * p).sum() / n_gt

        # box: L1 + GIoU on matched pairs only
        l1 = jnp.abs(pred_bboxes - tgt_box).sum(-1) * tgt_valid
        giou = bbox_iou(xywh2xyxy(pred_bboxes), xywh2xyxy(tgt_box), xywh=False,
                        GIoU=True).squeeze(-1)
        lgiou = (1.0 - giou) * tgt_valid
        loss_bbox = l1.sum() / n_gt
        loss_giou = lgiou.sum() / n_gt
        g = self.loss_gain
        return {"loss_class": g["class"] * loss_cls,
                "loss_bbox": g["bbox"] * loss_bbox,
                "loss_giou": g["giou"] * loss_giou}

    def __call__(self, pred_bboxes, pred_scores, batch: Dict,
                 dn_meta: Optional[Dict] = None,
                 dn_bboxes=None, dn_scores=None) -> Tuple[jnp.ndarray, Dict]:
        """pred_bboxes/scores: (L, b, nq, ...) stacked decoder layers."""
        gt_bboxes = batch["gt_bboxes_norm"]   # (b, G, 4) xywh in [0,1]
        gt_cls = batch["gt_labels"]
        mask_gt = batch["mask_gt"]
        total = {}
        for li in range(pred_bboxes.shape[0]):
            parts = self._layer_loss(pred_bboxes[li], pred_scores[li],
                                     gt_bboxes, gt_cls, mask_gt)
            suffix = "" if li == pred_bboxes.shape[0] - 1 else f"_aux{li}"
            for k, v in parts.items():
                total[k + suffix] = v
        if dn_meta is not None and dn_bboxes is not None:
            # denoising queries have a KNOWN assignment: query j of each group
            # corresponds to gt j (positive half) / background (negative half)
            G = gt_bboxes.shape[1]
            D = dn_bboxes.shape[2]
            pos = ~dn_meta["neg_idx"]  # (D,)
            gt_idx = (jnp.arange(D) % G).astype(jnp.int32)[None].repeat(
                gt_bboxes.shape[0], 0)
            match_idx = jnp.where(pos[None] & dn_meta["dn_valid"], gt_idx, -1)
            for li in range(dn_bboxes.shape[0]):
                parts = self._layer_loss(dn_bboxes[li], dn_scores[li], gt_bboxes,
                                         gt_cls, mask_gt, match_idx=match_idx)
                for k, v in parts.items():
                    total[f"{k}_dn{li}"] = v
        loss = sum(total.values())
        return loss, total


class RTDETRDetectionLoss(DETRLoss):
    """RT-DETR composite: decoder stack + encoder top-k proposals + optional
    denoising split (reference loss.py:249-290)."""

    def __call__(self, outputs, batch: Dict, dn_meta: Optional[Dict] = None):
        dec_bboxes, dec_scores, enc_bboxes, enc_scores = outputs
        if dn_meta is not None:
            D = dn_meta["dn_num_split"][0]
            dn_b, dec_b = dec_bboxes[:, :, :D], dec_bboxes[:, :, D:]
            dn_s, dec_s = dec_scores[:, :, :D], dec_scores[:, :, D:]
        else:
            dn_b = dn_s = None
            dec_b, dec_s = dec_bboxes, dec_scores
        # PREPEND encoder predictions as the extra supervised "layer"
        # (reference nn/tasks.py:443 torch.cat([enc.unsqueeze(0), dec])):
        # the LAST layer must be the final decoder layer so the unsuffixed
        # main loss keys — what the trainer logs and early-stops on — track
        # the model's actual output head, not the encoder auxiliary
        all_b = jnp.concatenate([enc_bboxes[None], dec_b], axis=0)
        all_s = jnp.concatenate([enc_scores[None], dec_s], axis=0)
        return super().__call__(all_b, all_s, batch, dn_meta, dn_b, dn_s)
