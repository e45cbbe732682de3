"""Detection training loss: BCE cls + CIoU box + DFL, task-aligned targets.

JAX re-implementation of reference yolo/utils/loss.py:56-208 with static
shapes: targets arrive pre-padded to (b, max_gt, ...) from the data pipeline
(replacing the dynamic `preprocess` at loss.py:132-148), and all foreground
selection is mask arithmetic instead of boolean indexing. The whole loss is
jit-compatible and differentiable end-to-end.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox2dist, bbox_iou, dist2bbox, make_anchors
from .tal import heuristic_assign_v1


class LossOutputs(NamedTuple):
    total: jnp.ndarray        # scalar: loss.sum() * batch_size
    parts: jnp.ndarray        # (3,) detached box/cls/dfl components


def _bce_logits(logits, targets):
    """Elementwise binary cross-entropy with logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Two-sided distribution focal loss (reference loss.py:80-89).

    Gather-free TPU formulation: the reference's pair of cross-entropies at
    floor/ceil(target) with weights (ceil-t, t-floor) is exactly
    cross-entropy against the linear-interpolation weights
    w_k = max(0, 1 - |t - k|) over the bin axis — only those two bins get
    nonzero weight for t in [0, bins-1), the clamped bbox2dist domain.
    A broadcast-multiply-reduce over bins replaces the two
    jnp.take_along_axis lane-axis gathers, which XLA lowers to a per-index
    slow path (~12.5 ms each for b32's 819k indices vs <1 ms for the whole
    contraction — the dominant cost of the composed train-mode loss).

    Args:
        pred_dist: (..., 4, bins) logits.
        target: (..., 4) continuous ltrb distances in [0, bins-1).
    Returns:
        (...,) mean over the 4 sides.
    """
    bins = pred_dist.shape[-1]
    logp = jax.nn.log_softmax(pred_dist.astype(jnp.float32), axis=-1)
    k = jnp.arange(bins, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(target[..., None].astype(jnp.float32) - k))
    return -(w * logp).sum(axis=-1).mean(axis=-1)


class DetectionLoss:
    """v8DetectionLoss equivalent (reference loss.py:108-208).

    Static configuration lives on the object; __call__ is pure and traceable.
    The per-batch counter driving the assigner's alpha anneal (reference
    loss.py:206, a stateful increment) is passed in explicitly as `step`.
    """

    def __init__(self, nc: int, reg_max: int, strides: Sequence[int],
                 box_gain: float = 7.5, cls_gain: float = 0.5,
                 dfl_gain: float = 1.5, tal_topk: int = 10, tal_beta: float = 8.0,
                 epoch_num: int = 161):
        self.nc = nc
        self.reg_max = reg_max
        self.strides = tuple(strides)
        self.no = nc + reg_max * 4
        self.use_dfl = reg_max > 1
        self.gains = (box_gain, cls_gain, dfl_gain)
        self.tal_topk = tal_topk
        self.tal_beta = tal_beta
        self.epoch_num = epoch_num

    def __call__(self, feats: Sequence[jnp.ndarray], batch: Dict[str, jnp.ndarray],
                 step) -> LossOutputs:
        """Compute the loss.

        Args:
            feats: per-scale raw NHWC maps [(b, h, w, no), ...] (train head output).
            batch: dict with
                gt_labels (b, G) int32, gt_bboxes (b, G, 4) xyxy in input pixels,
                mask_gt (b, G) bool.
            step: int32 scalar — global batch counter for the alpha anneal.
        """
        c = self.detection_core(feats, batch, step)
        bg, cg, dg = self.gains
        parts = jnp.stack([c["loss_box"] * bg, c["loss_cls"] * cg,
                           c["loss_dfl"] * dg])
        return LossOutputs(parts.sum() * c["b"], jax.lax.stop_gradient(parts))

    def detection_core(self, feats, batch: Dict, step) -> Dict:
        """Flatten -> decode -> assign -> cls/box/dfl: the detection core.

        Shared by SegmentationLoss and PoseLoss exactly as the reference's
        v8SegmentationLoss/v8PoseLoss reuse v8DetectionLoss's body
        (loss.py:143-209) — one implementation, not three copies that can
        drift. Returns every intermediate the task losses build on."""
        b = feats[0].shape[0]
        flat = jnp.concatenate([f.reshape(b, -1, self.no) for f in feats], axis=1)
        pred_distri = flat[..., :self.reg_max * 4]     # (b, A, 4*reg_max)
        pred_scores = flat[..., self.reg_max * 4:]     # (b, A, nc)

        shapes = [f.shape[1:3] for f in feats]
        anchor_points, stride_tensor = make_anchors(shapes, self.strides, 0.5)

        pred_bboxes = self._bbox_decode(anchor_points, pred_distri)  # grid units, xyxy

        gt_labels = batch["gt_labels"]
        gt_bboxes = batch["gt_bboxes"].astype(jnp.float32)
        mask_gt = batch["mask_gt"]

        assign = heuristic_assign_v1(
            jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores.astype(jnp.float32))),
            jax.lax.stop_gradient(pred_bboxes * stride_tensor).astype(gt_bboxes.dtype),
            anchor_points * stride_tensor, gt_labels, gt_bboxes, mask_gt,
            step, num_classes=self.nc, epoch_num=self.epoch_num,
            topk=self.tal_topk, beta=self.tal_beta)

        target_scores = assign.target_scores
        target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)
        fg = assign.fg_mask  # (b, A) bool

        # cls: BCE over all anchors (reference loss.py:196)
        loss_cls = _bce_logits(pred_scores, target_scores).sum() / target_scores_sum

        # box + dfl on foreground anchors (mask arithmetic)
        target_bboxes = assign.target_bboxes / stride_tensor  # grid units
        weight = target_scores.sum(-1) * fg  # (b, A)
        iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True).squeeze(-1)
        loss_box = (((1.0 - iou) * weight)).sum() / target_scores_sum

        if self.use_dfl:
            target_ltrb = bbox2dist(anchor_points, target_bboxes, self.reg_max - 1)
            dist = pred_distri.reshape(b, -1, 4, self.reg_max)
            dfl = _df_loss(dist, target_ltrb) * weight
            loss_dfl = dfl.sum() / target_scores_sum
        else:
            loss_dfl = jnp.zeros(())

        return {"b": b, "shapes": shapes, "anchor_points": anchor_points,
                "stride_tensor": stride_tensor, "pred_scores": pred_scores,
                "pred_distri": pred_distri, "pred_bboxes": pred_bboxes,
                "assign": assign, "tss": target_scores_sum, "fg": fg,
                "target_bboxes": target_bboxes, "weight": weight,
                "loss_cls": loss_cls, "loss_box": loss_box,
                "loss_dfl": loss_dfl}

    def _bbox_decode(self, anchor_points, pred_distri):
        """DFL expectation -> xyxy boxes in grid units (reference loss.py:150-157)."""
        if self.use_dfl:
            b, a, c = pred_distri.shape
            probs = jax.nn.softmax(
                pred_distri.reshape(b, a, 4, c // 4).astype(jnp.float32), axis=-1)
            dist = probs @ jnp.arange(self.reg_max, dtype=jnp.float32)
        else:
            dist = pred_distri
        return dist2bbox(dist, anchor_points, xywh=False)


def pad_targets(batch_idx, cls, bboxes_xywhn, batch_size: int, max_gt: int,
                imgsz: Tuple[int, int]):
    """Host-side target packing: flat (N,) image idx / (N,) cls / (N,4) xywh-norm
    -> padded (b, max_gt) tensors in xyxy pixels.

    numpy implementation of the reference preprocess (loss.py:132-148) +
    xywh2xyxy scale, run in the data pipeline so the device side stays static.
    """
    import numpy as np
    h, w = imgsz
    gt_labels = np.zeros((batch_size, max_gt), np.int32)
    gt_bboxes = np.zeros((batch_size, max_gt, 4), np.float32)
    mask_gt = np.zeros((batch_size, max_gt), bool)
    for j in range(batch_size):
        sel = np.asarray(batch_idx) == j
        n = min(int(sel.sum()), max_gt)
        if n == 0:
            continue
        c = np.asarray(cls)[sel][:n]
        bb = np.asarray(bboxes_xywhn)[sel][:n].astype(np.float32)
        xy = bb[:, :2] * [w, h]
        wh = bb[:, 2:] * [w, h]
        gt_bboxes[j, :n, 0:2] = xy - wh / 2
        gt_bboxes[j, :n, 2:4] = xy + wh / 2
        gt_labels[j, :n] = c.reshape(-1)
        # reference masks by bbox-sum > 0 (loss.py:147)
        mask_gt[j, :n] = gt_bboxes[j, :n].sum(-1) > 0
    return gt_labels, gt_bboxes, mask_gt
