"""Task-aligned label assignment, fixed-shape JAX (fully jit-compatible).

Re-implements the fork's assigner stack (reference yolo/utils/tal.py):
- TaskAlignedAssigner with the fork's modifications: metric s^alpha * CIoU^beta
  with **annealed alpha = 0.5*(100-coff)/100** (tal.py:266-267) and multi-GT
  dedup by **align_metric** instead of overlaps (tal.py:222).
- HeuristicPositiveSampleAssigner_v1 wrapper: coff = step // epoch_num with
  the fork's hardcoded epoch_num=161 made an explicit parameter (tal.py:74,110).

All tensors are padded to a static max_gt; empty images degenerate to zero
masks instead of the reference's dynamic early-return (tal.py:206-210).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray   # (b, A) int32
    target_bboxes: jnp.ndarray   # (b, A, 4) xyxy (same units as gt input)
    target_scores: jnp.ndarray   # (b, A, nc) float
    fg_mask: jnp.ndarray         # (b, A) bool
    target_gt_idx: jnp.ndarray   # (b, A) int32


def select_candidates_in_gts(xy_centers: jnp.ndarray, gt_bboxes: jnp.ndarray,
                             eps: float = 1e-9) -> jnp.ndarray:
    """Anchors whose center lies strictly inside each gt box -> (b, G, A)."""
    lt = gt_bboxes[..., None, :2]          # (b, G, 1, 2)
    rb = gt_bboxes[..., None, 2:]
    deltas = jnp.concatenate([xy_centers[None, None] - lt,
                              rb - xy_centers[None, None]], axis=-1)  # (b,G,A,4)
    return (deltas.min(axis=-1) > eps).astype(gt_bboxes.dtype)


def select_highest_overlaps(mask_pos: jnp.ndarray, metric: jnp.ndarray,
                            n_max_boxes: int):
    """Resolve anchors claimed by several gts: keep the highest-metric gt.

    The fork passes align_metric here, not overlaps (reference tal.py:222) —
    an intentional divergence from upstream that changes assignment ties.
    """
    fg_mask = mask_pos.sum(axis=-2)  # (b, A)
    mask_multi = (fg_mask[:, None, :] > 1)  # (b, 1, A) broadcast over G
    max_idx = metric.argmax(axis=-2)  # (b, A)
    # iota-compare builds the (b, G, A) one-hot directly with anchors on the
    # lane axis — no (b, A, G) minor-dim-G intermediate + transpose
    is_max = (max_idx[:, None, :] ==
              jnp.arange(n_max_boxes)[None, :, None]).astype(mask_pos.dtype)
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=-2)
    target_gt_idx = mask_pos.argmax(axis=-2)  # (b, A)
    return target_gt_idx, fg_mask, mask_pos


def _select_topk_candidates(metrics: jnp.ndarray, topk: int,
                            topk_mask: jnp.ndarray) -> jnp.ndarray:
    """Reference select_topk_candidates (tal.py:272-306): scatter-count top-k
    indices (invalid -> index 0), zeroing anchors counted more than once."""
    A = metrics.shape[-1]
    _, idxs = jax.lax.top_k(metrics, topk)  # (b, G, k)
    idxs = jnp.where(topk_mask, idxs, 0)
    count = jax.nn.one_hot(idxs, A, dtype=jnp.int32).sum(axis=-2)  # (b, G, A)
    count = jnp.where(count > 1, 0, count)
    return count.astype(metrics.dtype)


@partial(jax.jit, static_argnames=("num_classes", "topk", "beta_static"))
def task_aligned_assign(pd_scores: jnp.ndarray, pd_bboxes: jnp.ndarray,
                        anc_points: jnp.ndarray, gt_labels: jnp.ndarray,
                        gt_bboxes: jnp.ndarray, mask_gt: jnp.ndarray,
                        alpha: jnp.ndarray, num_classes: int, topk: int = 10,
                        beta_static: float = 8.0, eps: float = 1e-9) -> AssignResult:
    """Task-aligned assignment over padded gt tensors.

    Args:
        pd_scores: (b, A, nc) sigmoid class scores.
        pd_bboxes: (b, A, 4) xyxy predictions (image pixels).
        anc_points: (A, 2) anchor centers (image pixels).
        gt_labels: (b, G) int class ids (0 for padding rows).
        gt_bboxes: (b, G, 4) xyxy (zeros for padding rows).
        mask_gt: (b, G) validity of each gt row.
        alpha: traced scalar — the annealed classification exponent.
    """
    b, A, nc = pd_scores.shape
    G = gt_bboxes.shape[1]
    mask_gt_f = mask_gt.astype(pd_scores.dtype)

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)  # (b, G, A)
    valid = mask_in_gts * mask_gt_f[..., None]

    # per-gt class scores at every anchor: (b, G, A) — one-hot contraction
    # over classes instead of a row gather (same rationale as below)
    cls_oh = jax.nn.one_hot(gt_labels, nc, dtype=pd_scores.dtype)  # (b,G,nc)
    bbox_scores = jnp.einsum('bgc,bac->bga', cls_oh, pd_scores)
    bbox_scores = bbox_scores * valid

    overlaps = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :],
                        xywh=False, CIoU=True).squeeze(-1)
    overlaps = jnp.clip(overlaps, 0, None) * valid

    align_metric = bbox_scores ** alpha * overlaps ** beta_static

    topk_mask = jnp.broadcast_to(mask_gt[..., None], (b, G, topk))
    mask_topk = _select_topk_candidates(align_metric, topk, topk_mask)
    mask_pos = mask_topk * mask_in_gts * mask_gt_f[..., None]

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(
        mask_pos, align_metric, G)

    # gather targets — as one-hot contractions: XLA lowers row gathers with
    # (b, A)-shaped indices to a per-index slow path (~1 ms each here); the
    # iota-compare mask keeps anchors on lanes and G on sublanes
    is_gt = (target_gt_idx[:, None, :] ==
             jnp.arange(G)[None, :, None])  # (b, G, A) one-hot over gts
    target_labels = jnp.where(is_gt, gt_labels[..., None].astype(jnp.int32),
                              0).sum(axis=1)  # (b, A)
    target_bboxes = jnp.einsum('bga,bgc->bac',
                               is_gt.astype(gt_bboxes.dtype), gt_bboxes)
    fg = fg_mask > 0
    target_scores = jax.nn.one_hot(target_labels, num_classes,
                                   dtype=pd_scores.dtype)
    target_scores = jnp.where(fg[..., None], target_scores, 0.0)

    # normalize by best overlap per gt (reference tal.py:224-231)
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(axis=-1, keepdims=True)       # (b, G, 1)
    pos_overlaps = (overlaps * mask_pos).max(axis=-1, keepdims=True)
    norm = (align_metric * pos_overlaps / (pos_align + eps)).max(axis=-2)  # (b, A)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg,
                        target_gt_idx)


@partial(jax.jit, static_argnames=("num_classes", "topk", "alpha", "beta",
                                   "dynamic_threshold"))
def heuristic_assign_v2(pd_scores, pd_bboxes, anc_points, gt_labels,
                        gt_bboxes, mask_gt, num_classes: int, topk: int = 13,
                        alpha: float = 1.0, beta: float = 6.0,
                        dynamic_threshold: float = 0.4,
                        eps: float = 1e-9) -> AssignResult:
    """HeuristicPositiveSampleAssigner_v2 (reference tal.py:355-474) —
    dormant in the reference (commented out at loss.py:128), ported for
    component completeness.

    Differences from the active v1/TAL path, preserved deliberately:
    - static alpha=1.0 / beta=6.0 / topk=13 (no anneal);
    - top-k counting does NOT zero duplicate-counted anchors and ignores
      its own `topk_metrics > eps` mask (reference :443-452 computes
      `topk_mask` but never applies it);
    - multi-GT dedup uses `overlaps` (upstream semantics), not the v1
      fork's align_metric;
    - target_scores are one-hot then rescaled by a *dynamic-threshold*
      normalization `amax_G(align / (dt * amax_A(align) + eps))` — values
      can exceed 1 by construction (1/dt at the best anchor).
    """
    b, A, nc = pd_scores.shape
    G = gt_bboxes.shape[1]
    mask_gt_f = mask_gt.astype(pd_scores.dtype)

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
    valid = mask_in_gts * mask_gt_f[..., None]
    cls_oh = jax.nn.one_hot(gt_labels, nc, dtype=pd_scores.dtype)
    bbox_scores = jnp.einsum('bgc,bac->bga', cls_oh, pd_scores) * valid
    overlaps = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :],
                        xywh=False, CIoU=True).squeeze(-1)
    overlaps = jnp.clip(overlaps, 0, None) * valid
    align_metric = bbox_scores ** alpha * overlaps ** beta

    # reference :443-452: scatter-count top-k indices with no validity mask
    # and no duplicate zeroing — bit-for-bit including those quirks
    _, idxs = jax.lax.top_k(align_metric, topk)
    mask_topk = jax.nn.one_hot(idxs, A, dtype=jnp.int32).sum(axis=-2)
    mask_pos = mask_topk.astype(align_metric.dtype) * mask_in_gts \
        * mask_gt_f[..., None]

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(
        mask_pos, overlaps, G)

    is_gt = (target_gt_idx[:, None, :] ==
             jnp.arange(G)[None, :, None])  # (b, G, A), same trick as v1
    target_labels = jnp.where(is_gt, gt_labels[..., None].astype(jnp.int32),
                              0).sum(axis=1)
    target_bboxes = jnp.einsum('bga,bgc->bac',
                               is_gt.astype(gt_bboxes.dtype), gt_bboxes)
    fg = fg_mask > 0
    target_scores = jax.nn.one_hot(target_labels, num_classes,
                                   dtype=pd_scores.dtype)
    target_scores = jnp.where(fg[..., None], target_scores, 0.0)

    # dynamic-threshold refinement (reference :405-409)
    align_metric = align_metric * mask_pos
    dynamic_metric = dynamic_threshold * align_metric.max(axis=-1,
                                                          keepdims=True)
    norm = (align_metric / (dynamic_metric + eps)).max(axis=-2)  # (b, A)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg,
                        target_gt_idx)


def heuristic_assign_v1(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                        mask_gt, step, num_classes: int, epoch_num: int = 161,
                        max_epochs: int = 100, topk: int = 10,
                        beta: float = 8.0) -> AssignResult:
    """HeuristicPositiveSampleAssigner_v1 (reference tal.py:56-142).

    `step` is the per-batch loss-call counter the reference calls `epoch`
    (incremented at loss.py:206); coff = step // epoch_num, and alpha anneals
    as 0.5 * (max_epochs - coff) / max_epochs (tal.py:266-267).
    """
    coff = jnp.asarray(step) // epoch_num
    alpha = 0.5 * (max_epochs - coff.astype(jnp.float32)) / max_epochs
    return task_aligned_assign(pd_scores, pd_bboxes, anc_points, gt_labels,
                               gt_bboxes, mask_gt, alpha,
                               num_classes=num_classes, topk=topk,
                               beta_static=beta)
