"""Hungarian matching + contrastive denoising groups for DETR training.

Re-implementation of reference vit/utils/ops.py:12-255. The optimal
assignment itself runs on host scipy through jax.pure_callback over padded
static shapes (indices are stop-gradient, so this composes with jit/grad);
everything around it is pure JAX.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.boxes import bbox_iou, xywh2xyxy


def _giou_matrix(a_xyxy: jnp.ndarray, b_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(N,4) x (M,4) pairwise GIoU."""
    return bbox_iou(a_xyxy[:, None, :], b_xyxy[None, :, :], xywh=False,
                    GIoU=True).squeeze(-1)


def _host_assign(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Host-side LSA on the valid column block; returns col index per row
    (-1 = unmatched). cost: (nq, G); valid: (G,) bool."""
    import scipy.optimize
    g = int(valid.sum())
    out = np.full(cost.shape[0], -1, np.int32)
    if g == 0:
        return out
    c = np.nan_to_num(cost[:, :g], nan=1e6, posinf=1e6, neginf=-1e6)
    rows, cols = scipy.optimize.linear_sum_assignment(c)
    out[rows] = cols
    return out


class HungarianMatcher:
    """Optimal bipartite matching with the DETR cost mix
    (reference vit/utils/ops.py:12-140; weights class=2, bbox=5, giou=2,
    focal-modulated class cost)."""

    def __init__(self, cost_gain: Dict[str, float] | None = None,
                 use_fl: bool = True, alpha: float = 0.25, gamma: float = 2.0):
        self.cost_gain = cost_gain or {"class": 2, "bbox": 5, "giou": 2}
        self.use_fl = use_fl
        self.alpha = alpha
        self.gamma = gamma

    def __call__(self, pred_bboxes: jnp.ndarray, pred_scores: jnp.ndarray,
                 gt_bboxes: jnp.ndarray, gt_cls: jnp.ndarray,
                 mask_gt: jnp.ndarray) -> jnp.ndarray:
        """Args (all padded, static shapes):
            pred_bboxes: (b, nq, 4) xywh normalized.
            pred_scores: (b, nq, nc) logits.
            gt_bboxes: (b, G, 4) xywh normalized.
            gt_cls: (b, G) int. mask_gt: (b, G) bool.
        Returns (b, nq) int32: matched gt index per query, -1 if unmatched.
        """
        b, nq, nc = pred_scores.shape
        G = gt_bboxes.shape[1]
        scores = jax.nn.sigmoid(pred_scores.astype(jnp.float32))
        sc = jnp.take_along_axis(
            scores, jnp.broadcast_to(gt_cls[:, None, :], (b, nq, G)), axis=2)
        if self.use_fl:
            neg = (1 - self.alpha) * sc ** self.gamma * (-jnp.log1p(-sc + 1e-8))
            pos = self.alpha * (1 - sc) ** self.gamma * (-jnp.log(sc + 1e-8))
            cost_class = pos - neg
        else:
            cost_class = -sc
        cost_bbox = jnp.abs(pred_bboxes[:, :, None, :] -
                            gt_bboxes[:, None, :, :]).sum(-1)
        cost_giou = -_giou_matrix_batch(xywh2xyxy(pred_bboxes), xywh2xyxy(gt_bboxes))
        cost = (self.cost_gain["class"] * cost_class +
                self.cost_gain["bbox"] * cost_bbox +
                self.cost_gain["giou"] * cost_giou)
        cost = jnp.where(mask_gt[:, None, :], cost, 1e6)
        cost = jax.lax.stop_gradient(cost)

        def assign(c, v):
            return np.stack([_host_assign(ci, vi) for ci, vi in zip(c, v)]).astype(np.int32)

        out_shape = jax.ShapeDtypeStruct((b, nq), jnp.int32)
        return jax.pure_callback(assign, out_shape, cost, mask_gt)


def _giou_matrix_batch(a, b):
    return jax.vmap(_giou_matrix)(a, b)


def get_cdn_group(gt_cls: jnp.ndarray, gt_bboxes: jnp.ndarray,
                  mask_gt: jnp.ndarray, num_classes: int, num_queries: int,
                  class_embed: jnp.ndarray, num_dn: int = 100,
                  cls_noise_ratio: float = 0.5, box_noise_scale: float = 1.0,
                  key=None):
    """Contrastive denoising group (reference vit/utils/ops.py:143-255),
    fixed-shape: every image contributes `group_size = 2*G` dn queries per
    group with num_group = max(1, num_dn // max_gt) groups; padding rows ride
    along masked.

    Returns (dn_embed (b, D, hd), dn_bbox (b, D, 4 logit-space), attn_mask
    (Q+D, Q+D) bool True=blocked, dn_meta).
    """
    b, G = gt_cls.shape
    if G == 0 or num_dn <= 0:
        return None, None, None, None
    key = key if key is not None else jax.random.PRNGKey(0)
    num_group = max(1, num_dn // max(G, 1))
    D = 2 * G * num_group  # positive + negative per group
    k1, k2, k3 = jax.random.split(key, 3)

    cls = jnp.tile(gt_cls, (1, 2 * num_group))            # (b, D)
    box = jnp.tile(gt_bboxes, (1, 2 * num_group, 1))      # (b, D, 4)
    valid = jnp.tile(mask_gt, (1, 2 * num_group))
    neg_idx = (jnp.arange(D) % (2 * G)) >= G              # second half of each group

    if cls_noise_ratio > 0:
        flip = jax.random.uniform(k1, (b, D)) < (cls_noise_ratio * 0.5)
        rand_cls = jax.random.randint(k2, (b, D), 0, num_classes)
        cls = jnp.where(flip & valid, rand_cls, cls)

    if box_noise_scale > 0:
        wh = box[..., 2:]
        diff = jnp.concatenate([wh / 2, wh / 2], -1) * box_noise_scale  # (b,D,4)
        rand_sign = jax.random.rademacher(k3, (b, D, 4), dtype=jnp.float32)
        rand_part = jax.random.uniform(jax.random.fold_in(k3, 1), (b, D, 4))
        rand_part = jnp.where(neg_idx[None, :, None], rand_part + 1.0, rand_part)
        xyxy = xywh2xyxy(box) + rand_part * rand_sign * diff
        xyxy = jnp.clip(xyxy, 0, 1)
        from ...ops.boxes import xyxy2xywh
        box = xyxy2xywh(xyxy)

    dn_embed = class_embed[cls]  # (b, D, hd)
    dn_bbox = jnp.log(jnp.clip(box, 1e-5, None) / jnp.clip(1 - box, 1e-5, None))

    total = num_queries + D
    attn_mask = np.zeros((total, total), bool)
    attn_mask[D:, :D] = True  # real queries cannot see dn queries
    gs = 2 * G
    for g in range(num_group):
        s, e = g * gs, (g + 1) * gs
        attn_mask[s:e, :s] = True
        attn_mask[s:e, e:D] = True
    dn_meta = {"dn_num_group": num_group, "dn_num_split": [D, num_queries],
               "group_size": gs, "dn_pos_idx_is_first_half": True,
               "dn_valid": valid, "dn_cls": cls, "neg_idx": neg_idx}
    return dn_embed, dn_bbox, jnp.asarray(attn_mask), dn_meta
