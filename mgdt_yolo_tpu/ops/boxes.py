"""Box geometry: conversions, IoU family, anchors, DFL distance transforms.

Functional JAX equivalents of the reference's box math
(`yolo/utils/metrics.py:52-129`, `yolo/utils/ops.py:345-518`,
`yolo/utils/tal.py:476-506`), with identical numerics so mAP and the
task-aligned assigner match.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2), last-dim layout."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h), last-dim layout."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywhn2xyxy(x: jnp.ndarray, w: float, h: float, padw: float = 0.0, padh: float = 0.0) -> jnp.ndarray:
    """Normalized (cx,cy,w,h) -> pixel (x1,y1,x2,y2)."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([
        w * (cx - bw / 2) + padw, h * (cy - bh / 2) + padh,
        w * (cx + bw / 2) + padw, h * (cy + bh / 2) + padh], axis=-1)


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU of two xyxy box sets: (N,4) x (M,4) -> (N,M)."""
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:], box2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    a2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    return inter / (a1[:, None] + a2[None, :] - inter + eps)


def bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, xywh: bool = True,
             GIoU: bool = False, DIoU: bool = False, CIoU: bool = False,
             eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise IoU/GIoU/DIoU/CIoU between aligned box arrays (broadcasting).

    Numerics match reference yolo/utils/metrics.py:75-129 (used both by the
    assigner metric and the CIoU box loss).
    """
    if xywh:
        (x1, y1, w1, h1) = jnp.split(box1, 4, -1)
        (x2, y2, w2, h2) = jnp.split(box2, 4, -1)
        w1_, h1_, w2_, h2_ = w1 / 2, h1 / 2, w2 / 2, h2 / 2
        b1x1, b1x2, b1y1, b1y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2x1, b2x2, b2y1, b2y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
    else:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, -1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, -1)
        w1, h1 = b1x2 - b1x1, (b1y2 - b1y1) + eps
        w2, h2 = b2x2 - b2x1, (b2y2 - b2y1) + eps

    inter = (jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None) *
             jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)  # convex width
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)  # convex height
    if CIoU or DIoU:
        c2 = cw ** 2 + ch ** 2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def make_anchors(feat_shapes, strides, grid_cell_offset: float = 0.5,
                 dtype=jnp.float32):
    """Grid anchor centers + per-anchor stride from static feature map shapes.

    Unlike the reference (yolo/utils/tal.py:476-488) this takes (h, w) tuples
    instead of live tensors — shapes are static under jit.
    Returns (anchor_points (A,2) in grid units, stride_tensor (A,1)).
    """
    anchor_points, stride_tensor = [], []
    for (h, w), stride in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=dtype) + grid_cell_offset
        sy = jnp.arange(h, dtype=dtype) + grid_cell_offset
        syy, sxx = jnp.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(jnp.stack([sxx, syy], axis=-1).reshape(-1, 2))
        stride_tensor.append(jnp.full((h * w, 1), stride, dtype=dtype))
    return jnp.concatenate(anchor_points), jnp.concatenate(stride_tensor)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray,
              xywh: bool = True, axis: int = -1) -> jnp.ndarray:
    """ltrb distances -> boxes around anchor points (tal.py:491-500)."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: float) -> jnp.ndarray:
    """xyxy boxes -> clamped ltrb distances (tal.py:503-506)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    return jnp.clip(jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1),
                    0, reg_max - 0.01)


def clip_boxes(boxes: jnp.ndarray, shape) -> jnp.ndarray:
    """Clip xyxy boxes to image shape (h, w)."""
    h, w = shape[:2]
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)], axis=-1)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Undo letterbox: rescale boxes from model-input space to original image.

    Matches reference yolo/utils/ops.py:90-117 rounding exactly.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        # the reference rounds the computed padding DOWN by 0.1 before
        # rounding (ops.py:108-109) — integer-pixel pads with ties toward
        # zero; keeping the fraction shifts every box by up to 0.5 px and
        # flips TP/FP matches at high IoU thresholds
        pad = (round((img1_shape[1] - img0_shape[1] * gain) / 2 - 0.1),
               round((img1_shape[0] - img0_shape[0] * gain) / 2 - 0.1))
    else:
        gain, pad = ratio_pad[0][0], ratio_pad[1]
    if isinstance(boxes, np.ndarray):
        boxes = boxes.copy()
        boxes[..., [0, 2]] -= pad[0]
        boxes[..., [1, 3]] -= pad[1]
        boxes[..., :4] /= gain
        boxes[..., [0, 2]] = boxes[..., [0, 2]].clip(0, img0_shape[1])
        boxes[..., [1, 3]] = boxes[..., [1, 3]].clip(0, img0_shape[0])
        return boxes
    shift = jnp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=boxes.dtype)
    out = (boxes[..., :4] - shift) / gain
    out = clip_boxes(out, img0_shape)
    if boxes.shape[-1] > 4:  # preserve conf/cls columns like the np branch
        out = jnp.concatenate([out, boxes[..., 4:]], axis=-1)
    return out
