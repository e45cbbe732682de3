"""Host-side image augmentation: letterbox, mosaic, affine, HSV, flips.

numpy/cv2 re-implementation of the reference transform stack
(yolo/data/augment.py:117-601, v8_transforms at :762-790). Rounding in
`letterbox` matches the reference exactly (the +-0.1 tricks at :582-583) so
box rescaling is bit-compatible. These run on host worker threads feeding
padded NHWC device batches; a fused Pallas/XLA device-side path for the
static-shape parts (normalize + HSV) lives in ops/.
"""
from __future__ import annotations

import math
import random
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np


def letterbox(img: np.ndarray, new_shape: Tuple[int, int] = (640, 640),
              color: Tuple[int, int, int] = (114, 114, 114), auto: bool = False,
              scale_fill: bool = False, scaleup: bool = True, stride: int = 32
              ) -> Tuple[np.ndarray, Tuple[float, float], Tuple[float, float]]:
    """Aspect-preserving resize + pad (reference augment.py:538-601)."""
    shape = img.shape[:2]  # h, w
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT,
                             value=color)
    return img, ratio, (dw, dh)


def augment_hsv(img: np.ndarray, hgain: float = 0.015, sgain: float = 0.7,
                vgain: float = 0.4, rng: Optional[random.Random] = None) -> np.ndarray:
    """LUT-based HSV jitter (reference augment.py:479-501). BGR uint8 in/out."""
    rng = rng or random
    if hgain or sgain or vgain:
        r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(np.uint8)
        lut_sat = np.clip(x * r[1], 0, 255).astype(np.uint8)
        lut_val = np.clip(x * r[2], 0, 255).astype(np.uint8)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                            cv2.LUT(val, lut_val)))
        img = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)
    return img


def box_candidates(box1: np.ndarray, box2: np.ndarray, wh_thr: float = 2,
                   ar_thr: float = 100, area_thr: float = 0.1,
                   eps: float = 1e-16) -> np.ndarray:
    """Keep boxes that survived the affine warp (reference augment.py:469-476)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr) &
            (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


def random_perspective(img: np.ndarray, boxes_xyxy: np.ndarray, cls: np.ndarray,
                       degrees: float = 0.0, translate: float = 0.1,
                       scale: float = 0.5, shear: float = 0.0,
                       perspective: float = 0.0,
                       border: Tuple[int, int] = (0, 0),
                       rng: Optional[random.Random] = None):
    """Composed affine warp T@S@R@P@C + box transform + candidate filter
    (reference augment.py:289-476)."""
    rng = rng or random
    h = img.shape[0] + border[0] * 2
    w = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * h
    M = T @ S @ R @ P @ C
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(w, h), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(w, h), borderValue=(114, 114, 114))

    n = len(boxes_xyxy)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = boxes_xyxy[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
        keep = box_candidates(boxes_xyxy.T * s, new.T, area_thr=0.1)
        boxes_xyxy = new[keep]
        cls = cls[keep]
    return img, boxes_xyxy, cls


def mosaic4(items: List[Dict], imgsz: int, rng: Optional[random.Random] = None):
    """4-image mosaic on a 2x2 canvas (reference augment.py:117-214).

    Each item: {'img': HxWx3 uint8, 'boxes': (n,4) xyxy px, 'cls': (n,)}.
    Returns canvas (2*imgsz)^2 and merged labels; caller follows with
    random_perspective(border=-imgsz//2) to crop back to imgsz.
    """
    rng = rng or random
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    all_boxes, all_cls = [], []
    for i, item in enumerate(items[:4]):
        img = item["img"]
        h, w = img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(item["boxes"]):
            b = item["boxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            all_boxes.append(b)
            all_cls.append(item["cls"])
    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.float32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
    return canvas, boxes, cls


def mixup(item_a: Dict, item_b: Dict, rng: Optional[random.Random] = None) -> Dict:
    """Beta(32, 32) image blend with label union (reference augment.py:270-287)."""
    rng = rng or random
    r = np.random.default_rng(rng.randrange(2 ** 31)).beta(32.0, 32.0)
    img = (item_a["img"].astype(np.float32) * r +
           item_b["img"].astype(np.float32) * (1 - r)).astype(np.uint8)
    boxes = np.concatenate([item_a["boxes"], item_b["boxes"]])
    cls = np.concatenate([item_a["cls"], item_b["cls"]])
    return {"img": img, "boxes": boxes, "cls": cls}


def train_transform(item: Dict, imgsz: int, hyp, buffer: List[Dict],
                    rng: Optional[random.Random] = None) -> Dict:
    """Full v8 train pipeline: mosaic -> affine -> HSV -> flips
    (reference v8_transforms, augment.py:762-790). Mutates nothing."""
    rng = rng or random
    use_mosaic = rng.random() < getattr(hyp, "mosaic", 1.0)
    if use_mosaic and len(buffer) >= 3:
        picks = [item] + [buffer[rng.randrange(len(buffer))] for _ in range(3)]
        img, boxes, cls = mosaic4(picks, imgsz, rng)
        border = (-imgsz // 2, -imgsz // 2)
    else:
        img0, r, (dw, dh) = letterbox(item["img"], (imgsz, imgsz), scaleup=True)
        boxes = item["boxes"].copy()
        if len(boxes):
            boxes[:, [0, 2]] = boxes[:, [0, 2]] * r[0] + dw
            boxes[:, [1, 3]] = boxes[:, [1, 3]] * r[1] + dh
        img, cls = img0, item["cls"]
        border = (0, 0)
    img, boxes, cls = random_perspective(
        img, boxes, cls, degrees=hyp.degrees, translate=hyp.translate,
        scale=hyp.scale, shear=hyp.shear, perspective=hyp.perspective,
        border=border, rng=rng)
    # draw unconditionally so the rng stream is independent of buffer state
    use_mixup = rng.random() < getattr(hyp, "mixup", 0.0)
    if use_mixup and buffer:
        other = buffer[rng.randrange(len(buffer))]
        o_img, r, (dw, dh) = letterbox(other["img"], img.shape[:2], scaleup=True)
        o_boxes = other["boxes"].copy()
        if len(o_boxes):
            o_boxes[:, [0, 2]] = o_boxes[:, [0, 2]] * r[0] + dw
            o_boxes[:, [1, 3]] = o_boxes[:, [1, 3]] * r[1] + dh
        mixed = mixup({"img": img, "boxes": boxes, "cls": cls},
                      {"img": o_img, "boxes": o_boxes, "cls": other["cls"]}, rng)
        img, boxes, cls = mixed["img"], mixed["boxes"], mixed["cls"]
    img = augment_hsv(img, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v, rng)
    h, w = img.shape[:2]
    if rng.random() < getattr(hyp, "flipud", 0.0):
        img = np.flipud(img).copy()
        if len(boxes):
            boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
    if rng.random() < getattr(hyp, "fliplr", 0.0):
        img = np.fliplr(img).copy()
        if len(boxes):
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    return {"img": img, "boxes": boxes, "cls": cls}
