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
                       rng: Optional[random.Random] = None,
                       masks: Optional[np.ndarray] = None,
                       keypoints: Optional[np.ndarray] = None):
    """Composed affine warp T@S@R@P@C + box transform + candidate filter
    (reference augment.py:289-476). Optional per-instance `masks` (n, H, W)
    are warped with the same matrix (nearest), and `keypoints` (n, nk, 3)
    have xy transformed with visibility zeroed outside the canvas — the
    reference warps polygon segments / kpt arrays the same way
    (augment.py:378-404)."""
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
        # reference keeps far smaller remnants when instances carry segments
        # (area_thr 0.01 vs 0.10, augment.py:462-464) — masks ride this
        # pipeline, so mask-bearing calls must match that looser filter
        keep = box_candidates(boxes_xyxy.T * s, new.T,
                              area_thr=0.01 if (masks is not None
                                                and len(masks)) else 0.1)
        boxes_xyxy = new[keep]
        cls = cls[keep]
        if masks is not None and len(masks):
            warped = np.stack([
                cv2.warpPerspective(m, M, dsize=(w, h), borderValue=0)
                if perspective else
                cv2.warpAffine(m, M[:2], dsize=(w, h), borderValue=0)
                for m in masks])
            masks = warped[keep]
        if keypoints is not None and len(keypoints):
            nk = keypoints.shape[1]
            pts = np.ones((n * nk, 3))
            pts[:, :2] = keypoints[..., :2].reshape(n * nk, 2)
            pts = pts @ M.T
            pxy = (pts[:, :2] / pts[:, 2:3] if perspective
                   else pts[:, :2]).reshape(n, nk, 2)
            vis = keypoints[..., 2].copy()
            inside = ((pxy[..., 0] >= 0) & (pxy[..., 0] < w) &
                      (pxy[..., 1] >= 0) & (pxy[..., 1] < h))
            vis = np.where(inside, vis, 0.0)
            keypoints = np.concatenate([pxy, vis[..., None]], -1)[keep]
    extras = {}
    if masks is not None:
        extras["masks"] = masks
    if keypoints is not None:
        extras["keypoints"] = keypoints
    return img, boxes_xyxy, cls, extras


def resize_long_side(item: Dict, imgsz: int, augment: bool = True) -> Dict:
    """Resize so max(h, w) == imgsz before augmentation, scaling labels
    (reference load_image, yolo/data/base.py:146-160: r = imgsz/max(h0,w0),
    INTER_LINEAR when augmenting or upscaling else INTER_AREA). Without this,
    mosaic on native-resolution images trains on corner crops with most
    content and labels cropped out."""
    img = item["img"]
    h0, w0 = img.shape[:2]
    r = imgsz / max(h0, w0)
    if r == 1:
        return item
    interp = cv2.INTER_LINEAR if (augment or r > 1) else cv2.INTER_AREA
    w = min(math.ceil(w0 * r), imgsz)
    h = min(math.ceil(h0 * r), imgsz)
    img = cv2.resize(img, (w, h), interpolation=interp)
    out = dict(item, img=img)
    if len(item.get("boxes", ())):
        boxes = item["boxes"].copy()
        boxes[:, [0, 2]] *= w / w0
        boxes[:, [1, 3]] *= h / h0
        out["boxes"] = boxes
    if "keypoints" in item:
        kp = item["keypoints"].copy()
        kp[..., 0] *= w / w0
        kp[..., 1] *= h / h0
        out["keypoints"] = kp
    if "masks" in item and len(item["masks"]):
        out["masks"] = np.stack([
            cv2.resize(m, (w, h), interpolation=cv2.INTER_NEAREST)
            for m in item["masks"]])
    return out


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
    with_masks = any("masks" in it for it in items[:4])
    with_kpts = any("keypoints" in it for it in items[:4])
    all_boxes, all_cls, all_masks, all_kpts = [], [], [], []
    for i, item in enumerate(items[:4]):
        img = item["img"]
        h, w = img.shape[:2]
        # each tile anchors one corner at the mosaic center (xc, yc): left
        # tiles keep their RIGHT edge at xc (right-aligned source crop),
        # top tiles keep their BOTTOM edge at yc — the general rule behind
        # the reference's four hand-unrolled quadrant cases
        left, top = i in (0, 2), i in (0, 1)
        x1a = max(xc - w, 0) if left else xc
        x2a = xc if left else min(xc + w, 2 * s)
        y1a = max(yc - h, 0) if top else yc
        y2a = yc if top else min(yc + h, 2 * s)
        kw, kh = x2a - x1a, y2a - y1a  # kept extent after canvas clipping
        x1b, x2b = (w - kw, w) if left else (0, kw)
        y1b, y2b = (h - kh, h) if top else (0, kh)
        canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if len(item["boxes"]):
            b = item["boxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            all_boxes.append(b)
            all_cls.append(item["cls"])
            if with_masks:
                n = len(item["boxes"])
                planes = np.zeros((n, s * 2, s * 2), np.float32)
                if "masks" in item and len(item["masks"]):
                    planes[:, y1a:y2a, x1a:x2a] = \
                        item["masks"][:n, y1b:y2b, x1b:x2b]
                all_masks.append(planes)
            if with_kpts:
                if "keypoints" in item and len(item["keypoints"]):
                    kp = item["keypoints"].copy()
                    kp[..., 0] += padw
                    kp[..., 1] += padh
                    all_kpts.append(kp)
                else:  # box-only item in a kpt mosaic: all-invisible slots
                    nk = next(it["keypoints"].shape[1] for it in items[:4]
                              if "keypoints" in it)
                    all_kpts.append(np.zeros((len(item["boxes"]), nk, 3),
                                             np.float32))
    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.float32)
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
    extras = {}
    if with_masks:
        extras["masks"] = (np.concatenate(all_masks) if all_masks
                           else np.zeros((0, s * 2, s * 2), np.float32))
    if with_kpts:
        extras["keypoints"] = (np.concatenate(all_kpts) if all_kpts
                               else np.zeros((0, 17, 3), np.float32))
    return canvas, boxes, cls, extras


def mosaic9(items: List[Dict], imgsz: int, rng: Optional[random.Random] = None):
    """9-image mosaic on a 3x3 canvas, center-cropped to (2s)^2 so the
    caller's random_perspective(border=-s//2) contract matches mosaic4
    (reference _mosaic9, augment.py:190-237). Supports per-instance masks
    and keypoints like mosaic4."""
    rng = rng or random
    s = imgsz
    with_masks = any("masks" in it for it in items[:9])
    with_kpts = any("keypoints" in it for it in items[:9])
    img9 = np.full((s * 3, s * 3, 3), 114, dtype=np.uint8)
    hp = wp = -1
    h0 = w0 = s
    all_boxes, all_cls, all_masks, all_kpts = [], [], [], []
    for i, item in enumerate(items[:9]):
        img = item["img"]
        h, w = img.shape[:2]
        if i == 0:  # center
            h0, w0 = h, w
            c = s, s, s + w, s + h
        elif i == 1:  # top
            c = s, s - h, s + w, s
        elif i == 2:  # top right
            c = s + wp, s - h, s + wp + w, s
        elif i == 3:  # right
            c = s + w0, s, s + w0 + w, s + h
        elif i == 4:  # bottom right
            c = s + w0, s + hp, s + w0 + w, s + hp + h
        elif i == 5:  # bottom
            c = s + w0 - w, s + h0, s + w0, s + h0 + h
        elif i == 6:  # bottom left
            c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
        elif i == 7:  # left
            c = s - w, s + h0 - h, s, s + h0
        else:  # top left
            c = s - w, s + h0 - hp - h, s, s + h0 - hp
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        img9[y1:y2, x1:x2] = img[y1 - padh:y1 - padh + (y2 - y1),
                                 x1 - padw:x1 - padw + (x2 - x1)]
        hp, wp = h, w
        if len(item["boxes"]):
            b = item["boxes"].copy()
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
            all_boxes.append(b)
            all_cls.append(item["cls"])
            if with_masks:
                n = len(item["boxes"])
                planes = np.zeros((n, s * 3, s * 3), np.float32)
                if "masks" in item and len(item["masks"]):
                    planes[:, y1:y2, x1:x2] = item["masks"][
                        :n, y1 - padh:y1 - padh + (y2 - y1),
                        x1 - padw:x1 - padw + (x2 - x1)]
                all_masks.append(planes)
            if with_kpts:
                if "keypoints" in item and len(item["keypoints"]):
                    kp = item["keypoints"].copy()
                    kp[..., 0] += padw
                    kp[..., 1] += padh
                    all_kpts.append(kp)
                else:
                    nk = next(it["keypoints"].shape[1] for it in items[:9]
                              if "keypoints" in it)
                    all_kpts.append(np.zeros((len(item["boxes"]), nk, 3),
                                             np.float32))
    # crop the 3s canvas back to the 2s mosaic window [s//2, s//2 + 2s)
    off = s // 2
    canvas = img9[off:off + 2 * s, off:off + 2 * s]
    boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
    cls = np.concatenate(all_cls) if all_cls else np.zeros((0,), np.float32)
    boxes -= off
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
    extras = {}
    if with_masks:
        m = (np.concatenate(all_masks) if all_masks
             else np.zeros((0, s * 3, s * 3), np.float32))
        extras["masks"] = m[:, off:off + 2 * s, off:off + 2 * s]
    if with_kpts:
        k = (np.concatenate(all_kpts) if all_kpts
             else np.zeros((0, 17, 3), np.float32))
        k[..., :2] -= off
        extras["keypoints"] = k
    return canvas, boxes, cls, extras


def bbox_ioa(box1: np.ndarray, box2: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Intersection over box2 area, (n, m) (reference metrics.py:24-50)."""
    ix1 = np.maximum(box1[:, None, 0], box2[None, :, 0])
    iy1 = np.maximum(box1[:, None, 1], box2[None, :, 1])
    ix2 = np.minimum(box1[:, None, 2], box2[None, :, 2])
    iy2 = np.minimum(box1[:, None, 3], box2[None, :, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    area2 = ((box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1]))[None]
    return inter / (area2 + eps)


def copy_paste(img: np.ndarray, boxes: np.ndarray, cls: np.ndarray,
               masks: np.ndarray, p: float = 0.5,
               rng: Optional[random.Random] = None):
    """Segment Copy-Paste (reference augment.py:604-641, arXiv:2012.07177):
    lr-flipped instances whose flipped box overlaps every existing box by
    IoA < 0.30 are pasted (pixels under the flipped mask), duplicating their
    labels. Requires per-instance masks (n, H, W)."""
    rng = rng or random
    if not p or masks is None or not len(masks):
        return img, boxes, cls, masks
    h, w = img.shape[:2]
    flip_boxes = boxes.copy()
    flip_boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
    ioa = bbox_ioa(flip_boxes, boxes)
    candidates = np.nonzero((ioa < 0.30).all(1))[0]
    k = round(p * len(candidates))
    if k == 0:
        return img, boxes, cls, masks
    picks = rng.sample(list(candidates), k=k)
    img = img.copy()
    flipped_img = img[:, ::-1]
    new_boxes, new_cls, new_masks = [boxes], [cls], [masks]
    for j in picks:
        fm = masks[j][:, ::-1]  # lr-flipped instance mask
        sel = fm > 0.5
        img[sel] = flipped_img[sel]
        new_boxes.append(flip_boxes[j:j + 1])
        new_cls.append(cls[j:j + 1])
        new_masks.append(fm[None])
    return (img, np.concatenate(new_boxes), np.concatenate(new_cls),
            np.concatenate(new_masks))


class Albumentations:
    """Low-probability color-space jitter (reference augment.py:644-688):
    Blur / MedianBlur / ToGray / CLAHE, each applied independently at
    p=0.01 (the reference's RandomBrightnessContrast / RandomGamma /
    ImageCompression entries are configured at p=0.0 — dead by
    construction, deliberately not carried).

    The reference delegates these four to the external `albumentations`
    package; all four are plain cv2 one-liners, so this port implements
    them natively and uses the package only as an override when it happens
    to be installed (exact upstream sampling in that case). Native
    parameter distributions mirror albumentations 1.0.3 defaults:
    Blur/MedianBlur kernel odd in [3, 7], CLAHE clip_limit ~ U(1, 4) on an
    8x8 tile grid. One preserved quirk: the reference hands cv2-loaded BGR
    arrays to albumentations' RGB-assuming ops, so ToGray/CLAHE here use
    the RGB2GRAY/RGB2LAB conversion codes on BGR data, matching upstream's
    (mis)behavior rather than "fixing" the channel order.

    None of the four moves pixels, so boxes/classes pass through unchanged
    (the reference round-trips them through its bbox plumbing; p=0.01
    color jitter never drops a label).
    """

    def __init__(self, p: float = 1.0):
        self.p = p
        self.transform = None
        try:
            import albumentations as A
            T = [A.Blur(p=0.01), A.MedianBlur(p=0.01), A.ToGray(p=0.01),
                 A.CLAHE(p=0.01)]
            self.transform = A.Compose(
                T, bbox_params=A.BboxParams(format="yolo",
                                            label_fields=["class_labels"]))
        except ImportError:
            pass  # native cv2 path below
        except Exception as e:  # version mismatch etc.
            from ..utils import LOGGER
            LOGGER.info(f"albumentations disabled: {e}")

    @staticmethod
    def _native(img: np.ndarray, rng) -> np.ndarray:
        """The four reference transforms in cv2, one independent p=0.01
        draw each, in the reference's Compose order."""
        if rng.random() < 0.01:  # A.Blur: box filter, odd ksize in [3, 7]
            k = rng.choice([3, 5, 7])
            img = cv2.blur(img, (k, k))
        if rng.random() < 0.01:  # A.MedianBlur
            k = rng.choice([3, 5, 7])
            img = cv2.medianBlur(img, k)
        if rng.random() < 0.01:  # A.ToGray (RGB weights on BGR data — see
            g = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)  # class docstring)
            img = cv2.cvtColor(g, cv2.COLOR_GRAY2BGR)
        if rng.random() < 0.01:  # A.CLAHE on the LAB L channel
            clip = rng.uniform(1.0, 4.0)
            clahe = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8))
            lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
            lab[:, :, 0] = clahe.apply(lab[:, :, 0])
            img = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
        return img

    def __call__(self, img, boxes_xyxy, cls, rng: Optional[random.Random] = None):
        rng = rng or random
        if not len(cls) or rng.random() >= self.p:
            return img, boxes_xyxy, cls
        if self.transform is None:
            return self._native(img, rng), boxes_xyxy, cls
        h, w = img.shape[:2]
        xywh_n = np.stack([(boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2 / w,
                           (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2 / h,
                           (boxes_xyxy[:, 2] - boxes_xyxy[:, 0]) / w,
                           (boxes_xyxy[:, 3] - boxes_xyxy[:, 1]) / h], 1)
        new = self.transform(image=img, bboxes=xywh_n, class_labels=cls)
        if len(new["class_labels"]):
            img = new["image"]
            cls = np.asarray(new["class_labels"])
            bb = np.asarray(new["bboxes"], np.float32)
            boxes_xyxy = np.stack([(bb[:, 0] - bb[:, 2] / 2) * w,
                                   (bb[:, 1] - bb[:, 3] / 2) * h,
                                   (bb[:, 0] + bb[:, 2] / 2) * w,
                                   (bb[:, 1] + bb[:, 3] / 2) * h], 1)
        return img, boxes_xyxy, cls


_ALBUMENTATIONS: Optional[Albumentations] = None


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
                    rng: Optional[random.Random] = None,
                    flip_idx: Optional[List[int]] = None) -> Dict:
    """Full v8 train pipeline: mosaic -> affine -> HSV -> flips
    (reference v8_transforms, augment.py:762-790). Mutates nothing.
    Items carrying per-instance `masks` (n, H, W) / `keypoints` (n, nk, 3)
    ride the full geometric pipeline (instance-aware warp), matching the
    reference's segment/kpt handling in Mosaic/RandomPerspective/RandomFlip.
    `flip_idx` is the left/right keypoint permutation for horizontal flips
    (reference augment.py:529-536)."""
    rng = rng or random
    task_keys = [k for k in ("masks", "keypoints") if k in item]
    use_mosaic = rng.random() < getattr(hyp, "mosaic", 1.0)
    if use_mosaic and len(buffer) >= 3:
        # reference Mosaic supports n=4 or n=9 grids (augment.py:117-237);
        # v8 ships n=4, the 3x3 grid is opt-in via hyp.mosaic9
        use9 = (rng.random() < getattr(hyp, "mosaic9", 0.0)) and len(buffer) >= 8
        n_extra = 8 if use9 else 3
        picks = [item] + [buffer[rng.randrange(len(buffer))]
                          for _ in range(n_extra)]
        fn = mosaic9 if use9 else mosaic4
        img, boxes, cls, extras = fn(picks, imgsz, rng)
        border = (-imgsz // 2, -imgsz // 2)
    else:
        img0, r, (dw, dh) = letterbox(item["img"], (imgsz, imgsz), scaleup=True)
        boxes = item["boxes"].copy()
        if len(boxes):
            boxes[:, [0, 2]] = boxes[:, [0, 2]] * r[0] + dw
            boxes[:, [1, 3]] = boxes[:, [1, 3]] * r[1] + dh
        img, cls = img0, item["cls"]
        extras = {}
        if "masks" in item:
            h0, w0 = item["img"].shape[:2]
            nh, nw = int(round(h0 * r[1])), int(round(w0 * r[0]))
            planes = np.zeros((len(item["masks"]), img.shape[0], img.shape[1]),
                              np.float32)
            ty, tx = int(round(dh - 0.1)), int(round(dw - 0.1))
            for k, m in enumerate(item["masks"]):
                planes[k, ty:ty + nh, tx:tx + nw] = cv2.resize(
                    m, (nw, nh), interpolation=cv2.INTER_NEAREST)
            extras["masks"] = planes
        if "keypoints" in item:
            kp = item["keypoints"].copy()
            kp[..., 0] = kp[..., 0] * r[0] + dw
            kp[..., 1] = kp[..., 1] * r[1] + dh
            extras["keypoints"] = kp
        border = (0, 0)
    cp = getattr(hyp, "copy_paste", 0.0)
    if cp and "masks" in extras and len(extras["masks"]):
        # reference order: Mosaic -> CopyPaste -> RandomPerspective
        # (v8_transforms, augment.py:762-770)
        img, boxes, cls, extras["masks"] = copy_paste(
            img, boxes, cls, extras["masks"], p=cp, rng=rng)
    img, boxes, cls, extras = random_perspective(
        img, boxes, cls, degrees=hyp.degrees, translate=hyp.translate,
        scale=hyp.scale, shear=hyp.shear, perspective=hyp.perspective,
        border=border, rng=rng, masks=extras.get("masks"),
        keypoints=extras.get("keypoints"))
    # draw unconditionally so the rng stream is independent of buffer state
    use_mixup = rng.random() < getattr(hyp, "mixup", 0.0)
    if use_mixup and buffer and not task_keys:  # reference: detect-only mixup
        other = buffer[rng.randrange(len(buffer))]
        o_img, r, (dw, dh) = letterbox(other["img"], img.shape[:2], scaleup=True)
        o_boxes = other["boxes"].copy()
        if len(o_boxes):
            o_boxes[:, [0, 2]] = o_boxes[:, [0, 2]] * r[0] + dw
            o_boxes[:, [1, 3]] = o_boxes[:, [1, 3]] * r[1] + dh
        mixed = mixup({"img": img, "boxes": boxes, "cls": cls},
                      {"img": o_img, "boxes": o_boxes, "cls": other["cls"]}, rng)
        img, boxes, cls = mixed["img"], mixed["boxes"], mixed["cls"]
    global _ALBUMENTATIONS
    if _ALBUMENTATIONS is None:
        _ALBUMENTATIONS = Albumentations(p=1.0)
    if not task_keys:  # color-only jitter; bbox bookkeeping matches reference
        img, boxes, cls = _ALBUMENTATIONS(img, boxes, cls, rng)
    img = augment_hsv(img, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v, rng)
    h, w = img.shape[:2]
    masks = extras.get("masks")
    kpts = extras.get("keypoints")
    if rng.random() < getattr(hyp, "flipud", 0.0):
        img = np.flipud(img).copy()
        if len(boxes):
            boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
        if masks is not None and len(masks):
            masks = masks[:, ::-1].copy()
        if kpts is not None and len(kpts):
            kpts = kpts.copy()
            kpts[..., 1] = np.where(kpts[..., 2] > 0, h - kpts[..., 1], 0.0)
    if rng.random() < getattr(hyp, "fliplr", 0.0):
        img = np.fliplr(img).copy()
        if len(boxes):
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        if masks is not None and len(masks):
            masks = masks[:, :, ::-1].copy()
        if kpts is not None and len(kpts):
            kpts = kpts.copy()
            kpts[..., 0] = np.where(kpts[..., 2] > 0, w - kpts[..., 0], 0.0)
            if flip_idx is not None:  # left/right kpt swap
                kpts = kpts[:, list(flip_idx)]
    out = {"img": img, "boxes": boxes, "cls": cls}
    if masks is not None:
        out["masks"] = masks
    if kpts is not None:
        out["keypoints"] = kpts
    return out
