"""RT-DETR validation helpers: square letterbox + no-NMS postprocess
(reference vit/rtdetr/val.py:49-106)."""
from __future__ import annotations

import numpy as np

from ...data.augment import letterbox


def square_letterbox(img: np.ndarray, imgsz: int):
    """scaleup square letterbox, returns (rgb float 0-1, meta)."""
    out, ratio, pad = letterbox(img, (imgsz, imgsz), scaleup=True)
    return out[..., ::-1].astype(np.float32) / 255.0, \
        {"ori_shape": img.shape[:2], "ratio_pad": (ratio, pad)}


def postprocess_queries(bboxes_norm: np.ndarray, scores: np.ndarray,
                        conf: float = 0.001):
    """Top-query filtering (val.py:90-106): no NMS, just score threshold."""
    from ...ops.boxes import xywh2xyxy
    bb = np.asarray(xywh2xyxy(bboxes_norm))
    cls = scores.argmax(-1)
    val = scores.max(-1)
    keep = val > conf
    return np.concatenate([bb[keep], val[keep, None],
                           cls[keep, None].astype(np.float32)], axis=1)
