"""Result containers: Results / Boxes (reference yolo/engine/results.py:66-446).

numpy-backed (device results land here after NMS + rescale), same public
attribute surface: Boxes.xyxy/xywh/xyxyn/conf/cls/id, Results.plot/save_txt.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..utils import SimpleClass


class Boxes(SimpleClass):
    """(n, 6|7) detection rows [x1, y1, x2, y2, (track_id), conf, cls]."""

    def __init__(self, boxes: np.ndarray, orig_shape):
        boxes = np.atleast_2d(np.asarray(boxes))
        n = boxes.shape[-1]
        assert n in (6, 7), f"expected 6 or 7 values per box, got {n}"
        self.data = boxes
        self.orig_shape = np.asarray(orig_shape)
        self.is_track = n == 7

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        return Boxes(self.data[idx], self.orig_shape)

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, -2]

    @property
    def cls(self):
        return self.data[:, -1]

    @property
    def id(self):
        return self.data[:, -3] if self.is_track else None

    @property
    def xywh(self):
        b = self.xyxy
        return np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                         b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], 1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape[:2]
        return self.xyxy / np.array([w, h, w, h])

    @property
    def xywhn(self):
        h, w = self.orig_shape[:2]
        return self.xywh / np.array([w, h, w, h])


class Masks(SimpleClass):
    """(n, H, W) instance masks (reference results.py:447-500)."""

    def __init__(self, masks: np.ndarray, orig_shape):
        self.data = np.atleast_3d(np.asarray(masks))
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self):
        """Mask contours in pixel coords via cv2.findContours."""
        import cv2
        out = []
        for m in self.data:
            cnts, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
            out.append(max(cnts, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
                       if cnts else np.zeros((0, 2), np.float32))
        return out


class Keypoints(SimpleClass):
    """(n, nk, 2|3) keypoints (reference results.py:501-540)."""

    def __init__(self, kpts: np.ndarray, orig_shape):
        self.data = np.asarray(kpts)
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class Probs(SimpleClass):
    """Classification probabilities (reference results.py:541-605)."""

    def __init__(self, probs: np.ndarray):
        self.data = np.asarray(probs)

    @property
    def top1(self):
        return int(self.data.argmax())

    @property
    def top5(self):
        return self.data.argsort()[::-1][:5].tolist()

    @property
    def top1conf(self):
        return float(self.data.max())


class Results(SimpleClass):
    """Per-image inference result with plotting and serialization helpers."""

    def __init__(self, orig_img: np.ndarray, path: str, names: Dict[int, str],
                 boxes: Optional[np.ndarray] = None,
                 masks: Optional[np.ndarray] = None,
                 probs: Optional[np.ndarray] = None,
                 keypoints: Optional[np.ndarray] = None,
                 speed: Optional[Dict[str, float]] = None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None and len(boxes) \
            else Boxes(np.zeros((0, 6)), self.orig_shape)
        self.masks = Masks(masks, self.orig_shape) if masks is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.keypoints = Keypoints(keypoints, self.orig_shape) \
            if keypoints is not None else None
        self.speed = speed or {"preprocess": 0.0, "inference": 0.0, "postprocess": 0.0}

    def __len__(self):
        return len(self.boxes)

    def __getitem__(self, idx):
        return Results(self.orig_img, self.path, self.names,
                       self.boxes.data[idx] if len(self.boxes) else None,
                       speed=self.speed)

    def update(self, boxes: Optional[np.ndarray] = None):
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        return self

    def counts(self) -> Dict[int, int]:
        """Per-class detection counts — the fork's counting-eval primitive
        (nn/cal_model_count_error.py counts predict boxes per class)."""
        out: Dict[int, int] = {}
        for c in self.boxes.cls.astype(int):
            out[c] = out.get(c, 0) + 1
        return out

    def plot(self, line_width: Optional[int] = None, font_scale: float = 0.5):
        """Draw boxes onto a copy of the original image (BGR)."""
        import cv2
        img = self.orig_img.copy()
        lw = line_width or max(round(sum(img.shape) / 2 * 0.003), 2)
        palette = [(56, 56, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207),
                   (10, 249, 72), (23, 204, 146), (134, 219, 61), (52, 147, 26)]
        for row in self.boxes.data:
            x1, y1, x2, y2 = row[:4].astype(int)
            conf, c = row[-2], int(row[-1])
            color = palette[c % len(palette)]
            cv2.rectangle(img, (x1, y1), (x2, y2), color, lw)
            label = f"{self.names.get(c, c)} {conf:.2f}"
            cv2.putText(img, label, (x1, max(y1 - 4, 12)), cv2.FONT_HERSHEY_SIMPLEX,
                        font_scale, color, max(lw - 1, 1))
        return img

    def save_txt(self, txt_file, save_conf: bool = False):
        lines = []
        for row in self.boxes.data:
            c = int(row[-1])
            xywhn = Boxes(row[None], self.orig_shape).xywhn[0]
            vals = [c, *xywhn.tolist()] + ([float(row[-2])] if save_conf else [])
            lines.append(" ".join(f"{v:.6g}" if isinstance(v, float) else str(v)
                                  for v in vals))
        Path(txt_file).parent.mkdir(parents=True, exist_ok=True)
        Path(txt_file).write_text("\n".join(lines) + ("\n" if lines else ""))

    def tojson(self):
        import json
        out = []
        for row in self.boxes.data:
            c = int(row[-1])
            out.append({"name": str(self.names.get(c, c)), "class": c,
                        "confidence": float(row[-2]),
                        "box": {k: float(v) for k, v in
                                zip(("x1", "y1", "x2", "y2"), row[:4])}})
        return json.dumps(out, indent=2)
