"""Result containers: Results / Boxes (reference yolo/engine/results.py:66-446).

numpy-backed (device results land here after NMS + rescale), same public
attribute surface: Boxes.xyxy/xywh/xyxyn/conf/cls/id, Results.plot/save_txt.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..utils import LOGGER, SimpleClass


class _TensorOps:
    """Reference BaseTensor device-handling surface (results.py:20-63):
    numpy-native here, so cpu/numpy/cuda/to are identity passthroughs kept
    for API compatibility."""

    @property
    def shape(self):
        return self.data.shape

    def cpu(self):
        return self

    def numpy(self):
        return self

    def cuda(self):
        return self

    def to(self, *args, **kwargs):
        return self


class Boxes(SimpleClass, _TensorOps):
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

    _deprecated = ("boxes",)  # excluded from SimpleClass.__str__'s walk

    @property
    def boxes(self):
        """Deprecated alias for .data (reference results.py:440-444)."""
        LOGGER.warning("'Boxes.boxes' is deprecated, use 'Boxes.data'")
        return self.data


class Masks(SimpleClass, _TensorOps):
    """(n, H, W) instance masks (reference results.py:447-500)."""

    _deprecated = ("segments", "masks")  # excluded from __str__'s walk

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

    @property
    def xyn(self):
        """Normalized mask contours (reference results.py:484-490)."""
        h, w = np.asarray(self.orig_shape)[:2]
        return [c / np.array([w, h], np.float32) for c in self.xy]

    @property
    def segments(self):
        """Deprecated alias for .xyn (reference results.py:476-482)."""
        LOGGER.warning("'Masks.segments' is deprecated, use 'Masks.xyn'")
        return self.xyn

    @property
    def masks(self):
        """Deprecated alias for .data (reference results.py:500-504)."""
        LOGGER.warning("'Masks.masks' is deprecated, use 'Masks.data'")
        return self.data


class Keypoints(SimpleClass, _TensorOps):
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

    @property
    def xyn(self):
        """Normalized keypoint coords (reference results.py:545-551)."""
        h, w = np.asarray(self.orig_shape)[:2]
        return self.xy / np.array([w, h], np.float32)


class Probs(SimpleClass, _TensorOps):
    """Classification probabilities (reference results.py:541-605)."""

    def __init__(self, probs: np.ndarray):
        self.data = np.asarray(probs)

    def __len__(self):
        return len(self.data)

    @property
    def top1(self):
        return int(self.data.argmax())

    @property
    def top5(self):
        return self.data.argsort()[::-1][:5].tolist()

    @property
    def top1conf(self):
        return float(self.data.max())

    @property
    def top5conf(self):
        return self.data[self.top5].tolist()


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

    def update(self, boxes: Optional[np.ndarray] = None,
               masks: Optional[np.ndarray] = None,
               probs: Optional[np.ndarray] = None):
        """Refresh result tensors in place (reference results.py:114-121)."""
        if boxes is not None:
            self.boxes = Boxes(boxes, self.orig_shape)
        if masks is not None:
            self.masks = Masks(masks, self.orig_shape)
        if probs is not None:
            self.probs = Probs(probs)
        return self

    def new(self):
        """Empty Results over the same image (reference results.py:156-158)."""
        return Results(self.orig_img, self.path, self.names)

    @property
    def keys(self):
        """Names of the non-empty result attributes (reference :160-163)."""
        return [k for k in ("boxes", "masks", "probs", "keypoints")
                if getattr(self, k) is not None and len(getattr(self, k))]

    def cpu(self):
        return self

    def numpy(self):
        return self

    def cuda(self):
        return self

    def to(self, *args, **kwargs):
        return self

    def verbose(self) -> str:
        """Per-class summary string (reference results.py:248-263)."""
        if self.probs is not None:
            return ", ".join(f"{self.names.get(j, j)} "
                             f"{float(self.probs.data[j]):.2f}"
                             for j in self.probs.top5) + ", "
        if len(self) == 0:
            return "(no detections), "
        out = ""
        cls = self.boxes.cls.astype(int)
        for c in sorted(set(cls.tolist())):
            n = int((cls == c).sum())
            out += f"{n} {self.names.get(c, c)}{'s' * (n > 1)}, "
        return out

    def save_crop(self, save_dir, file_name="im.jpg"):
        """Save per-class crops (reference results.py:299-318)."""
        if self.probs is not None:
            LOGGER.warning("Classify task does not support save_crop")
            return
        from ..utils.plotting import save_one_box
        save_dir = Path(save_dir)
        stem = Path(file_name).stem
        for row in self.boxes.data:
            cname = str(self.names.get(int(row[-1]), int(row[-1])))
            save_one_box(row[:4], self.orig_img.copy(),
                         file=save_dir / cname / f"{stem}.jpg", BGR=True)

    def pandas(self):
        """Reference results.py:320-322: declared but not implemented."""
        LOGGER.warning("'Results.pandas' method is not yet implemented")

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

    def tojson(self, normalize: bool = False):
        """COCO-ish per-detection JSON incl. track id / segments / keypoints
        (reference results.py:324-352; the reference's col-4/5 indexing bug
        for tracked 7-col rows is fixed by indexing from the end)."""
        import json
        if self.probs is not None:
            LOGGER.warning("Classify task does not support tojson yet")
            return None
        h, w = (self.orig_shape if normalize else (1, 1))
        out = []
        for i, row in enumerate(self.boxes.data):
            c = int(row[-1])
            rec = {"name": str(self.names.get(c, c)), "class": c,
                   "confidence": float(row[-2]),
                   "box": {"x1": float(row[0]) / w, "y1": float(row[1]) / h,
                           "x2": float(row[2]) / w, "y2": float(row[3]) / h}}
            if self.boxes.is_track:
                rec["track_id"] = int(row[-3])
            if self.masks is not None and len(self.masks):
                xy = self.masks.xy[i]
                rec["segments"] = {"x": (xy[:, 0] / w).tolist(),
                                   "y": (xy[:, 1] / h).tolist()}
            if self.keypoints is not None and len(self.keypoints):
                kp = self.keypoints.data[i]
                rec["keypoints"] = {
                    "x": (kp[:, 0] / w).tolist(),
                    "y": (kp[:, 1] / h).tolist(),
                    "visible": (kp[:, 2].tolist() if kp.shape[-1] == 3
                                else [1.0] * len(kp))}
            out.append(rec)
        return json.dumps(out, indent=2)
