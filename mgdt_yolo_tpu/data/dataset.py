"""Datasets: YOLO-format directory scanning + deterministic synthetic data.

Re-designs the reference data layer (yolo/data/base.py, dataset.py) without
torch DataLoader: datasets are plain indexable objects producing numpy items;
batching/prefetch lives in build.py. Label caching uses .npy sidecars keyed
by file mtimes (reference dataset.py:41-142's cache, simplified).

SyntheticDetectionDataset generates seeded images with colored rectangles —
the offline stand-in for COCO128 smoke runs (this environment has no network;
reference integration tests relied on auto-downloading COCO128).
"""
from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

from ..utils import LOGGER

from .utils import IMG_FORMATS  # canonical set lives in data/utils.py


def img2label_path(img_path: str) -> str:
    """images/xxx.jpg -> labels/xxx.txt (reference yolo/data/utils.py:14-18)."""
    p = str(img_path)
    if "/images/" in p:
        return p.rsplit("/images/", 1)[0] + "/labels/" + p.rsplit("/images/", 1)[1].rsplit(".", 1)[0] + ".txt"
    return str(Path(img_path).with_suffix(".txt"))


@dataclass
class DetItem:
    img: np.ndarray          # HxWx3 uint8 BGR
    boxes: np.ndarray        # (n, 4) xyxy pixels
    cls: np.ndarray          # (n,) float32
    path: str = ""
    ori_shape: Tuple[int, int] = (0, 0)

    def asdict(self) -> Dict:
        return {"img": self.img, "boxes": self.boxes, "cls": self.cls,
                "path": self.path, "ori_shape": self.ori_shape}


class YOLODataset:
    """Scans an images dir + YOLO txt labels (class cx cy w h, normalized).

    The scan is verified and cached: every image/label pair goes through
    verify_image_label (EXIF size, truncated-JPEG restore, label sanity) on
    a thread pool, corrupt pairs are dropped with a warning, and the result
    is stored in a hash-validated sidecar cache so later runs skip the scan
    (reference yolo/data/dataset.py:41-142).
    """

    def __init__(self, img_dir: str, imgsz: int = 640, augment: bool = False,
                 hyp=None, fraction: float = 1.0, single_cls: bool = False,
                 cache: bool | str = False, nc: Optional[int] = None,
                 workers: int = 8):
        from .utils import scan_labels
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        self.single_cls = single_cls
        self.cache = cache  # 'ram' keeps decoded images resident; 'disk' .npy
        self._ram: Dict[int, np.ndarray] = {}
        root = Path(img_dir)
        files = sorted(str(p) for p in root.rglob("*") if p.suffix[1:].lower() in IMG_FORMATS)
        if fraction < 1.0:
            files = files[:max(1, int(len(files) * fraction))]
        if not files:
            raise FileNotFoundError(f"no images found under {img_dir}")
        label_files = [img2label_path(f) for f in files]
        cache_path = Path(label_files[0]).parent.with_suffix(".cache") \
            if label_files else root.with_suffix(".cache")
        records = scan_labels(files, label_files, cache_path, num_cls=nc,
                              workers=workers)
        if not records:
            raise FileNotFoundError(f"no usable images under {img_dir}")
        self.im_files = [r["im_file"] for r in records]
        self.labels = [np.concatenate([r["cls"][:, None], r["xywh"]], 1)
                       .astype(np.float32) if len(r["cls"])
                       else np.zeros((0, 5), np.float32) for r in records]
        self._shapes = [tuple(r["shape"]) for r in records]
        LOGGER.info(f"dataset: {len(self.im_files)} images from {img_dir}")
        self.buffer: List[Dict] = []

    def __len__(self):
        return len(self.im_files)

    def max_labels(self) -> int:
        return max((len(l) for l in self.labels), default=0)

    def shapes(self) -> List[Tuple[int, int]]:
        """(h, w) per image without decoding pixels (PIL header read) —
        feeds rect-batch shape planning (reference base.py:212-235)."""
        if not hasattr(self, "_shapes"):
            from PIL import Image
            out = []
            for f in self.im_files:
                with Image.open(f) as im:
                    w, h = im.size
                out.append((h, w))
            self._shapes = out
        return self._shapes

    def __getitem__(self, i: int) -> Dict:
        if self.cache in (True, "ram") and i in self._ram:
            img = self._ram[i]
        elif self.cache == "disk":
            # decoded-image .npy sidecar (reference base.py:195-201): decode
            # once, plain np.load after (full read, NOT mmap — downstream
            # letterbox/HSV want a writable contiguous array anyway); trades
            # disk for JPEG-decode CPU
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if npy.is_file():
                img = np.load(str(npy))
            else:
                img = cv2.imread(self.im_files[i])
                try:
                    np.save(str(npy), img)
                except OSError:
                    pass
        else:
            img = cv2.imread(self.im_files[i])
            if self.cache in (True, "ram"):
                self._ram[i] = img
        h, w = img.shape[:2]
        lab = self.labels[i]
        cls = lab[:, 0].copy()
        if self.single_cls:
            cls[:] = 0
        xywh = lab[:, 1:5]
        boxes = np.empty_like(xywh)
        boxes[:, 0] = (xywh[:, 0] - xywh[:, 2] / 2) * w
        boxes[:, 1] = (xywh[:, 1] - xywh[:, 3] / 2) * h
        boxes[:, 2] = (xywh[:, 0] + xywh[:, 2] / 2) * w
        boxes[:, 3] = (xywh[:, 1] + xywh[:, 3] / 2) * h
        return DetItem(img, boxes.astype(np.float32), cls, self.im_files[i],
                       (h, w)).asdict()


class SyntheticDetectionDataset:
    """Deterministic detection data: colored rectangles on textured noise.

    Class 0 = red-ish boxes, class 1 = blue-ish, etc. Fully seeded so the
    overfit sanity test (SURVEY.md §7 step 5) is reproducible offline.
    """

    def __init__(self, n: int = 64, imgsz: int = 320, nc: int = 2,
                 max_objects: int = 6, seed: int = 0, augment: bool = False,
                 hyp=None, task: str = "detect"):
        self.n = n
        self.imgsz = imgsz
        self.nc = nc
        self.max_objects = max_objects
        self.seed = seed
        self.augment = augment
        self.hyp = hyp
        self.task = task  # detect | segment | pose: adds masks / keypoints
        self.buffer: List[Dict] = []
        self.im_files = [f"synthetic_{i}.jpg" for i in range(n)]
        # per-class base colors (BGR)
        base = [(40, 40, 200), (200, 60, 40), (40, 200, 60), (200, 200, 40),
                (200, 40, 200), (40, 200, 200)]
        self.colors = [base[i % len(base)] for i in range(nc)]

    def __len__(self):
        return self.n

    def max_labels(self) -> int:
        return self.max_objects

    def shapes(self):
        return [(self.imgsz, self.imgsz)] * self.n

    def __getitem__(self, i: int) -> Dict:
        rng = np.random.default_rng(self.seed * 100003 + i)
        s = self.imgsz
        img = (rng.uniform(90, 150, (s, s, 3))).astype(np.uint8)
        n_obj = int(rng.integers(1, self.max_objects + 1))
        boxes, cls = [], []
        for _ in range(n_obj):
            w = float(rng.uniform(0.12, 0.4) * s)
            h = float(rng.uniform(0.12, 0.4) * s)
            x1 = float(rng.uniform(0, s - w))
            y1 = float(rng.uniform(0, s - h))
            c = int(rng.integers(0, self.nc))
            color = np.array(self.colors[c], float) + rng.uniform(-25, 25, 3)
            img[int(y1):int(y1 + h), int(x1):int(x1 + w)] = np.clip(color, 0, 255)
            boxes.append([x1, y1, x1 + w, y1 + h])
            cls.append(c)
        item = DetItem(img, np.asarray(boxes, np.float32),
                       np.asarray(cls, np.float32), self.im_files[i],
                       (s, s)).asdict()
        if self.task == "segment":
            masks = np.zeros((n_obj, s, s), np.float32)
            for j, (x1, y1, x2, y2) in enumerate(item["boxes"]):
                masks[j, int(y1):int(y2), int(x1):int(x2)] = 1.0
            item["masks"] = masks
        elif self.task == "pose":
            # 17-kpt layout (COCO shape): 3 visible anchors, rest invisible
            k = np.zeros((n_obj, 17, 3), np.float32)
            for j, (x1, y1, x2, y2) in enumerate(item["boxes"]):
                k[j, 0] = [x1, y1, 2]
                k[j, 1] = [(x1 + x2) / 2, (y1 + y2) / 2, 2]
                k[j, 2] = [x2, y2, 2]
            item["keypoints"] = k
        return item
