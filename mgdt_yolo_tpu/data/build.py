"""Batch assembly + background prefetch feeding padded NHWC device batches.

Replaces the reference's torch DataLoader stack (yolo/data/build.py:22-109):
a thread pool runs the numpy augment pipeline, batches are padded to static
(b, max_gt) target tensors (so every train step hits the same XLA program),
and a small queue keeps the accelerator fed while the host prepares the next
batch. Under a device mesh the global batch is simply sharded along the
batch axis by the caller (parallel/mesh.py).
"""
from __future__ import annotations

import math
import queue
import random
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from ..utils import LOGGER
from .augment import letterbox, train_transform


def collate(items, imgsz: int, max_gt: int, train: bool,
            mask_ratio: int = 4) -> Dict[str, np.ndarray]:
    """Stack items into one padded batch dict.

    Train items are already imgsz-square from the augment pipeline; val items
    are letterboxed here (scaleup=False matches reference val pipeline).
    Items carrying `masks` / `keypoints` (segment/pose tasks) get padded
    (b, max_gt, ...) planes at mask_ratio-downsampled resolution.
    """
    b = len(items)
    # uint8 to the device (4x less transfer); normalization happens in-graph
    imgs = np.empty((b, imgsz, imgsz, 3), np.uint8)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_bboxes = np.zeros((b, max_gt, 4), np.float32)
    mask_gt = np.zeros((b, max_gt), bool)
    has_masks = any("masks" in it for it in items)
    has_kpts = any("keypoints" in it for it in items)
    mh = imgsz // mask_ratio
    masks = np.zeros((b, max_gt, mh, mh), np.float32) if has_masks else None
    kpts = None
    metas = []
    for j, it in enumerate(items):
        img = it["img"]
        boxes = it["boxes"]
        if not train:
            img, ratio, pad = letterbox(img, (imgsz, imgsz), scaleup=False)
            if len(boxes):
                boxes = boxes.copy()
                boxes[:, [0, 2]] = boxes[:, [0, 2]] * ratio[0] + pad[0]
                boxes[:, [1, 3]] = boxes[:, [1, 3]] * ratio[1] + pad[1]
            metas.append({"ori_shape": it.get("ori_shape"), "ratio_pad": (ratio, pad),
                          "path": it.get("path", "")})
        imgs[j] = img[..., ::-1]  # BGR->RGB; stays uint8
        n = min(len(boxes), max_gt)
        if n:
            gt_bboxes[j, :n] = boxes[:n]
            gt_labels[j, :n] = it["cls"][:n].astype(np.int32)
            mask_gt[j, :n] = gt_bboxes[j, :n].sum(-1) > 0
            if has_masks and "masks" in it:
                import cv2
                for k in range(n):
                    masks[j, k] = cv2.resize(it["masks"][k], (mh, mh),
                                             interpolation=cv2.INTER_NEAREST)
            if has_kpts and "keypoints" in it:
                kp = it["keypoints"]
                if kpts is None:
                    kpts = np.zeros((b, max_gt, kp.shape[1], kp.shape[2]),
                                    np.float32)
                kpts[j, :n] = kp[:n]
    out = {"img": imgs, "gt_labels": gt_labels, "gt_bboxes": gt_bboxes,
           "mask_gt": mask_gt}
    if has_masks:
        out["masks"] = masks
    if has_kpts and kpts is not None:
        out["keypoints"] = kpts
    if not train:
        out["metas"] = metas
    return out


class DataLoader:
    """Seeded, threaded batch loader with deterministic epoch ordering."""

    def __init__(self, dataset, batch_size: int, imgsz: int, train: bool = True,
                 hyp=None, max_gt: Optional[int] = None, seed: int = 0,
                 workers: int = 4, drop_last: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.imgsz = imgsz
        self.train = train
        self.hyp = hyp
        self.seed = seed
        self.workers = max(1, workers)
        self.drop_last = train if drop_last is None else drop_last
        # static target padding: dataset max, x4 headroom for mosaic merges
        base = max(1, dataset.max_labels())
        self.max_gt = max_gt or int(math.ceil((base * (4 if train else 1)) / 8) * 8)
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) / self.batch_size
        return int(n) if self.drop_last else math.ceil(n)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        idx = list(range(len(self.dataset)))
        if self.train:
            random.Random(self.seed + self.epoch).shuffle(idx)
        return idx

    def _make_item(self, i: int, rng: random.Random) -> Dict:
        item = self.dataset[i]
        if self.train and "masks" not in item and "keypoints" not in item:
            buf = self.dataset.buffer
            out = train_transform(item, self.imgsz, self.hyp, buf, rng)
            buf.append(item)
            if len(buf) > 32:
                buf.pop(0)
            return out
        if self.train:
            # segment/pose: geometric-augment propagation for masks/kpts lands
            # with the full instance-aware pipeline; train on letterboxed items
            from .augment import letterbox
            img, r, (dw, dh) = letterbox(item["img"], (self.imgsz, self.imgsz))
            boxes = item["boxes"].copy()
            if len(boxes):
                boxes[:, [0, 2]] = boxes[:, [0, 2]] * r[0] + dw
                boxes[:, [1, 3]] = boxes[:, [1, 3]] * r[1] + dh
            out = dict(item, img=img, boxes=boxes)
            if "keypoints" in item:
                kp = item["keypoints"].copy()
                kp[..., 0] = kp[..., 0] * r[0] + dw
                kp[..., 1] = kp[..., 1] * r[1] + dh
                out["keypoints"] = kp
            return out
        return item

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=4)

        def producer():
            rng = random.Random(self.seed * 7919 + self.epoch)
            for b in range(nb):
                chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                items = [self._make_item(i, rng) for i in chunk]
                q.put(collate(items, self.imgsz, self.max_gt, self.train))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch


def build_dataloader(dataset, batch_size: int, imgsz: int, train: bool = True,
                     hyp=None, seed: int = 0, workers: int = 4) -> DataLoader:
    return DataLoader(dataset, batch_size, imgsz, train=train, hyp=hyp,
                      seed=seed, workers=workers)
