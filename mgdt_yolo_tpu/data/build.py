"""Batch assembly + background prefetch feeding padded NHWC device batches.

Replaces the reference's torch DataLoader stack (yolo/data/build.py:22-109):
a `workers`-wide thread pool runs the numpy augment pipeline with up to two
batches in flight, batches are padded to static (b, max_gt) target tensors
(so every train step hits the same XLA program), and a small queue keeps the
accelerator fed while the host prepares the next batch. Under a device mesh
the global batch is simply sharded along the batch axis by the caller
(parallel/mesh.py).
"""
from __future__ import annotations

import math
import queue
import random
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from ..utils import LOGGER
from .augment import letterbox, resize_long_side, train_transform


def collate(items, imgsz, max_gt: int, train: bool,
            mask_ratio: int = 4) -> Dict[str, np.ndarray]:
    """Stack items into one padded batch dict.

    Train items are already imgsz-square from the augment pipeline; val items
    are letterboxed here (scaleup=False matches reference val pipeline).
    `imgsz` is an int (square) or an (h, w) tuple (rect-val batch shape).
    Items carrying `masks` / `keypoints` (segment/pose tasks) get padded
    (b, max_gt, ...) planes at mask_ratio-downsampled resolution.
    """
    b = len(items)
    th, tw = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    # uint8 to the device (4x less transfer); normalization happens in-graph
    imgs = np.empty((b, th, tw, 3), np.uint8)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_bboxes = np.zeros((b, max_gt, 4), np.float32)
    mask_gt = np.zeros((b, max_gt), bool)
    has_masks = any("masks" in it for it in items)
    has_kpts = any("keypoints" in it for it in items)
    mh, mw = th // mask_ratio, tw // mask_ratio
    masks = np.zeros((b, max_gt, mh, mw), np.float32) if has_masks else None
    kpts = None
    metas = []
    for j, it in enumerate(items):
        img = it["img"]
        boxes = it["boxes"]
        if not train:
            img, ratio, pad = letterbox(img, (th, tw), scaleup=False)
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
                    masks[j, k] = cv2.resize(it["masks"][k], (mw, mh),
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


def collate_raw(items, imgsz: int, max_gt: int) -> Dict[str, np.ndarray]:
    """Device-augment ingest: top-left-anchored uint8 squares + (h, w) +
    UNaugmented pixel labels. All geometric/color augmentation then happens
    in-graph (ops/device_augment.py) — the host only decodes and copies."""
    b = len(items)
    imgs = np.full((b, imgsz, imgsz, 3), 114, np.uint8)
    hw = np.zeros((b, 2), np.float32)
    gt_labels = np.zeros((b, max_gt), np.int32)
    gt_bboxes = np.zeros((b, max_gt, 4), np.float32)
    mask_gt = np.zeros((b, max_gt), bool)
    for j, it in enumerate(items):
        img = it["img"]
        h, w = img.shape[:2]
        imgs[j, :h, :w] = img[..., ::-1]  # BGR->RGB
        hw[j] = (h, w)
        n = min(len(it["boxes"]), max_gt)
        if n:
            gt_bboxes[j, :n] = it["boxes"][:n]
            gt_labels[j, :n] = it["cls"][:n].astype(np.int32)
            mask_gt[j, :n] = gt_bboxes[j, :n].sum(-1) > 0
    return {"img": imgs, "img_hw": hw, "gt_labels": gt_labels,
            "gt_bboxes": gt_bboxes, "mask_gt": mask_gt}


class DataLoader:
    """Seeded, threaded batch loader with deterministic epoch ordering."""

    def __init__(self, dataset, batch_size: int, imgsz: int, train: bool = True,
                 hyp=None, max_gt: Optional[int] = None, seed: int = 0,
                 workers: int = 4, drop_last: Optional[bool] = None,
                 rect: bool = False, pad: float = 0.5, stride: int = 32,
                 device_augment: bool = False):
        self.dataset = dataset
        self.device_augment = device_augment and train
        self.batch_size = batch_size
        self.imgsz = imgsz
        self.train = train
        self.hyp = hyp
        self.seed = seed
        self.workers = max(1, workers)
        self.drop_last = train if drop_last is None else drop_last
        # static target padding: dataset max x the worst-case label merge —
        # mosaic9 stacks 9 images' labels and mixup adds one more on top of
        # a mosaic (reference augment.py Mosaic(n=9)/MixUp); undersizing
        # would silently truncate ground truth in collate's min(len, max_gt)
        base = max(1, dataset.max_labels())
        merge = 1
        if train:
            merge = 4
            if hyp is not None and getattr(hyp, "mosaic9", 0):
                merge = 9
            if hyp is not None and getattr(hyp, "mixup", 0):
                merge += 1
        self.max_gt = max_gt or int(math.ceil((base * merge) / 8) * 8)
        self.epoch = 0
        self._buf_lock = threading.Lock()
        self.rect = rect and not train
        self.batch_shapes = None
        if self.rect:
            self._set_rectangle(pad, stride)

    def _set_rectangle(self, pad: float, stride: int):
        """Aspect-sorted batch order + per-batch stride-aligned shapes
        (reference base.py:212-235; pad=0.5 for val, build.py:84). Batches
        of near-equal aspect share a shape, so XLA compiles one program per
        unique (h, w) bucket rather than per image."""
        s = np.array(self.dataset.shapes(), float)  # (n, 2) hw
        ar = s[:, 0] / s[:, 1]
        self._rect_order = np.argsort(ar).tolist()
        ar = ar[self._rect_order]
        nb = len(self)
        bs = self.batch_size
        shapes = []
        for i in range(nb):
            ari = ar[i * bs:(i + 1) * bs]
            mini, maxi = ari.min(), ari.max()
            shape = [1.0, 1.0]
            if maxi < 1:
                shape = [maxi, 1.0]
            elif mini > 1:
                shape = [1.0, 1.0 / mini]
            shapes.append(shape)
        self.batch_shapes = (np.ceil(
            np.array(shapes) * self.imgsz / stride + pad).astype(int) * stride)

    def __len__(self):
        n = len(self.dataset) / self.batch_size
        return int(n) if self.drop_last else math.ceil(n)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        if self.rect:
            return list(self._rect_order)
        idx = list(range(len(self.dataset)))
        if self.train:
            random.Random(self.seed + self.epoch).shuffle(idx)
        return idx

    def _make_item(self, i: int, rng: random.Random) -> Dict:
        item = self.dataset[i]
        if self.train:
            # reference load_image: long side -> imgsz before any augment
            # (base.py:146-160), so mosaic composes imgsz-scale tiles
            item = resize_long_side(item, self.imgsz, augment=True)
            if self.device_augment:
                return item  # raw: augmentation happens in-graph
            buf = self.dataset.buffer
            with self._buf_lock:
                picks = list(buf)
            # masks/keypoints ride the full geometric pipeline (instance-
            # aware mosaic/affine/flip warps in augment.train_transform)
            out = train_transform(item, self.imgsz, self.hyp, picks, rng,
                                  flip_idx=getattr(self.dataset, "flip_idx",
                                                   None))
            with self._buf_lock:
                buf.append(item)
                if len(buf) > 32:
                    buf.pop(0)
            return out
        return item

    def _native_eligible(self) -> bool:
        """True when the device-augment ingest can run through the native
        C++ loader (mgdt_yolo_tpu/native): real image files on disk, labels
        available without decoding, no RAM/disk cache interposed."""
        ds = self.dataset
        if not (self.device_augment and getattr(ds, "im_files", None)
                and getattr(ds, "labels", None) is not None
                and not getattr(ds, "cache", False)):
            return False
        from ..native import available
        return available()

    def _native_batch(self, chunk, pos0: int) -> Dict[str, np.ndarray]:
        """collate_raw-equivalent batch via the C++ thread-pool ingest.

        Decode + long-side resize + canvas paste happen in native code; this
        function only scales the (already-parsed) normalized labels to the
        pasted size. Images the native path declines (EXIF-rotated, CMYK,
        bmp/tiff/webp, corrupt) are redone through the Python item path.
        """
        from ..native import OK, load_batch
        ds = self.dataset
        paths = [ds.im_files[i] for i in chunk]
        imgs, hw, status = load_batch(paths, self.imgsz, 114, self.workers)
        b = len(chunk)
        gt_labels = np.zeros((b, self.max_gt), np.int32)
        gt_bboxes = np.zeros((b, self.max_gt, 4), np.float32)
        mask_gt = np.zeros((b, self.max_gt), bool)
        single_cls = getattr(ds, "single_cls", False)
        for j, i in enumerate(chunk):
            if status[j] != OK:  # cv2 fallback for this image only
                rng = random.Random(
                    (self.seed * 1000003 + self.epoch * 7919 + pos0 + j)
                    & 0x7FFFFFFF)
                it = self._make_item(i, rng)
                im = it["img"]
                h, w = im.shape[:2]
                imgs[j] = 114
                imgs[j, :h, :w] = im[..., ::-1]
                hw[j] = (h, w)
                boxes, cls = it["boxes"], it["cls"]
            else:
                lab = ds.labels[i]  # (n, 5): cls, cx, cy, w, h normalized
                dh, dw = hw[j]
                cx, cy = lab[:, 1] * dw, lab[:, 2] * dh
                bw, bh = lab[:, 3] * dw, lab[:, 4] * dh
                boxes = np.stack([cx - bw / 2, cy - bh / 2,
                                  cx + bw / 2, cy + bh / 2], -1)
                cls = np.zeros(len(lab), np.float32) if single_cls \
                    else lab[:, 0]
            n = min(len(boxes), self.max_gt)
            if n:
                gt_bboxes[j, :n] = boxes[:n]
                gt_labels[j, :n] = cls[:n].astype(np.int32)
                mask_gt[j, :n] = gt_bboxes[j, :n].sum(-1) > 0
        return {"img": imgs, "img_hw": hw, "gt_labels": gt_labels,
                "gt_bboxes": gt_bboxes, "mask_gt": mask_gt}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._indices()
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=4)
        stop = threading.Event()

        def q_put(item) -> bool:
            """Bounded put: a consumer that abandons the iterator mid-epoch
            (early stop, exception, ctrl-C) sets `stop` from the generator's
            finally — without it the producer would block in q.put on the
            full queue forever, pinning workers and ~queue-depth prepared
            batches for the process lifetime."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        if self._native_eligible():
            # whole-batch native ingest; two batches in flight
            pool = ThreadPoolExecutor(max_workers=2,
                                      thread_name_prefix="mgdt-native")

            def nat(b: int) -> Dict:
                chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
                return self._native_batch(chunk, b * self.batch_size)

            def producer_native():
                try:
                    pending: deque = deque()
                    nxt = 0
                    while nxt < min(2, nb):
                        pending.append(pool.submit(nat, nxt))
                        nxt += 1
                    while pending:
                        batch = pending.popleft().result()
                        if nxt < nb:
                            pending.append(pool.submit(nat, nxt))
                            nxt += 1
                        if not q_put(batch):
                            return
                    q_put(None)
                except BaseException as e:
                    q_put(e)

            t = threading.Thread(target=producer_native, daemon=True)
            t.start()
            try:
                while True:
                    batch = q.get()
                    if batch is None:
                        break
                    if isinstance(batch, BaseException):
                        raise batch
                    yield batch
            finally:
                stop.set()
                pool.shutdown(wait=False, cancel_futures=True)
            return
        pool = ThreadPoolExecutor(max_workers=self.workers,
                                  thread_name_prefix="mgdt-data")

        def make(i: int, pos: int) -> Dict:
            # per-item seed: deterministic regardless of worker scheduling
            rng = random.Random(
                (self.seed * 1000003 + self.epoch * 7919 + pos) & 0x7FFFFFFF)
            return self._make_item(i, rng)

        def submit_batch(b: int):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            return [pool.submit(make, i, b * self.batch_size + j)
                    for j, i in enumerate(chunk)]

        def producer():
            try:
                pending: deque = deque()
                nxt = 0
                while nxt < min(2, nb):  # keep two batches in flight
                    pending.append(submit_batch(nxt))
                    nxt += 1
                done = 0
                while pending:
                    items = [f.result() for f in pending.popleft()]
                    if nxt < nb:
                        pending.append(submit_batch(nxt))
                        nxt += 1
                    shape = (tuple(self.batch_shapes[done])
                             if self.batch_shapes is not None else self.imgsz)
                    if self.device_augment:
                        ok = q_put(collate_raw(items, self.imgsz, self.max_gt))
                    else:
                        ok = q_put(collate(items, shape, self.max_gt,
                                           self.train))
                    if not ok:
                        return
                    done += 1
                q_put(None)
            except BaseException as e:  # surface worker errors to the consumer
                q_put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)


def build_dataloader(dataset, batch_size: int, imgsz: int, train: bool = True,
                     hyp=None, seed: int = 0, workers: int = 4,
                     rect: bool = False, stride: int = 32,
                     device_augment: bool = False) -> DataLoader:
    return DataLoader(dataset, batch_size, imgsz, train=train, hyp=hyp,
                      seed=seed, workers=workers, rect=rect, stride=stride,
                      device_augment=device_augment)
