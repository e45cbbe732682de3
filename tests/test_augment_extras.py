"""mosaic9 / CopyPaste / Albumentations gate / instance-aware seg-pose
augmentation propagation (reference augment.py:190-237, 604-641, 644-688,
289-476)."""
import random

import cv2
import numpy as np
import pytest

from mgdt_yolo_tpu.cfg import get_cfg
from mgdt_yolo_tpu.data.augment import (Albumentations, copy_paste, mosaic4,
                                        mosaic9, random_perspective,
                                        resize_long_side, train_transform)
from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset


def _items(n, imgsz, task="detect", seed=0):
    ds = SyntheticDetectionDataset(n=n, imgsz=imgsz, nc=2, seed=seed, task=task)
    return [ds[i] for i in range(n)]


class TestMosaic9:
    def test_canvas_and_labels(self):
        items = _items(9, 64)
        img, boxes, cls, extras = mosaic9(items, 64, random.Random(0))
        assert img.shape == (128, 128, 3)
        assert len(boxes) == len(cls)
        assert (boxes[:, [0, 2]] <= 128).all() and (boxes >= 0).all()

    def test_masks_follow(self):
        items = _items(9, 64, task="segment")
        img, boxes, cls, extras = mosaic9(items, 64, random.Random(1))
        assert extras["masks"].shape[0] == len(boxes)
        assert extras["masks"].shape[1:] == (128, 128)


class TestCopyPaste:
    def test_pastes_flipped_instances(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        # one instance on the far left; its lr-flip lands on the far right
        boxes = np.array([[5, 40, 25, 60]], np.float32)
        cls = np.array([0.0])
        masks = np.zeros((1, 96, 96), np.float32)
        masks[0, 40:60, 5:25] = 1.0
        out_img, out_boxes, out_cls, out_masks = copy_paste(
            img, boxes, cls, masks, p=1.0, rng=random.Random(0))
        assert len(out_boxes) == 2 and len(out_masks) == 2
        # flipped box occupies mirrored x-range
        np.testing.assert_allclose(out_boxes[1], [96 - 25, 40, 96 - 5, 60])
        # pasted pixels actually came from the flipped image
        np.testing.assert_array_equal(out_img[50, 80], img[50, 96 - 1 - 80])

    def test_overlap_blocks_paste(self):
        img = np.zeros((96, 96, 3), np.uint8)
        # centered instance: its flip overlaps itself with IoA > 0.3
        boxes = np.array([[30, 30, 66, 66]], np.float32)
        masks = np.ones((1, 96, 96), np.float32)
        _, out_boxes, _, _ = copy_paste(img, boxes, np.zeros(1), masks,
                                        p=1.0, rng=random.Random(0))
        assert len(out_boxes) == 1  # nothing pasted


class _ScriptedRng:
    """random.Random stand-in with a scripted random() sequence, for
    force-firing the p=0.01 Albumentations draws deterministically."""

    def __init__(self, seq):
        self.seq = list(seq)
        self._fallback = random.Random(0)

    def random(self):
        return self.seq.pop(0) if self.seq else self._fallback.random()

    def choice(self, xs):
        return xs[0]

    def uniform(self, a, b):
        return (a + b) / 2


class TestAlbumentationsNative:
    """The four reference transforms (Blur/MedianBlur/ToGray/CLAHE at
    p=0.01, reference augment.py:657-664) implemented natively with cv2 —
    the external package is only an optional override."""

    def _img(self):
        rng = np.random.default_rng(7)
        return rng.integers(0, 255, (32, 32, 3), np.uint8)

    def test_passthrough_when_no_draw_fires(self):
        a = Albumentations(p=1.0)
        img = self._img()
        boxes = np.array([[4, 4, 20, 20]], np.float32)
        # scripted: gate passes, all four p=0.01 draws miss
        out_img, out_boxes, _ = a(img, boxes, np.zeros(1),
                                  _ScriptedRng([0.0, 0.5, 0.5, 0.5, 0.5]))
        np.testing.assert_array_equal(out_img, img)
        np.testing.assert_array_equal(out_boxes, boxes)

    def test_blur_fires_boxes_untouched(self):
        a = Albumentations(p=1.0)
        img = self._img()
        boxes = np.array([[4, 4, 20, 20]], np.float32)
        out_img, out_boxes, _ = a(img, boxes, np.zeros(1),
                                  _ScriptedRng([0.0, 0.001, 0.5, 0.5, 0.5]))
        assert out_img.shape == img.shape and out_img.dtype == np.uint8
        assert not np.array_equal(out_img, img)
        np.testing.assert_array_equal(out_boxes, boxes)  # color-only op
        # box filter k=3 (choice -> first) == cv2.blur reference
        np.testing.assert_array_equal(out_img, cv2.blur(img, (3, 3)))

    def test_togray_equal_channels(self):
        a = Albumentations(p=1.0)
        out_img, _, _ = a(self._img(), np.zeros((1, 4), np.float32),
                          np.zeros(1), _ScriptedRng([0.0, 0.5, 0.5, 0.001, 0.5]))
        assert (out_img[..., 0] == out_img[..., 1]).all()
        assert (out_img[..., 1] == out_img[..., 2]).all()

    def test_clahe_changes_contrast(self):
        a = Albumentations(p=1.0)
        img = self._img() // 4 + 96  # low-contrast image
        out_img, _, _ = a(img, np.zeros((1, 4), np.float32), np.zeros(1),
                          _ScriptedRng([0.0, 0.5, 0.5, 0.5, 0.001]))
        assert out_img.std() > img.std()  # CLAHE stretches local contrast

    def test_deterministic_under_seeded_rng(self):
        a = Albumentations(p=1.0)
        img = self._img()
        boxes = np.array([[4, 4, 20, 20]], np.float32)
        fired = None
        for seed in range(400):  # find a seed where some 1% draw fires
            out, _, _ = a(img.copy(), boxes, np.zeros(1), random.Random(seed))
            if not np.array_equal(out, img):
                fired = seed
                break
        assert fired is not None, "no seed in 400 fired a 1% draw"
        again, _, _ = a(img.copy(), boxes, np.zeros(1), random.Random(fired))
        np.testing.assert_array_equal(out, again)


class TestSegPoseAugmentPropagation:
    def test_masks_track_boxes_through_pipeline(self):
        hyp = get_cfg(overrides={"mosaic": 1.0, "fliplr": 1.0, "degrees": 10.0,
                                 "scale": 0.3, "translate": 0.1})
        items = _items(8, 96, task="segment", seed=2)
        buf = items[:6]
        out = train_transform(resize_long_side(items[6], 96), 96, hyp, buf,
                              random.Random(3))
        assert out["img"].shape == (96, 96, 3)
        assert len(out["masks"]) == len(out["boxes"])
        # each surviving instance's mask support must sit inside (a slightly
        # padded version of) its warped box
        for m, b in zip(out["masks"], out["boxes"]):
            ys, xs = np.nonzero(m > 0.5)
            if not len(xs):
                continue
            x1, y1, x2, y2 = b
            assert xs.min() >= x1 - 3 and xs.max() <= x2 + 3
            assert ys.min() >= y1 - 3 and ys.max() <= y2 + 3

    def test_keypoints_track_boxes_through_pipeline(self):
        hyp = get_cfg(overrides={"mosaic": 1.0, "fliplr": 0.0, "flipud": 0.0,
                                 "degrees": 0.0, "scale": 0.2})
        items = _items(8, 96, task="pose", seed=5)
        buf = items[:6]
        out = train_transform(resize_long_side(items[6], 96), 96, hyp, buf,
                              random.Random(7))
        assert "keypoints" in out and len(out["keypoints"]) == len(out["boxes"])
        k = out["keypoints"]
        vis = k[..., 2] > 0
        # visible keypoints stay inside the canvas
        assert (k[..., 0][vis] >= 0).all() and (k[..., 0][vis] < 96).all()
        assert (k[..., 1][vis] >= 0).all() and (k[..., 1][vis] < 96).all()
        # synthetic kpt 1 is the box center: must stay near the warped box
        # center for every surviving instance with that kpt visible
        for inst_k, b in zip(k, out["boxes"]):
            if inst_k[1, 2] > 0:
                cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
                # box was clipped to the canvas, kpt wasn't: allow slack
                assert abs(inst_k[1, 0] - cx) < 20
                assert abs(inst_k[1, 1] - cy) < 20

    def test_flip_idx_swaps_keypoints(self):
        hyp = get_cfg(overrides={"mosaic": 0.0, "fliplr": 1.0, "degrees": 0.0,
                                 "scale": 0.0, "translate": 0.0})
        items = _items(2, 96, task="pose", seed=1)
        flip_idx = list(range(17))
        flip_idx[0], flip_idx[2] = 2, 0  # swap kpt0 <-> kpt2 on lr flip
        out = train_transform(items[0], 96, hyp, [], random.Random(2),
                              flip_idx=flip_idx)
        base = train_transform(items[0], 96, hyp, [], random.Random(2))
        np.testing.assert_allclose(out["keypoints"][:, 0], base["keypoints"][:, 2])
        np.testing.assert_allclose(out["keypoints"][:, 2], base["keypoints"][:, 0])
