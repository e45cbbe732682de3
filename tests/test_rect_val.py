"""Rect/bucketed validation batching (reference base.py:212-235, pad=0.5
build.py:84): aspect-sorted order, stride-aligned per-batch shapes, and
scale_boxes round-trip correctness under non-square letterboxing."""
import cv2
import numpy as np
import pytest

from mgdt_yolo_tpu.data.build import DataLoader
from mgdt_yolo_tpu.data.dataset import YOLODataset
from mgdt_yolo_tpu.ops.boxes import scale_boxes


@pytest.fixture(scope="module")
def aspect_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("rectds")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    # varied aspect ratios: tall, wide, square
    dims = [(100, 200), (120, 240), (200, 100), (240, 120),
            (160, 160), (150, 150), (90, 300), (300, 90)]
    for i, (h, w) in enumerate(dims):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"{i}.jpg"), img)
        (root / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.5 0.5\n")
    return str(root / "images"), dims


class TestRectVal:
    def test_batch_shapes_reference_formula(self, aspect_dataset):
        path, dims = aspect_dataset
        ds = YOLODataset(path, imgsz=64)
        dl = DataLoader(ds, 4, 64, train=False, rect=True, pad=0.5, stride=32)
        assert dl.batch_shapes is not None and len(dl.batch_shapes) == 2
        # reference formula: ceil(shape * imgsz/stride + pad) * stride
        ar = np.array([h / w for h, w in dims])
        order = np.argsort(ar)
        ar_sorted = ar[order]
        for bi in range(2):
            ari = ar_sorted[bi * 4:(bi + 1) * 4]
            mini, maxi = ari.min(), ari.max()
            shape = [1.0, 1.0]
            if maxi < 1:
                shape = [maxi, 1.0]
            elif mini > 1:
                shape = [1.0, 1.0 / mini]
            want = (np.ceil(np.array(shape) * 64 / 32 + 0.5) * 32).astype(int)
            np.testing.assert_array_equal(dl.batch_shapes[bi], want)
        # every shape stride-aligned
        assert (dl.batch_shapes % 32 == 0).all()

    def test_rect_batches_and_roundtrip(self, aspect_dataset):
        path, dims = aspect_dataset
        ds = YOLODataset(path, imgsz=64)
        dl = DataLoader(ds, 4, 64, train=False, rect=True, pad=0.5, stride=32)
        batches = list(dl)
        assert len(batches) == 2
        for bi, batch in enumerate(batches):
            h, w = batch["img"].shape[1:3]
            np.testing.assert_array_equal([h, w], dl.batch_shapes[bi])
            # letterboxed gt boxes scale back to the original image space
            for j, m in enumerate(batch["metas"]):
                gt = batch["gt_bboxes"][j][batch["mask_gt"][j]]
                if not len(gt):
                    continue
                back = scale_boxes((h, w), gt.copy(), m["ori_shape"],
                                   m["ratio_pad"])
                oh, ow = m["ori_shape"]
                want = np.array([ow * 0.25, oh * 0.25, ow * 0.75, oh * 0.75])
                np.testing.assert_allclose(back[0], want, atol=1.0)

    def test_non_rect_unchanged(self, aspect_dataset):
        path, _ = aspect_dataset
        ds = YOLODataset(path, imgsz=64)
        dl = DataLoader(ds, 4, 64, train=False, rect=False)
        batch = next(iter(dl))
        assert batch["img"].shape[1:3] == (64, 64)
