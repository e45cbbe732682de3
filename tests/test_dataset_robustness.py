"""Dataset robustness: verified scan drops corrupt images, the label cache
is hash-validated (stale caches rebuilt), disk image cache round-trips
(reference yolo/data/dataset.py:41-142, base.py:172-210, utils.py:63-134)."""
import numpy as np
import pytest

import cv2

from mgdt_yolo_tpu.data.dataset import YOLODataset
from mgdt_yolo_tpu.data.utils import get_hash, verify_image_label


def _make_ds(root, n=4, size=48):
    (root / "images").mkdir(exist_ok=True)
    (root / "labels").mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        cv2.imwrite(str(root / "images" / f"{i}.jpg"),
                    rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
        (root / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    return root


class TestScanRobustness:
    def test_corrupt_image_dropped_not_fatal(self, tmp_path):
        _make_ds(tmp_path)
        # truncate one JPEG beyond repair and write one non-image file
        (tmp_path / "images" / "1.jpg").write_bytes(b"\xff\xd8garbage")
        ds = YOLODataset(str(tmp_path / "images"))
        assert len(ds) == 3  # corrupt image dropped, scan survived
        item = ds[0]
        assert item["img"] is not None and len(item["boxes"]) == 1

    def test_truncated_jpeg_restored(self, tmp_path):
        _make_ds(tmp_path, n=2)
        p = tmp_path / "images" / "0.jpg"
        p.write_bytes(p.read_bytes()[:-2])  # chop the FFD9 trailer
        rec, *_counts, msg = verify_image_label(
            str(p), str(tmp_path / "labels" / "0.txt"))
        assert rec is not None and "restored" in msg
        assert p.read_bytes()[-2:] == b"\xff\xd9"  # rewritten healthy

    def test_cache_hit_and_stale_invalidation(self, tmp_path):
        _make_ds(tmp_path)
        ds1 = YOLODataset(str(tmp_path / "images"))
        cache = tmp_path / "labels.cache"
        assert cache.is_file()
        mtime = cache.stat().st_mtime_ns
        # second construction: cache hit, file untouched
        ds2 = YOLODataset(str(tmp_path / "images"))
        assert cache.stat().st_mtime_ns == mtime
        assert ds2.im_files == ds1.im_files
        # changing a label file invalidates the hash -> rebuild
        (tmp_path / "labels" / "0.txt").write_text(
            "0 0.5 0.5 0.4 0.4\n1 0.2 0.2 0.1 0.1\n")
        ds3 = YOLODataset(str(tmp_path / "images"))
        assert cache.stat().st_mtime_ns != mtime
        assert len(ds3.labels[0]) == 2

    def test_bad_labels_rejected(self, tmp_path):
        _make_ds(tmp_path, n=2)
        (tmp_path / "labels" / "0.txt").write_text("0 1.5 0.5 0.4 0.4\n")  # >1
        ds = YOLODataset(str(tmp_path / "images"))
        assert len(ds) == 1  # out-of-bounds label pair dropped

    def test_duplicate_rows_deduped(self, tmp_path):
        _make_ds(tmp_path, n=1)
        (tmp_path / "labels" / "0.txt").write_text(
            "0 0.5 0.5 0.4 0.4\n0 0.5 0.5 0.4 0.4\n")
        ds = YOLODataset(str(tmp_path / "images"))
        assert len(ds.labels[0]) == 1

    def test_disk_cache_roundtrip(self, tmp_path):
        _make_ds(tmp_path, n=2)
        ds = YOLODataset(str(tmp_path / "images"), cache="disk")
        a = ds[0]["img"]
        assert (tmp_path / "images" / "0.npy").is_file()
        b = ds[0]["img"]  # second read: .npy path
        np.testing.assert_array_equal(a, b)

    def test_get_hash_changes_with_content(self, tmp_path):
        p = tmp_path / "f.txt"
        p.write_text("abc")
        h1 = get_hash([str(p)])
        p.write_text("abcdef")
        assert get_hash([str(p)]) != h1
