"""Native C++ host loader: decode/resize parity with the cv2 path, error
fallbacks, and DataLoader integration (device-augment ingest equivalence)."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mgdt_yolo_tpu import native
from mgdt_yolo_tpu.data.augment import resize_long_side

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader did not build")


def _write_dataset(tmp_path, n=6, hw=(480, 640)):
    """YOLO-layout dir: images/ + labels/ with one box per image."""
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        h, w = hw if i % 2 == 0 else (hw[1], hw[0])
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        ext = "jpg" if i % 3 else "png"
        cv2.imwrite(str(tmp_path / "images" / f"im{i}.{ext}"), img)
        (tmp_path / "labels" / f"im{i}.txt").write_text(
            f"{i % 2} 0.5 0.5 0.25 0.4\n")
    return tmp_path / "images"


def test_load_one_parity_jpeg(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (300, 500, 3), np.uint8)
    p = str(tmp_path / "x.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 92])
    imgs, hw, st = native.load_batch([p], 640, 114, 1)
    assert st[0] == native.OK
    ref = resize_long_side({"img": cv2.imread(p),
                            "boxes": np.zeros((0, 4), np.float32),
                            "cls": np.zeros((0,), np.float32)}, 640)
    h, w = ref["img"].shape[:2]
    assert (hw[0] == (h, w)).all()
    canvas = np.full((640, 640, 3), 114, np.uint8)
    canvas[:h, :w] = ref["img"][..., ::-1]
    diff = np.abs(imgs[0].astype(int) - canvas.astype(int))
    # same libjpeg decode; bilinear resize differs by <=1 LSB rounding
    assert diff.max() <= 1
    assert diff.mean() < 0.1


def test_load_one_parity_png_and_gray(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (700, 350, 3), np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    g = str(tmp_path / "g.png")
    cv2.imwrite(g, img[..., 0])  # grayscale png -> RGB expansion
    imgs, hw, st = native.load_batch([p, g], 640, 114, 2)
    assert (st == native.OK).all()
    # png decode is lossless: pasted region must match the resized source
    ref = resize_long_side({"img": img, "boxes": np.zeros((0, 4), np.float32),
                            "cls": np.zeros((0,), np.float32)}, 640)
    h, w = ref["img"].shape[:2]
    diff = np.abs(imgs[0, :h, :w].astype(int) -
                  ref["img"][..., ::-1].astype(int))
    assert diff.max() <= 1
    # grayscale image expands to equal channels
    assert (imgs[1][..., 0] == imgs[1][..., 1]).all()


def test_error_statuses(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8 truncated nonsense")
    missing = str(tmp_path / "nope.jpg")
    bmp = tmp_path / "x.bmp"
    cv2.imwrite(str(bmp), np.zeros((8, 8, 3), np.uint8))
    imgs, hw, st = native.load_batch([str(bad), missing, str(bmp)], 64, 114, 2)
    assert st[0] == native.ERR_DECODE
    assert st[1] == native.ERR_OPEN
    assert st[2] == native.ERR_FORMAT
    assert (hw[:2] == 0).all()


def test_exif_orientation_declined(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    img = PIL.fromarray(np.random.default_rng(3)
                        .integers(0, 255, (60, 80, 3), np.uint8))
    ex = PIL.Exif()
    ex[274] = 6  # Orientation: rotate 90
    p = str(tmp_path / "rot.jpg")
    img.save(p, exif=ex)
    imgs, hw, st = native.load_batch([p], 64, 114, 1)
    assert st[0] == native.ERR_EXIF  # caller falls back to cv2 (which rotates)
    ex[274] = 1  # default orientation is handled natively
    img.save(p, exif=ex)
    imgs, hw, st = native.load_batch([p], 64, 114, 1)
    assert st[0] == native.OK


def test_dataloader_native_matches_python(tmp_path):
    from mgdt_yolo_tpu.data.build import build_dataloader
    from mgdt_yolo_tpu.data.dataset import YOLODataset

    img_dir = _write_dataset(tmp_path)
    ds = YOLODataset(str(img_dir), imgsz=128)
    dl = build_dataloader(ds, batch_size=3, imgsz=128, train=True,
                          workers=2, device_augment=True, seed=7)
    assert dl._native_eligible()
    nat = list(dl)

    # force the pure-Python producer and compare
    dl2 = build_dataloader(ds, batch_size=3, imgsz=128, train=True,
                           workers=2, device_augment=True, seed=7)
    dl2._native_eligible = lambda: False
    py = list(dl2)
    assert len(nat) == len(py) == 2
    for bn, bp in zip(nat, py):
        assert set(bn) == set(bp)
        assert (bn["img_hw"] == bp["img_hw"]).all()
        np.testing.assert_allclose(bn["gt_bboxes"], bp["gt_bboxes"], atol=1e-3)
        assert (bn["gt_labels"] == bp["gt_labels"]).all()
        assert (bn["mask_gt"] == bp["mask_gt"]).all()
        d = np.abs(bn["img"].astype(int) - bp["img"].astype(int))
        assert d.max() <= 1  # bilinear LSB rounding only
