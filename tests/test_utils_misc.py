"""Unit tests: metrics/AP, counting, config system, instances, data utils."""
from pathlib import Path
import numpy as np
import pytest

from mgdt_yolo_tpu.cfg import get_cfg
from mgdt_yolo_tpu.utils.instance import Bboxes, Instances
from mgdt_yolo_tpu.utils.metrics import (ConfusionMatrix, DetMetrics, ap_per_class,
                                         compute_ap, counting_agreement,
                                         counting_errors, match_predictions)


class TestConfig:
    def test_defaults_load(self):
        cfg = get_cfg()
        assert cfg.epochs == 100 and cfg.imgsz == 640
        assert cfg.lr0 == 0.001 and cfg.fliplr == 0.0  # fork deltas preserved

    def test_override_cascade(self):
        cfg = get_cfg(overrides={"epochs": 5, "lr0": 0.5})
        assert cfg.epochs == 5 and cfg.lr0 == 0.5

    def test_unknown_key_suggests(self):
        with pytest.raises(SyntaxError):
            get_cfg(overrides={"epcohs": 5})

    def test_type_validation(self):
        with pytest.raises(TypeError):
            get_cfg(overrides={"epochs": "ten"})
        with pytest.raises(ValueError):
            get_cfg(overrides={"lr0": 3.0})  # fraction key


class TestAP:
    def test_perfect_detector(self):
        n = 20
        tp = np.ones((n, 10), bool)
        conf = np.linspace(0.99, 0.5, n)
        cls = np.zeros(n)
        r = ap_per_class(tp, conf, cls, np.zeros(n))
        assert r["ap"][0, 0] > 0.99

    def test_random_detector_low_ap(self):
        rng = np.random.default_rng(0)
        tp = np.zeros((50, 10), bool)
        r = ap_per_class(tp, rng.uniform(size=50), np.zeros(50), np.zeros(30))
        assert r["ap"][0, 0] < 0.05

    def test_compute_ap_monotone_envelope(self):
        ap, _, _ = compute_ap(np.array([0.0, 0.5, 1.0]), np.array([1.0, 0.6, 0.2]))
        assert 0 < ap < 1

    def test_match_predictions_greedy_unique(self):
        gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
        pred = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]], float)
        tp = match_predictions(pred, np.zeros(3), gt, np.zeros(2))
        assert tp[0, 0] and tp[2, 0] and not tp[1, 0]  # best-IoU unique match

    def test_detmetrics_fitness(self):
        m = DetMetrics()
        tp = np.ones((10, 10), bool)
        m.update(tp, np.linspace(0.9, 0.5, 10), np.zeros(10), np.zeros(10))
        r = m.process()
        assert r["fitness"] == pytest.approx(0.1 * r["map50"] + 0.9 * r["map"])


class TestCounting:
    def test_count_errors(self):
        pred = [{0: 3}, {0: 5}, {0: 0}]
        gt = [{0: 4}, {0: 5}, {0: 0}]
        e = counting_errors(pred, gt, [0])
        assert e[0]["mae"] == pytest.approx(1 / 3)
        assert e[0]["mape"] == pytest.approx(12.5)  # zero-GT image excluded

    def test_agreement_r2(self):
        dets = [np.array([[0, 0, 10, 10, 0.9, 0]]),
                np.array([[0, 0, 10, 10, 0.9, 0], [20, 20, 30, 30, 0.8, 0]])]
        gts = [(np.array([[0, 0, 10, 10]]), np.array([0.0])),
               (np.array([[0, 0, 10, 10], [20, 20, 30, 30]]), np.array([0.0, 0.0]))]
        stats, r2 = counting_agreement(dets, gts, [0])
        assert stats[0]["tp"] == 3 and stats[0]["fp"] == 0 and stats[0]["fn"] == 0
        assert r2[0] == pytest.approx(1.0)

    def test_confusion_matrix(self):
        cm = ConfusionMatrix(nc=2)
        det = np.array([[0, 0, 10, 10, 0.9, 0], [50, 50, 60, 60, 0.8, 1]])
        cm.process_batch(det, np.array([[0, 0, 10, 10]]), np.array([0.0]))
        assert cm.matrix[0, 0] == 1       # true positive class 0
        assert cm.matrix[1, 2] == 1       # class-1 det with no gt -> FP column


class TestInstances:
    def test_bbox_roundtrip(self):
        b = Bboxes(np.array([[10.0, 10, 30, 40]]), "xyxy")
        b.convert("xywh")
        np.testing.assert_allclose(b.bboxes, [[20, 25, 20, 30]])
        b.convert("xyxy")
        np.testing.assert_allclose(b.bboxes, [[10, 10, 30, 40]])

    def test_instances_flip_scale(self):
        inst = Instances(np.array([[0.25, 0.25, 0.1, 0.1]]), bbox_format="xywh",
                         normalized=True)
        inst.denormalize(100, 100)
        inst.fliplr(100)
        inst.convert_bbox("xyxy")
        np.testing.assert_allclose(inst.bboxes, [[70, 20, 80, 30]])


class TestDataUtils:
    def test_polygon2mask(self):
        from mgdt_yolo_tpu.data.utils import polygon2mask
        m = polygon2mask((20, 20), [np.array([[2, 2], [18, 2], [18, 18], [2, 18]])])
        assert m[10, 10] == 1 and m[0, 0] == 0

    def test_verify_image_label(self, tmp_path):
        import cv2
        from mgdt_yolo_tpu.data.utils import verify_image_label
        ip = tmp_path / "a.jpg"
        cv2.imwrite(str(ip), np.zeros((32, 32, 3), np.uint8))
        lp = tmp_path / "a.txt"
        lp.write_text("0 0.5 0.5 0.2 0.2\n")
        rec, nm, nf, ne, nc_bad, msg = verify_image_label(ip, lp, 2)
        assert rec is not None and nf == 1 and nc_bad == 0, msg
        assert rec["shape"] == (32, 32) and len(rec["cls"]) == 1
        lp.write_text("5 0.5 0.5 0.2 0.2\n")  # class out of range
        rec, nm, nf, ne, nc_bad, msg = verify_image_label(ip, lp, 2)
        assert rec is None and nc_bad == 1

    def test_convert_coco(self, tmp_path):
        import json
        from mgdt_yolo_tpu.data.utils import convert_coco
        data = {"images": [{"id": 1, "file_name": "x.jpg", "width": 100,
                            "height": 100}],
                "categories": [{"id": 7, "name": "cat"}],
                "annotations": [{"image_id": 1, "category_id": 7,
                                 "bbox": [10, 10, 20, 20], "iscrowd": 0}]}
        jf = tmp_path / "ann.json"
        jf.write_text(json.dumps(data))
        out = convert_coco(str(jf), str(tmp_path / "labels"))
        txt = (out / "x.txt").read_text().split()
        assert txt[0] == "0" and float(txt[1]) == pytest.approx(0.2)


class TestPlottingExtras:
    def test_plot_labels(self, tmp_path):
        from mgdt_yolo_tpu.utils.plotting import plot_labels
        rng = np.random.default_rng(0)
        xywh = rng.uniform(0.2, 0.6, (40, 4)).astype(np.float32)
        cls = rng.integers(0, 3, 40)
        out = plot_labels(xywh, cls, {0: "a", 1: "b", 2: "c"}, str(tmp_path))
        assert Path(out).is_file() and Path(out).stat().st_size > 0

    def test_save_one_box(self, tmp_path):
        from mgdt_yolo_tpu.utils.plotting import save_one_box
        im = np.zeros((60, 80, 3), np.uint8)
        im[20:40, 30:50] = (10, 200, 30)  # BGR block
        f = tmp_path / "crops" / "c" / "x.jpg"
        crop = save_one_box(np.array([30, 20, 50, 40], np.float32), im, file=f)
        # gain*wh + pad total -> ~half the pad on each side
        assert crop.shape[0] > 20 and crop.shape[1] > 20
        # returned crop is RGB (green block stays green in channel 1)
        assert crop[crop.shape[0] // 2, crop.shape[1] // 2, 1] > 150
        assert list(tmp_path.glob("crops/c/*.jpg"))

    def test_trainer_plots_hook(self, tmp_path):
        from mgdt_yolo_tpu.data.build import build_dataloader
        from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset
        from mgdt_yolo_tpu.engine.trainer import DetectionTrainer
        t = DetectionTrainer(overrides={"model": "yolov8n.yaml", "imgsz": 64,
                                        "plots": True,
                                        "project": str(tmp_path)})
        t.setup_model()
        ds = SyntheticDetectionDataset(n=8, imgsz=64, nc=2)
        dl = build_dataloader(ds, 4, 64, train=True, workers=1, hyp=t.args)
        t.save_dir.mkdir(parents=True, exist_ok=True)
        t._plot_train_start(ds, dl)
        assert (t.save_dir / "labels.jpg").is_file()
        assert (t.save_dir / "train_batch0.jpg").is_file()


class TestFilesUtils:
    def test_file_helpers(self, tmp_path):
        from mgdt_yolo_tpu.utils.files import (WorkingDirectory, file_age,
                                               file_date, file_size,
                                               get_latest_run, spaces_in_path)
        f = tmp_path / "weights" / "last.ckpt"
        f.parent.mkdir()
        f.write_bytes(b"x" * 2048)
        assert file_age(f) == 0
        assert len(file_date(f).split("-")) == 3
        assert file_size(f) > 0 and file_size(tmp_path) >= file_size(f)
        assert get_latest_run(str(tmp_path)).endswith("last.ckpt")
        import os
        cwd = os.getcwd()
        with WorkingDirectory(tmp_path):
            assert os.getcwd() == str(tmp_path)
        assert os.getcwd() == cwd
        d = tmp_path / "with space.txt"
        d.write_text("hi")
        with spaces_in_path(d) as p:
            assert " " not in str(p) and p.read_text() == "hi"
        assert d.read_text() == "hi"

    def test_confusion_matrix_plot(self, tmp_path):
        from mgdt_yolo_tpu.utils.metrics import ConfusionMatrix
        cm = ConfusionMatrix(2)
        det = np.array([[10, 10, 30, 30, 0.9, 0]], np.float32)
        gt = np.array([[11, 11, 29, 29]], np.float32)
        cm.process_batch(det, gt, np.array([0.0]))
        out = cm.plot(save_dir=str(tmp_path), names={0: "a", 1: "b"})
        assert Path(out).is_file() and Path(out).stat().st_size > 0

    def test_validator_plots(self, tmp_path):
        import jax
        from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset
        from mgdt_yolo_tpu.engine.validator import DetectionValidator
        from mgdt_yolo_tpu.nn.tasks import DetectionModel
        from mgdt_yolo_tpu.cfg import get_cfg
        args = get_cfg(overrides={"imgsz": 64, "batch": 4, "plots": True})
        args.save_dir = str(tmp_path)
        mh = DetectionModel("yolov8n.yaml", nc=2)
        ds = SyntheticDetectionDataset(n=4, imgsz=64, nc=2)
        v = DetectionValidator(args=args)
        v(mh, dataset=ds, max_batches=1)
        assert (tmp_path / "val_batch0_labels.jpg").is_file()
        assert (tmp_path / "val_batch0_pred.jpg").is_file()
        assert (tmp_path / "confusion_matrix.png").is_file()


class TestResultsSurface:
    """Results container audit (VERDICT r2 missing #5): reference
    results.py:66-446 accessor surface."""

    def _res(self, track=False, masks=False, kpts=False):
        import numpy as np

        from mgdt_yolo_tpu.engine.results import Results
        img = np.zeros((100, 200, 3), np.uint8)
        rows = np.array([[10, 20, 50, 60, 0.9, 1.0],
                         [60, 10, 90, 40, 0.8, 0.0]], np.float32)
        if track:
            rows = np.insert(rows, 4, [7.0, 9.0], axis=1)
        m = None
        if masks:
            m = np.zeros((2, 100, 200), np.float32)
            m[0, 20:60, 10:50] = 1
            m[1, 10:40, 60:90] = 1
        k = np.array([[[12, 25, 0.9], [40, 50, 0.8]],
                      [[65, 15, 0.7], [85, 35, 0.6]]], np.float32) if kpts else None
        return Results(img, "im0.jpg", {0: "a", 1: "b"}, rows, masks=m,
                       keypoints=k)

    def test_device_noops_and_new(self):
        r = self._res()
        assert r.cpu() is r and r.numpy() is r and r.cuda() is r and r.to() is r
        assert r.boxes.cpu() is r.boxes and r.boxes.numpy() is r.boxes
        assert r.boxes.shape == (2, 6)
        empty = r.new()
        assert len(empty) == 0 and empty.path == r.path and empty.names == r.names

    def test_keys_and_verbose(self):
        r = self._res(masks=True, kpts=True)
        assert r.keys == ["boxes", "masks", "keypoints"]
        v = r.verbose()
        assert "1 a" in v and "1 b" in v
        assert self._res().new().verbose() == "(no detections), "

    def test_track_id_roundtrip_and_tojson(self):
        import json
        r = self._res(track=True)
        assert r.boxes.is_track and r.boxes.id.tolist() == [7.0, 9.0]
        recs = json.loads(r.tojson())
        assert recs[0]["track_id"] == 7 and recs[0]["name"] == "b"
        assert recs[0]["confidence"] == pytest.approx(0.9)
        # normalize divides by (h, w)
        recs_n = json.loads(r.tojson(normalize=True))
        assert recs_n[0]["box"]["x2"] == pytest.approx(50 / 200)
        assert recs_n[0]["box"]["y2"] == pytest.approx(60 / 100)

    def test_tojson_masks_keypoints(self):
        import json
        recs = json.loads(self._res(masks=True, kpts=True).tojson())
        assert "segments" in recs[0] and "keypoints" in recs[0]
        assert recs[0]["keypoints"]["visible"] == pytest.approx([0.9, 0.8])
        xs = recs[0]["segments"]["x"]
        assert min(xs) >= 9 and max(xs) <= 50

    def test_save_crop(self, tmp_path):
        r = self._res()
        r.save_crop(tmp_path, "frame.jpg")
        assert (tmp_path / "b" / "frame.jpg").is_file()
        assert (tmp_path / "a" / "frame.jpg").is_file()

    def test_normalized_accessors(self):
        import numpy as np
        r = self._res(masks=True, kpts=True)
        np.testing.assert_allclose(r.keypoints.xyn[..., 0],
                                   r.keypoints.xy[..., 0] / 200)
        assert len(r.masks.xyn) == 2 and r.masks.xyn[0][:, 0].max() <= 1.0
        assert r.probs is None
        from mgdt_yolo_tpu.engine.results import Probs
        p = Probs(np.array([0.1, 0.5, 0.2, 0.15, 0.05]))
        assert p.top1 == 1 and p.top5conf[0] == pytest.approx(0.5)


def test_ap_per_class_pr_matches_reference():
    """P/R must be read at the reference's single global smoothed-mean-F1
    confidence index (metrics.py:493-494), not per-class argmaxes."""
    from reference_harness import import_reference
    import_reference()
    from ultralytics.yolo.utils.metrics import ap_per_class as ref_ap
    rng = np.random.default_rng(3)
    n = 400
    tp = rng.uniform(size=(n, 10)) < 0.4
    tp = np.sort(tp, axis=1)[:, ::-1]  # monotone over IoU thresholds
    conf = rng.uniform(size=n)
    pcls = rng.integers(0, 3, n).astype(float)
    tcls = rng.integers(0, 3, 250).astype(float)
    ours = ap_per_class(tp.copy(), conf.copy(), pcls.copy(), tcls.copy())
    _, _, p, r, _, ap_ref, ucls = ref_ap(tp.copy(), conf.copy(), pcls.copy(),
                                         tcls.copy(),
                                         names={0: "a", 1: "b", 2: "c"})
    np.testing.assert_array_equal(ours["classes"], ucls)
    np.testing.assert_allclose(ours["ap"], ap_ref, atol=1e-9)
    np.testing.assert_allclose(ours["precision"], p, atol=1e-9)
    np.testing.assert_allclose(ours["recall"], r, atol=1e-9)


def test_tpu_compiler_options_gating(monkeypatch):
    """Scoped-VMEM options attach ONLY to TPU compiles (compile_opts.py):
    CPU (the test mesh) must get None so jit behaves identically, the
    env override must win, and 0 must disable."""
    from mgdt_yolo_tpu.utils.compile_opts import tpu_compiler_options
    assert tpu_compiler_options() is None  # conftest forces CPU
    assert tpu_compiler_options(backend="cpu") is None
    opts = tpu_compiler_options(backend="tpu")
    assert opts == {"xla_tpu_scoped_vmem_limit_kib": "24576"}
    monkeypatch.setenv("MGDT_SCOPED_VMEM_KIB", "32768")
    assert tpu_compiler_options(backend="tpu") == {
        "xla_tpu_scoped_vmem_limit_kib": "32768"}
    monkeypatch.setenv("MGDT_SCOPED_VMEM_KIB", "0")
    assert tpu_compiler_options(backend="tpu") is None
