"""YOLO-NAS facade (reference yolo/nas/): postprocess algebra on fake raw
outputs, predictor/validator plumbing, and the super_gradients import gate.

The NAS model family itself lives in the external `super_gradients` package
(absent here, as in any offline env) — the reference implements only the
wrapper + postprocess, which is what these tests cover: raw
(xyxy boxes, class scores) pairs -> xywh-cat-permute -> class-offset NMS
(reference nas/predict.py:14-24, nas/val.py:16-24).
"""
import numpy as np
import pytest

from mgdt_yolo_tpu.cfg import get_cfg
from mgdt_yolo_tpu.nas import (NASPredictor, NASValidator, nas_postprocess,
                               nas_raw_to_pred)
from mgdt_yolo_tpu.nas.val import NASModelHolder


def _raw(boxes, scores):
    """Shape one image's detections like super_gradients raw output:
    preds_in[0] = (boxes (B, A, 4) xyxy, scores (B, A, nc))."""
    return [(np.asarray(boxes, np.float32)[None],
             np.asarray(scores, np.float32)[None])]


class TestPostprocess:
    def test_raw_to_pred_layout(self):
        boxes = np.array([[10.0, 20.0, 30.0, 60.0]])
        scores = np.array([[0.9, 0.1]])
        pred = np.asarray(nas_raw_to_pred(boxes[None], scores[None]))
        assert pred.shape == (1, 6, 1)  # (B, 4+nc, A)
        # xyxy -> xywh center/size, then class scores
        np.testing.assert_allclose(pred[0, :, 0], [20, 40, 20, 40, 0.9, 0.1])

    def test_nms_keeps_best_and_suppresses_overlap(self):
        boxes = [[0, 0, 100, 100], [5, 5, 105, 105], [300, 300, 400, 400]]
        scores = [[0.9, 0.0], [0.8, 0.0], [0.0, 0.7]]
        det, counts = nas_postprocess(_raw(boxes, scores), conf=0.25, iou=0.5)
        det, n = np.asarray(det[0]), int(counts[0])
        assert n == 2
        np.testing.assert_allclose(det[0], [0, 0, 100, 100, 0.9, 0], atol=1e-5)
        np.testing.assert_allclose(det[1], [300, 300, 400, 400, 0.7, 1],
                                   atol=1e-5)

    def test_class_offset_keeps_cross_class_overlap(self):
        boxes = [[0, 0, 100, 100], [0, 0, 100, 100]]
        scores = [[0.9, 0.0], [0.0, 0.8]]
        _, counts = nas_postprocess(_raw(boxes, scores), conf=0.25, iou=0.5)
        assert int(counts[0]) == 2
        _, counts = nas_postprocess(_raw(boxes, scores), conf=0.25, iou=0.5,
                                    agnostic=True)
        assert int(counts[0]) == 1

    def test_conf_threshold(self):
        boxes = [[0, 0, 10, 10]]
        scores = [[0.2, 0.0]]
        _, counts = nas_postprocess(_raw(boxes, scores), conf=0.25)
        assert int(counts[0]) == 0


def _fake_raw_fn(box, score, nc=2, cls=0):
    """Host-side fake NAS model: one fixed detection per image, in model
    input-pixel coordinates (NCHW float in, like the torch module)."""
    def raw_fn(x):
        b = x.shape[0]
        boxes = np.tile(np.asarray(box, np.float32), (b, 1, 1))
        scores = np.zeros((b, 1, nc), np.float32)
        scores[:, 0, cls] = score
        return [(boxes, scores)]
    return raw_fn


class TestPredictor:
    def test_stream_on_array_source(self):
        p = NASPredictor(overrides={"mode": "predict", "imgsz": 64,
                                    "conf": 0.25, "save": False})
        # square source == letterbox identity at imgsz: model coords are
        # image coords, so the box must come back unscaled
        p.setup_model(_fake_raw_fn([8, 8, 40, 48], 0.9), {0: "a", 1: "b"})
        img = np.full((64, 64, 3), 128, np.uint8)
        results = list(p.stream_inference(img))
        assert len(results) == 1
        b = results[0].boxes
        assert len(b) == 1 and int(b.cls[0]) == 0
        np.testing.assert_allclose(np.asarray(b.xyxy[0]), [8, 8, 40, 48],
                                   atol=1.0)
        assert float(b.conf[0]) == pytest.approx(0.9, abs=1e-3)


class TestValidator:
    def test_val_loop_runs_with_host_model(self):
        args = get_cfg(overrides={"mode": "val", "imgsz": 64, "batch": 8,
                                  "data": "synthetic", "plots": False})
        v = NASValidator(args)
        holder = NASModelHolder(_fake_raw_fn([4, 4, 32, 32], 0.6),
                                {0: "a", 1: "b"}, nc=2)
        results = v(holder)
        # fixed fake boxes won't match synthetic GT — the pipeline contract
        # is the full metric dict with finite values
        for k in ("map50", "map", "precision", "recall"):
            assert k in results and np.isfinite(results[k])

    def test_val_nms_protocol_multi_label_off(self):
        # reference nas/val.py:22 passes multi_label=False: one class per
        # anchor even when two class scores clear conf
        boxes = [[0, 0, 100, 100]]
        scores = [[0.9, 0.8]]
        det, counts = nas_postprocess(_raw(boxes, scores), conf=0.25,
                                      iou=0.5, multi_label=False)
        assert int(counts[0]) == 1
        assert int(np.asarray(det)[0, 0, 5]) == 0


def test_import_gate_matches_reference():
    """NAS construction requires super_gradients (reference model.py:30)."""
    pytest.importorskip  # (not skipping — asserting the gate)
    from mgdt_yolo_tpu import NAS
    with pytest.raises(ImportError):
        NAS("yolo_nas_s")
