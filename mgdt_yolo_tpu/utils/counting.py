"""Piglet-counting evaluation drivers — the fork's paper metrics.

Library + CLI form of the reference's standalone scripts:
- cal_model_count_error: per-class count MAE/MSE/MAPE over a val folder
  (nn/cal_model_count_error.py:52-66; zero-GT images skipped in MAPE).
- cal_counting_metrics: per-class TP/FP/FN @ IoU>0.5 via greedy matching +
  count R^2 (nn/cal_counting_metrics.py:90-130 — whose stray backtick at
  :152 makes the original unimportable; fixed here by construction).

Both consume a model source (YAML/checkpoint) and a YOLO-format directory
(images/ + labels/ txt).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

from . import LOGGER
from .metrics import counting_agreement, counting_errors


def _gt_from_label_file(label_path: Path, shape) -> Dict:
    h, w = shape[:2]
    boxes, cls = [], []
    if label_path.is_file():
        for line in label_path.read_text().splitlines():
            parts = line.split()
            if len(parts) >= 5:
                c, cx, cy, bw, bh = [float(v) for v in parts[:5]]
                boxes.append([(cx - bw / 2) * w, (cy - bh / 2) * h,
                              (cx + bw / 2) * w, (cy + bh / 2) * h])
                cls.append(c)
    return {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "cls": np.asarray(cls, np.float32)}


def _run_model(model, img_dir: str, conf: float, imgsz: int):
    """Predict over a folder; returns per-image (det_rows, gt) pairs."""
    from ..data.dataset import img2label_path
    results = model.predict(img_dir, conf=conf, imgsz=imgsz)
    preds, gts = [], []
    for r in results:
        preds.append(np.asarray(r.boxes.data, np.float32).reshape(-1, 6))
        gt = _gt_from_label_file(Path(img2label_path(r.path)), r.orig_shape)
        gts.append((gt["boxes"], gt["cls"]))
    return preds, gts


def cal_model_count_error(model, img_dir: str, classes: Sequence[int] | None = None,
                          conf: float = 0.25, imgsz: int = 640) -> Dict:
    """Per-class count MAE/MSE/MAPE over a directory of images+labels."""
    preds, gts = _run_model(model, img_dir, conf, imgsz)
    classes = list(classes) if classes is not None else list(range(model.model.nc))
    pred_counts = [{c: int((p[:, 5] == c).sum()) for c in classes} for p in preds]
    gt_counts = [{c: int((g[1] == c).sum()) for c in classes} for g in gts]
    errors = counting_errors(pred_counts, gt_counts, classes)
    for c, e in errors.items():
        LOGGER.info(f"class {c}: MAE {e['mae']:.3f}  MSE {e['mse']:.3f}  "
                    f"MAPE {e['mape']:.2f}%")
    return errors


def cal_counting_metrics(model, img_dir: str, classes: Sequence[int] | None = None,
                         conf: float = 0.25, imgsz: int = 640,
                         iou_thr: float = 0.5) -> Dict:
    """Per-class TP/FP/FN at IoU>thr + count R^2 over a directory."""
    preds, gts = _run_model(model, img_dir, conf, imgsz)
    classes = list(classes) if classes is not None else list(range(model.model.nc))
    stats, r2 = counting_agreement(preds, gts, classes, iou_thr)
    for c in classes:
        s = stats[c]
        LOGGER.info(f"class {c}: TP {s['tp']}  FP {s['fp']}  FN {s['fn']}  "
                    f"count R^2 {r2[c]:.4f}")
    return {"stats": stats, "r2": r2}


def main(argv: List[str] | None = None):
    """CLI: python -m mgdt_yolo_tpu.utils.counting MODEL IMG_DIR [--metrics]."""
    import argparse
    ap = argparse.ArgumentParser(description="piglet counting evaluation")
    ap.add_argument("model", help="model yaml or checkpoint dir")
    ap.add_argument("img_dir", help="directory of val images (YOLO layout)")
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--metrics", action="store_true",
                    help="also compute TP/FP/FN + R^2 agreement metrics")
    args = ap.parse_args(argv)
    from ..engine.model import YOLO
    model = YOLO(args.model)
    cal_model_count_error(model, args.img_dir, conf=args.conf, imgsz=args.imgsz)
    if args.metrics:
        cal_counting_metrics(model, args.img_dir, conf=args.conf,
                             imgsz=args.imgsz)


if __name__ == "__main__":
    main()
