#!/usr/bin/env python
"""Ablation training entry point — one script covering the reference's six
(nn/{gd_yolo,gd_thead_train,mspa_c2f_gd_yolo_train,mspa_c2f_thead_train,
thead_train,mspa_c2f_gd_tood_yolo_train}.py, each ~17 lines of
YOLO(yaml).load(prev).train(...)).

Usage:
    python tools/train_ablation.py mgdt --data path/to/data.yaml --epochs 100
    python tools/train_ablation.py --list
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

VARIANTS = {
    "baseline": "yolov8.yaml",
    "m": "mspa_c2f_yolov8.yaml",
    "t": "thead_yolov8.yaml",
    "mt": "mspa_c2f_thead_yolov8.yaml",
    "gd": "gd_yolov8.yaml",
    "mgd": "mspa_c2f_gd_yolov8.yaml",
    "gdt": "gd_thead_yolov8.yaml",
    "mgdt": "mspa_c2f_gd_tood_yolov8.yaml",
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("variant", nargs="?", default="mgdt", choices=list(VARIANTS))
    ap.add_argument("--data", default="synthetic", help="data yaml / dir / 'synthetic'")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--weights", default=None,
                    help="warm-start checkpoint (prior ablation best / yolov8n)")
    ap.add_argument("--name", default=None)
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        for k, v in VARIANTS.items():
            print(f"{k:>9}: {v}")
        return
    from mgdt_yolo_tpu import YOLO
    model = YOLO(VARIANTS[args.variant])
    if args.weights:
        model.load(args.weights)
    model.train(data=args.data, epochs=args.epochs, batch=args.batch,
                imgsz=args.imgsz, name=args.name or f"train_{args.variant}")


if __name__ == "__main__":
    main()
