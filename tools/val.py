#!/usr/bin/env python
"""Standalone validation (reference nn/val.py: YOLO(best.pt).val(data=...))."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="model yaml or checkpoint dir")
    ap.add_argument("--data", default="synthetic")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    from mgdt_yolo_tpu import YOLO
    metrics = YOLO(args.model).val(data=args.data, imgsz=args.imgsz,
                                   batch=args.batch)
    print(metrics)


if __name__ == "__main__":
    main()
