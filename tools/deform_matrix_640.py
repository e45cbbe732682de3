#!/usr/bin/env python
"""The 2x2 (train-semantics x eval-semantics) deform mAP matrix at 640px.

r4 measured the kernel-swap matrix at 320px on 16 val images; the serving
flagship runs at 640px, so VERDICT r4 weak #4 asks for the matrix at the
serving size on the full synthetic val set. Thanks to the r5 per-model
semantics scope, all four cells run in ONE process: each checkpoint loads
with its trained pin, then the mismatched cell overrides it explicitly.

Usage: python tools/deform_matrix_640.py [ckpt_windowed] [ckpt_exact]
           [--imgsz 640] [--n 64]
Defaults to the seed-0 A/B checkpoints. Prints a JSON matrix.
"""
import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt_windowed", nargs="?",
                    default=str(REPO / "runs/detect/ab_windowed_s0/weights/best"))
    ap.add_argument("ckpt_exact", nargs="?",
                    default=str(REPO / "runs/detect/ab_exact_s0/weights/best"))
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from mgdt_yolo_tpu import YOLO
    from mgdt_yolo_tpu.data.dataset import SyntheticDetectionDataset

    # the full synthetic val distribution at the serving size (the val
    # split seed is train seed + 1, data/dataset.py) — n=64 at 640px vs
    # r4's 16 at 320px
    out = {}
    for arm, ckpt in (("windowed", args.ckpt_windowed),
                      ("exact", args.ckpt_exact)):
        if not Path(ckpt).is_dir():
            print(f"skip {arm}: no checkpoint at {ckpt}", file=sys.stderr)
            continue
        m = YOLO(ckpt)
        assert m.model.deform_semantics == arm, \
            f"{ckpt} sidecar pin {m.model.deform_semantics!r} != arm {arm!r}"
        for eval_sem in ("windowed", "exact"):
            m.model.set_deform_semantics(eval_sem)
            ds = SyntheticDetectionDataset(n=args.n, imgsz=args.imgsz, nc=2,
                                           seed=1)
            r = m.val(dataset=ds, imgsz=args.imgsz, batch=16)
            out[f"train_{arm}/eval_{eval_sem}"] = {
                "map50": round(float(r["map50"]), 4),
                "map50_95": round(float(r["map"]), 4)}
            print(f"train_{arm}/eval_{eval_sem}: "
                  f"{out[f'train_{arm}/eval_{eval_sem}']}")
        m.model.set_deform_semantics(arm)  # restore
    print(json.dumps(out, indent=1))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
