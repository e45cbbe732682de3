#!/usr/bin/env python
"""Windowed-vs-exact deform TRAINING A/B with error bars (one run per call).

Round 4 measured the A/B at n=1 per arm (exact 0.600 vs windowed 0.613 final
mAP50-95) — statistically unresolved. This driver runs ONE (arm, seed) cell
of the >=3-seed-per-arm matrix on the standard 100-epoch synthetic recipe
(README results table), varying BOTH the data/augment stream (args.seed) and
the model init (DetectionModel seed). The exact arm sets MGDT_DEFORM_EXACT=1
before any jax import so every trace in the process uses unbounded reference
semantics (mmcv DCNv2, /root/reference/nn/modules/block.py:17).

Usage:
    python tools/ab_deform_seeds.py windowed 0 [--epochs 100] [--imgsz 320]
    python tools/ab_deform_seeds.py exact 1
    python tools/ab_deform_seeds.py --summarize   # mean+/-std over the runs

Each run lands in runs/detect/ab_{arm}_s{seed}/ with the final fitness row
in results.csv and the deform_semantics sidecar recorded by the trainer.
"""
import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def summarize():
    import csv
    import statistics
    rows = {}
    for d in sorted((REPO / "runs/detect").glob("ab_*_s*")):
        csvf = d / "results.csv"
        if not csvf.is_file():
            continue
        arm = d.name.split("_s")[0].replace("ab_", "")
        with open(csvf) as f:
            last = list(csv.DictReader(f))[-1]
        rows.setdefault(arm, []).append(
            {"run": d.name, "map50_95": float(last["map"]),
             "map50": float(last["map50"]),
             "fitness": float(last["fitness"])})
    out = {}
    for arm, rs in rows.items():
        for key in ("map50_95", "map50"):
            vals = [r[key] for r in rs]
            out.setdefault(arm, {})[key] = {
                "n": len(vals),
                "mean": round(statistics.mean(vals), 4),
                "std": round(statistics.stdev(vals) if len(vals) > 1 else 0.0,
                             4),
                "runs": {r["run"]: round(r[key], 4) for r in rs}}
    print(json.dumps(out, indent=1))
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("arm", nargs="?", choices=("windowed", "exact"))
    ap.add_argument("seed", nargs="?", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--summarize", action="store_true")
    args = ap.parse_args()
    if args.summarize:
        summarize()
        return
    if args.arm is None:
        ap.error("arm required (windowed|exact) unless --summarize")
    if args.arm == "exact":
        os.environ["MGDT_DEFORM_EXACT"] = "1"
    else:
        os.environ.pop("MGDT_DEFORM_EXACT", None)

    from mgdt_yolo_tpu import YOLO
    from mgdt_yolo_tpu.nn.tasks import DetectionModel

    name = f"ab_{args.arm}_s{args.seed}"
    m = YOLO("mspa_c2f_gd_tood_yolov8.yaml")
    # vary the INIT too (the facade defaults to seed 0): real error bars
    # need both stochasticity sources, init and data/augment order
    m.model = DetectionModel("mspa_c2f_gd_tood_yolov8.yaml",
                             seed=args.seed)
    m.train(data="synthetic", epochs=args.epochs, imgsz=args.imgsz,
            batch=args.batch, seed=args.seed, name=name, exist_ok=True)
    print(json.dumps({"run": name, "metrics": {
        k: float(v) for k, v in m.trainer.metrics.items()
        if isinstance(v, (int, float))}}))


if __name__ == "__main__":
    main()
